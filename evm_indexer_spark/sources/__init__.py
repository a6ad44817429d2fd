"""Table readers, fixture generation, and raw-block normalizers."""
