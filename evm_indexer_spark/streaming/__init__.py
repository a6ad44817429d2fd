"""Structured Streaming: ingestion with reorg-safe upserts, finality
gating, publish-once notification fan-out, and subscription matching."""
