"""Scalar expression builders — all native Column expressions (JVM-side,
whole-stage-codegen'd); no Python UDFs in any hot path."""
