"""Operator catalog: historical EVM queries (reference ``app/db/query.go``)
plus sync-state aggregates and large-scale training-data operators
(dedup, similarity search, text analysis)."""
