"""evm_indexer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference EVM indexer (denniswon/evm-indexer).

Spark-first design: DataFrame/SQL declarative plans optimized by Catalyst,
Parquet columnar storage partitioned for pruning at 100 TB scale, and
Structured Streaming for the real-time notification path.

Layout
------
- ``schemas``     fixed StructTypes for the three core tables (blocks,
                  transactions, events) — reference ``app/db/model.go``.
- ``config``      query guardrails (range widths, top-k caps) — reference
                  ``app/config/config.go``.
- ``sources``     parquet table readers + deterministic EVM fixture
                  generator + raw-block normalizers.
- ``operators``   the historical query catalog (reference
                  ``app/db/query.go``), plus dedup / similarity / text
                  analysis operators for training-data pipelines.
- ``functions``   scalar expression builders: hex codecs, big-number
                  helpers, positional topic matching, text metrics.
- ``streaming``   Structured Streaming ingestion with finality gating,
                  reorg-safe upserts, publish-once dedup, and pub/sub
                  subscription filter matching.
- ``api``         thin validation facade mirroring the REST guardrails
                  and JSON wire shapes (reference ``app/rest/rest.go``).
- ``graphql``     all 33 GraphQL query fields over the same catalog
                  (reference ``app/rest/graph``).

Training-data extensions beyond reference parity live in ``operators``
(dedup, similarity/ANN, multimodal binary columns, corpus prep, skew
mitigation) and ``streaming`` (event-time windows, stateful monitor) —
see PARITY.md for the operator-by-operator map.
"""

__version__ = "0.1.0"
