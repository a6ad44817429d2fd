"""Kafka plan construction (no broker in this environment — the plans
must build and carry the right schema/shape; execution is covered by the
file-source twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from evm_indexer_spark.streaming import kafka, publish


def test_to_kafka_sink_shape(spark, evm):
    payloads = publish.tx_payload(evm["transactions"].limit(5))
    shaped = kafka.to_kafka_sink(payloads, kafka.TOPIC_TRANSACTION, "hash")
    assert shaped.columns == ["key", "value", "topic"]
    rows = shaped.collect()
    assert all(r["topic"] == "transaction" for r in rows)
    assert all(r["value"].startswith("{") for r in rows)

