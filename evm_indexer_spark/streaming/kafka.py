"""Kafka wiring for the streaming paths (production deployment shape).

This container has no Kafka broker or connector JAR, so everything here
is import-safe plan construction — the tested end-to-end path uses the
file landing zone (``ingest.start_ingest_stream``). On a real cluster:

- raw block docs arrive on a header topic (the reference's WebSocket
  ``SubscribeNewHead`` push, ``app/block/listener.go:23``) →
  ``raw_block_stream``;
- the three notification payload streams fan out to the ``block`` /
  ``transaction`` / ``event`` topics (the reference's Redis channels,
  ``app/setup.go:55-60``) → ``start_publish_stream``.

Requires ``spark-sql-kafka-0-10`` on the classpath
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.normalize import RAW_BLOCK_SCHEMA

TOPIC_BLOCK = "block"
TOPIC_TRANSACTION = "transaction"
TOPIC_EVENT = "event"


def raw_block_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "headers",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 50_000,
) -> DataFrame:
    """readStream of raw block docs from a Kafka topic, parsed against
    the declared schema (malformed values null out and are dropped by
    ``process_raw_batch`` — same contract as the file source)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load().select(
        F.from_json(F.col("value").cast("string"), RAW_BLOCK_SCHEMA).alias("b")
    ).select("b.*")


def to_kafka_sink(payloads: DataFrame, topic: str, key_col: str) -> DataFrame:
    """Shape a payload stream for the Kafka sink: key for per-entity
    ordering (block hash / tx hash), value = the JSON payload column."""
    return payloads.select(
        F.col(key_col).cast("string").alias("key"),
        F.col("payload").alias("value"),
        F.lit(topic).alias("topic"),
    )


def start_publish_stream(
    notifications: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """writeStream of pre-shaped (key, value, topic) rows to Kafka.

    Kafka's sink is at-least-once; exactly-once delivery to consumers
    comes from the upstream publish-once anti-join (T5) plus per-key
    idempotent consumption — the same contract the reference's Redis
    publish gives its WS layer.
    """
    return (
        notifications.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
