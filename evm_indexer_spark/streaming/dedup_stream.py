"""Dedup-on-arrival: a persisted MinHash bucket index plus a streaming
pipeline that reports near-duplicate pairs as documents land.

The reference engine has no corpus operators at all (its streams carry
blocks; SURVEY §2.8) — this extends the training-data side of the house
the same way ``operators/dedup`` extends the batch side: when the
historical corpus is far too large to re-sign per batch (the 100 TB
case), dedup must be INCREMENTAL — each arriving batch is signed once,
joined against the persisted bucket index, exactly verified, and its
own bucket rows appended for future batches.

Scale shape per batch: O(batch) signing (narrow), one slim bucket
equi-join against the index (partition-pruned by parquet min/max on the
uniform ``bh`` key at real scale), verification bounded by collisions.
Nothing rescans the corpus; the index grows by O(batch × bands) rows.

Idempotence: bucket rows are written to ``batch=<epoch_id>`` subdirs
with overwrite — Structured Streaming re-delivers a failed epoch under
the SAME epoch id, so a crashed write is replaced, never doubled (the
same contract ``streaming/store`` uses for block upserts). Pair output
goes through the caller's sink callback with the epoch id so the sink
can apply the same keying.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators import dedup

BUCKET_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("band", IntegerType(), False),
        StructField("bh", LongType(), False),
    ]
)


class MinHashBucketIndex:
    """Parquet-backed (id, band, bh) LSH index under ``path``.

    Banding parameters are fixed at construction and MUST stay constant
    for the index lifetime — rows from different configurations occupy
    disjoint hash spaces and would silently never collide. A marker file
    records them; reopening with different values raises.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_hashes: int = 16,
        bands: int = 8,
        shingle_n: int = 3,
    ) -> None:
        self.spark = spark
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        os.makedirs(path, exist_ok=True)
        marker = os.path.join(path, "_banding")
        stamp = f"{num_hashes},{bands},{shingle_n}"
        if os.path.exists(marker):
            prev = open(marker).read().strip()
            if prev != stamp:
                raise ValueError(
                    f"index at {path} was built with banding {prev}, "
                    f"reopened with {stamp} — rows would never collide"
                )
        else:
            with open(marker, "w") as f:
                f.write(stamp)

    def buckets(self) -> DataFrame:
        """All indexed bucket rows (explicit schema: empty/partial batch
        dirs must not poison inference)."""
        return (
            self.spark.read.schema(BUCKET_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(self.path)
        )

    def append(
        self, docs: DataFrame, id_col: str, text_col: str, batch_id: int = 0
    ) -> None:
        """Sign *docs* and persist their bucket rows under
        ``batch=<batch_id>`` (overwrite — re-delivery of the same epoch
        replaces, never duplicates)."""
        rows = dedup.minhash_banded(
            docs, id_col, text_col, self.num_hashes, self.bands, self.shingle_n
        )
        rows.write.mode("overwrite").parquet(
            os.path.join(self.path, f"batch={batch_id}")
        )

    def pairs_for(
        self,
        new_docs: DataFrame,
        corpus_docs: DataFrame,
        id_col: str,
        text_col: str,
        jaccard_threshold: float = 0.5,
    ) -> DataFrame:
        """Near-dup pairs involving *new_docs*: vs the index + within
        the batch, exactly verified against *corpus_docs* text."""
        return dedup.incremental_minhash_pairs(
            new_docs,
            self.buckets(),
            corpus_docs,
            id_col,
            text_col,
            self.num_hashes,
            self.bands,
            self.shingle_n,
            jaccard_threshold,
        )


def start_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    index: MinHashBucketIndex,
    checkpoint_dir: str,
    on_pairs: Callable[[list, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    seen_text_dir: str | None = None,
):
    """Stream newline-JSON ``{doc_id, text}`` docs from *landing_dir*;
    per micro-batch: report near-dup pairs (new-vs-corpus + new-vs-new)
    through *on_pairs(pairs, epoch_id)*, then append the batch to the
    index and to the text store future verifications read from.

    The text store (``seen_text_dir``, default ``<index>/_text``) uses
    the same batch-keyed overwrite as the bucket rows, so a re-delivered
    epoch converges instead of duplicating. ``availableNow`` + the same
    checkpoint dir resumes across restarts (classic incremental fill).
    """
    text_dir = seen_text_dir or os.path.join(index.path, "_text")
    os.makedirs(text_dir, exist_ok=True)
    doc_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("text", StringType(), True),
        ]
    )

    def _seen_text() -> DataFrame:
        return (
            spark.read.schema(doc_schema)
            .option("recursiveFileLookup", "true")
            .parquet(text_dir)
        )

    def _process(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.dropDuplicates([id_col])
        if not batch.take(1):
            return
        corpus = _seen_text().unionByName(batch.select("doc_id", "text"))
        pairs = index.pairs_for(
            batch, corpus, id_col, text_col, jaccard_threshold
        ).collect()
        on_pairs([r.asDict() for r in pairs], epoch_id)
        index.append(batch, id_col, text_col, batch_id=epoch_id)
        batch.select("doc_id", "text").write.mode("overwrite").parquet(
            os.path.join(text_dir, f"batch={epoch_id}")
        )

    stream = (
        spark.readStream.schema(doc_schema)
        .json(landing_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
