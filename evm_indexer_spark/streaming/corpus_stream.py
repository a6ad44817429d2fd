"""Corpus-audit-on-arrival: running top-ngram statistics maintained
incrementally as documents land — the streaming twin of
``operators.corpus.top_ngrams`` (q65), completing the
dedup-on-arrival + audit-on-arrival story ``dedup_stream`` starts.

Why incremental: the batch audit tokenizes the WHOLE corpus; at 100 TB
that is a full-corpus pass per refresh. N-gram counts are a sum
monoid, so the running statistic only needs each batch's partial
counters — per epoch the stream tokenizes O(batch), appends one slim
(ngram, occ, docs) partial table, and the current top-k is a
groupBy-sum over partials whose size tracks DISTINCT n-grams (Zipf:
far below corpus size), not documents.

Store layout mirrors ``MinHashBucketIndex``: ``batch=<epoch>`` dirs
written with overwrite (epoch re-delivery replaces, never doubles),
folded by ``compact()`` into a base generation via the same hidden-dir
write + atomic rename. Compaction here MERGES (groupBy-sum), so it
bounds both file count and row count at the distinct-ngram cardinality.

Delivery contract: each document must land at most once across epochs
(epoch re-delivery is safe; cross-epoch re-arrival would double-count).
Pair this stream with ``dedup_stream``'s text store when the source
cannot guarantee that — its arrival anti-join yields exactly the
at-most-once flow this audit needs.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.corpus import _ngram_counts_pandas
from .dedup_stream import (
    _assert_counters_nonnegative,
    _fold_batch_dirs,
    _foldable_dirs,
    _hadoop,
    _list_batch_dirs,
    _retraction_guard,
    _stream_batch_base,
)

STATS_SCHEMA = StructType(
    [
        StructField("ngram", StringType(), False),
        StructField("occ", LongType(), False),
        StructField("docs", LongType(), False),
    ]
)


class NgramStatsStore:
    """Parquet-backed running (ngram, occ, docs) partial counts."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        fs, jroot = _hadoop(spark, path)
        fs.mkdirs(jroot)

    def partials(self) -> DataFrame:
        """Raw partial rows across all batch dirs (explicit schema:
        empty epoch dirs must not poison inference)."""
        dirs = _list_batch_dirs(self.spark, self.path)
        if not dirs:
            return self.spark.createDataFrame([], STATS_SCHEMA)
        return self.spark.read.schema(STATS_SCHEMA).parquet(*dirs)

    def totals(self) -> DataFrame:
        """(ngram, n_occurrences, n_docs) summed over every partial."""
        return self.partials().groupBy("ngram").agg(
            F.sum("occ").alias("n_occurrences"),
            F.sum("docs").alias("n_docs"),
        )

    def top(self, k: int = 100, min_count: int = 2) -> DataFrame:
        """Current corpus top-k — same contract as the batch operator:
        ordered by occurrences desc then ngram (deterministic cut),
        n-grams below *min_count* total occurrences excluded."""
        return (
            self.totals()
            .filter(F.col("n_occurrences") >= min_count)
            .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
            .limit(k)
        )

    def append(self, partial: DataFrame, batch_id: int) -> None:
        """Persist one epoch's partial counters under
        ``batch=<batch_id>`` (overwrite — re-delivery replaces)."""
        partial.select("ngram", "occ", "docs").write.mode(
            "overwrite"
        ).parquet(posixpath.join(self.path, f"batch={batch_id}"))

    def retract(
        self,
        partial: DataFrame,
        doc_ids: DataFrame,
        retraction_id: int | None = None,
    ) -> None:
        """Remove a previously-appended contribution: persist the
        NEGATED partial under ``batch=retract<k>``. Callers recompute
        the partial from the retracted docs exactly as the stream did
        (``_ngram_counts_pandas`` with the same n) — the store keeps no
        per-doc rows to derive it from, the same trust ``append``
        extends. *doc_ids* (a one-column DataFrame of the retracted
        ids) feeds the shared retraction ledger: at-most-once per doc
        is ENFORCED (double retract raises before anything is written),
        and ambiguous-failure retries pass the same *retraction_id* to
        overwrite their own ``retract<k>`` dir idempotently. Sums
        cancel exactly in ``totals``/``top``; compaction folds
        retractions like any partial, drops zero-sum rows, and asserts
        non-negativity as the backstop."""
        target = _retraction_guard(
            self.spark, self.path, doc_ids, retraction_id
        )
        partial.select(
            "ngram",
            (-F.col("occ")).alias("occ"),
            (-F.col("docs")).alias("docs"),
        ).write.mode("overwrite").parquet(target)

    def compact(self) -> int:
        """Merge every batch dir into one summed base generation; see
        module docstring. Returns the number of directories folded.

        Unlike the bucket index (where a duplicated row is harmless),
        these partials are SUMMED — folding a row twice corrupts the
        running counts. The merge therefore reads strictly the ``old``
        snapshot dirs captured before the write (an epoch landing
        mid-compaction is neither folded nor deleted; it survives for
        the next compaction), and exactly one concurrent writer is
        assumed — the streaming ``foreachBatch`` contract, same as
        ``MinHashBucketIndex.compact``. Run from the maintenance
        cadence, never concurrently with ``append``."""
        # newest epoch dir never folds: a crashed-then-redelivered
        # epoch must still find and overwrite its own first-attempt
        # partial (folding it into the base would double the counts
        # forever — see dedup_stream._foldable_dirs)
        dirs = _list_batch_dirs(self.spark, self.path)
        old = _foldable_dirs(dirs)
        if len(old) <= 1:
            return 0
        # retraction-contract backstop (see dupwin_stream.compact)
        _assert_counters_nonnegative(
            self.spark.read.schema(STATS_SCHEMA)
            .parquet(*dirs)
            .groupBy("ngram")
            .agg(F.sum("occ").alias("occ"), F.sum("docs").alias("docs")),
            ["occ", "docs"],
            "NgramStatsStore.compact",
        )
        merged = (
            self.spark.read.schema(STATS_SCHEMA)
            .parquet(*old)
            .groupBy("ngram")
            .agg(F.sum("occ").alias("occ"), F.sum("docs").alias("docs"))
            .filter((F.col("occ") != 0) | (F.col("docs") != 0))
        )
        return _fold_batch_dirs(self.spark, self.path, merged, old, 1)


def start_ngram_stream(
    spark: SparkSession,
    landing_dir: str,
    store: NgramStatsStore,
    checkpoint_dir: str,
    on_top: Callable[[list, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 100,
    min_count: int = 2,
):
    """Stream newline-JSON ``{<id_col>, <text_col>}`` docs from
    *landing_dir*; per micro-batch: fold the batch's n-gram partial
    counters into *store* and report the UPDATED corpus top-k through
    ``on_top(rows, batch_id)`` (rows are dicts with ngram /
    n_occurrences / n_docs, already ordered).

    After any prefix of epochs, ``store.top(k, min_count)`` equals
    ``corpus.top_ngrams`` run over every document landed so far — the
    incremental = batch equivalence pytest pins. Tokenization is the
    same Arrow partial-counter pass the batch operator uses, so the
    two can never drift."""
    doc_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(text_col, StringType(), True),
        ]
    )

    base = _stream_batch_base(spark, checkpoint_dir, [store.path])

    def _process(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.dropDuplicates([id_col])
        if not batch.take(1):
            return
        partial = _ngram_counts_pandas(batch, text_col, n).select(
            "ngram",
            F.col("n_occurrences").alias("occ"),
            F.col("n_docs").alias("docs"),
        )
        store.append(partial, batch_id=base + epoch_id)
        rows = store.top(k, min_count).collect()
        on_top([r.asDict() for r in rows], base + epoch_id)

    stream = (
        spark.readStream.schema(doc_schema)
        .json(landing_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
