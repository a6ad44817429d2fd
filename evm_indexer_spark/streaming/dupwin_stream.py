"""Substring-dedup-on-arrival: duplicated-span detection maintained
incrementally as documents land — the streaming twin of
``operators.corpus.duplicate_window_spans`` (q73), joining the
dedup-on-arrival (``dedup_stream``), embedding-on-arrival
(``embed_stream``) and audit-on-arrival (``corpus_stream``) family.

Why incremental: the batch audit hashes every window of the WHOLE
corpus; at 100 TB that is a full-corpus pass per refresh. Window-hash
occurrence counts are a sum monoid, so the running state only needs
each batch's partial (h, occ) counters — per epoch the stream hashes
O(batch) windows, reports span statistics for the arriving docs
against the index (one slim hash equi-join), and appends the batch's
own counters. Statistics reported at arrival time are exactly what the
batch operator would say about those docs at that corpus state
(pinned by test_dupwin_stream's prefix-equivalence probe and the q76
gate identity).

Store layout mirrors ``NgramStatsStore``: ``batch=<epoch>`` dirs with
overwrite (epoch re-delivery replaces, never doubles), folded by
``compact()`` into a base generation. Counts are SUMMED on read, so
compaction merges strictly from the snapshot it will delete — an epoch
landing mid-compaction is neither folded nor deleted (the
corpus_stream double-count lesson), and exactly one concurrent writer
is assumed (the streaming foreachBatch contract).

Delivery contract: each document must land at most once across epochs.
The stream enforces it with an id-store anti-join (epoch re-deliveries
are exempt: the id read excludes the current epoch's own directory),
the same guard as ``start_dedup_stream``.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.corpus import _window_hashes, incremental_dup_window_stats
from .dedup_stream import (
    _assert_counters_nonnegative,
    _claim_stamp,
    _fold_batch_dirs,
    _foldable_dirs,
    _hadoop,
    _list_batch_dirs,
    _retraction_guard,
    _stream_batch_base,
)

HASH_SCHEMA = StructType(
    [
        StructField("h", LongType(), False),
        StructField("occ", LongType(), False),
    ]
)


class WindowHashIndex:
    """Parquet-backed running (h, occ) window-hash counters.

    The window length is fixed at construction and MUST stay constant
    for the index lifetime — hashes of different window lengths occupy
    disjoint spaces and would silently never collide. A marker file
    records it (atomic create-if-absent claim, exactly like
    ``MinHashBucketIndex``); reopening with a different length raises.
    """

    _MARKER = "_window_n"

    def __init__(self, spark: SparkSession, path: str, window_n: int = 8) -> None:
        if window_n < 1:
            raise ValueError(f"window_n must be >= 1, got {window_n}")
        self.spark = spark
        self.path = path
        self.window_n = window_n
        _claim_stamp(spark, path, self._MARKER, str(window_n))

    def hashes(self, exclude_epoch: int | None = None) -> DataFrame:
        """All partial counters (explicit schema: empty/partial batch
        dirs must not poison inference). Consumers sum per hash.

        ``exclude_epoch`` drops that epoch's own ``batch=`` dir — the
        stream passes the current epoch so a crashed-then-redelivered
        batch is not scored against its own first-attempt counters."""
        if exclude_epoch is None:
            return (
                self.spark.read.schema(HASH_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(self.path)
            )
        dirs = [
            d
            for d in _list_batch_dirs(self.spark, self.path)
            if posixpath.basename(d) != f"batch={exclude_epoch}"
        ]
        if not dirs:
            return self.spark.createDataFrame([], HASH_SCHEMA)
        return self.spark.read.schema(HASH_SCHEMA).parquet(*dirs)

    def append(
        self, docs: DataFrame, id_col: str, text_col: str, batch_id: int = 0
    ) -> None:
        """Hash *docs*' windows and persist their (h, occ) partial under
        ``batch=<batch_id>`` (overwrite — epoch re-delivery replaces)."""
        rows = (
            _window_hashes(docs, id_col, text_col, self.window_n)
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("occ"))
        )
        rows.write.mode("overwrite").parquet(
            posixpath.join(self.path, f"batch={batch_id}")
        )

    def retract(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        retraction_id: int | None = None,
    ) -> None:
        """Remove *docs*' counter contribution — the retraction path
        for reorged/taken-down documents: re-hash their windows and
        append the NEGATED partial under ``batch=retract<k>``. Every
        consumer sums partials, so the contribution cancels exactly;
        O(retracted docs) work, no store rewrite.

        At-most-once is ENFORCED via the shared retraction ledger
        (``_retraction_guard``): retracting an already-retracted id
        raises before anything is written, and a retry after an
        ambiguous failure should pass the SAME *retraction_id* to
        overwrite its own ``retract<k>`` dir idempotently (the key
        ``append`` and ``delete`` already take). The text must be the
        exact appended text (the store keeps no per-doc rows to check
        against — the same trust ``append`` already extends). The
        doc's id stays consumed in the arrival stream's id store:
        retraction removes CONTENT statistics, it does not re-open the
        id for landing."""
        target = _retraction_guard(
            self.spark, self.path, docs.select(id_col), retraction_id
        )
        rows = (
            _window_hashes(docs, id_col, text_col, self.window_n)
            .groupBy("h")
            .agg((-F.count(F.lit(1))).alias("occ"))
        )
        rows.write.mode("overwrite").parquet(target)

    def compact(self, coalesce_n: int = 1) -> int:
        """Fold every ``batch=*`` dir into one merged base generation,
        bounding files AND rows at distinct-hash cardinality. Partials
        are SUMMED — the merge reads strictly the ``old`` snapshot dirs
        captured before the write, so an epoch landing mid-compaction
        is neither double-counted nor lost (retraction partials fold
        like any other; hashes whose sum reaches zero are dropped).
        Single concurrent writer assumed; run from the maintenance
        cadence, never concurrently with ``append``. Returns the
        number of directories folded."""
        # the newest epoch dir is never folded: a crashed-then-
        # redelivered epoch must still find (and overwrite) its own
        # first-attempt rows — folding them into the base would both
        # defeat the exclude_epoch read and double the counts forever
        dirs = _list_batch_dirs(self.spark, self.path)
        old = _foldable_dirs(dirs)
        if len(old) <= 1:
            return 0
        # non-negativity backstop over ALL partials (incl. the
        # un-foldable newest epoch, which a retraction may legitimately
        # cancel): a negative total proves a contract violation the
        # ledger couldn't see — refuse to freeze it into the base
        _assert_counters_nonnegative(
            self.spark.read.schema(HASH_SCHEMA)
            .parquet(*dirs)
            .groupBy("h")
            .agg(F.sum("occ").alias("occ")),
            ["occ"],
            "WindowHashIndex.compact",
        )
        merged = (
            self.spark.read.schema(HASH_SCHEMA)
            .parquet(*old)
            .groupBy("h")
            .agg(F.sum("occ").alias("occ"))
            .filter(F.col("occ") != 0)
        )
        return _fold_batch_dirs(self.spark, self.path, merged, old, coalesce_n)

    def stats_for(
        self,
        batch: DataFrame,
        id_col: str,
        text_col: str,
        exclude_epoch: int | None = None,
    ) -> DataFrame:
        """Duplicated-span statistics for *batch* against the indexed
        corpus state (see ``incremental_dup_window_stats``)."""
        return incremental_dup_window_stats(
            batch,
            self.hashes(exclude_epoch=exclude_epoch),
            id_col,
            text_col,
            self.window_n,
        )


def start_dupwin_stream(
    spark: SparkSession,
    landing_dir: str,
    index: WindowHashIndex,
    checkpoint_dir: str,
    on_stats: Callable[[list, int], None] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    assume_new_ids: bool = False,
    stats_dir: str | None = None,
):
    """Stream newline-JSON ``{<id_col>, <text_col>}`` docs from
    *landing_dir*; per micro-batch: write each arriving doc's
    duplicated-span statistics vs the corpus indexed so far (rows with
    doc_id / n_tokens / n_windows / dup_windows / covered_tokens) to
    ``<stats_dir>/batch=<batch_id>`` (default ``<index>/_stats``), then
    append the batch's window counters to *index*. Stats volume is
    O(batch docs) — bounded, unlike pair verdicts — but the default
    stays the executor-side sink for uniformity with the dedup
    streams; ``on_stats(rows, batch_id)`` opts in to a driver
    read-back of the written epoch. The callback id is the STORE
    batch id (``_stream_batch_base + epoch``) — the ``batch=<id>``
    dir the stats landed in, stable across checkpoint lineages.

    Cross-epoch id re-arrival would double the re-arrived doc's window
    counters; the stream anti-joins each batch against the ids already
    appended (epoch re-deliveries exempt — the id store read excludes
    the current epoch's own dir, so a crashed epoch reprocesses in
    full). ``availableNow`` + the same checkpoint dir resumes across
    restarts."""
    ids_dir = posixpath.join(index.path, "_ids")
    out_dir = stats_dir or posixpath.join(index.path, "_stats")
    base = _stream_batch_base(
        spark, checkpoint_dir, [index.path, ids_dir, out_dir]
    )
    doc_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(text_col, StringType(), True),
        ]
    )
    id_schema = StructType([StructField(id_col, LongType(), False)])

    def _seen_ids(exclude_epoch: int) -> DataFrame:
        dirs = [
            d
            for d in _list_batch_dirs(spark, ids_dir)
            if posixpath.basename(d) != f"batch={exclude_epoch}"
        ]
        if not dirs:
            return spark.createDataFrame([], id_schema)
        return spark.read.schema(id_schema).parquet(*dirs)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        bid = base + epoch_id
        batch = batch.dropDuplicates([id_col])
        if not assume_new_ids:
            batch = batch.join(_seen_ids(bid), id_col, "left_anti")
        if not batch.take(1):
            return
        stats = index.stats_for(batch, id_col, text_col, exclude_epoch=bid)
        epoch_dir = posixpath.join(out_dir, f"batch={bid}")
        stat_schema = stats.schema
        stats.write.mode("overwrite").parquet(epoch_dir)
        if on_stats is not None:
            rows = spark.read.schema(stat_schema).parquet(epoch_dir).collect()
            on_stats([r.asDict() for r in rows], bid)
        index.append(batch, id_col, text_col, batch_id=bid)
        batch.select(id_col).write.mode("overwrite").parquet(
            posixpath.join(ids_dir, f"batch={bid}")
        )

    stream = (
        spark.readStream.schema(doc_schema)
        .json(landing_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
