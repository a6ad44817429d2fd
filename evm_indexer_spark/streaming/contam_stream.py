"""Decontamination-on-arrival: q80's verbatim n-gram train/eval
contamination check run incrementally as TRAINING documents land —
the streaming twin of ``operators.corpus.ngram_contamination``,
completing the arrival family (dedup, audit, substring-dedup, vocab,
embedding, ANN serving) with the benchmark-hygiene pipeline.

Why incremental: the batch check tokenizes the WHOLE training corpus
per refresh; at 100 TB that is a full-corpus pass every time the eval
suite changes a document. The eval side is the small, slowly-changing
side (benchmark suites are thousands of documents, not billions), so
the right shape is an index OF THE EVAL GRAMS: per arriving train
batch the stream tokenizes O(batch), probes the persisted gram set
(broadcast when small, shuffle-hash above the threshold — the same
size routing as the batch operator), and writes per-doc contamination
rows. Training text is never re-scanned when eval changes; new eval
docs append O(their grams), withdrawn eval docs RETRACT O(their grams)
through the shared at-most-once retraction ledger.

Store layout mirrors ``NgramStatsStore``: the index holds summed
(gram, occ) partials under ``batch=<k>`` dirs — occ is the eval-side
occurrence count, so a gram stays "present" while its sum is positive
even when several eval docs share it, and a retraction of one sharer
cancels exactly without erasing the others (set semantics would get
this wrong). Compaction merges from a snapshot, drops zero-sum rows,
and asserts non-negativity (the retraction-contract backstop).

Arrival rows are exactly what the batch operator would say about those
docs against the eval set at that moment — pinned by the
prefix-equivalence pytest and by the q80-oracle identity in
tests/test_contam_stream.py.
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

from ..operators.corpus import (
    gram_array,
    skipgram_keys,
    skipgram_window_hits,
    skipgram_windows,
    window_variant_rows,
)
from ..operators.partitioning import spread_small_scan
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

GRAM_SCHEMA = StructType(
    [
        StructField("gram", StringType(), False),
        StructField("occ", LongType(), False),
    ]
)


def mode_keys(
    docs: DataFrame, text_col: str, n: int, mode: str, *keep
) -> DataFrame:
    """(*keep*, gram) rows under *mode* — ``"ngram"`` emits the verbatim
    space-joined windows (the q80 key space), ``"skipgram"`` the n
    masked one-substitution variants per window (the q81 key space;
    also carries ``__pos`` so a window matching via several variants
    can be collapsed back to one). Shared by the index and the batch
    q82 entry, so both tokenize identically by construction."""
    if mode == "ngram":
        return docs.select(
            *keep, F.explode(gram_array(text_col, n)).alias("gram")
        )
    win = skipgram_windows(docs, text_col, n, *keep)
    return skipgram_keys(win, n, *keep, "__pos").withColumnRenamed(
        "__key", "gram"
    )


def contamination_against(
    docs: DataFrame,
    grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    mode: str = "ngram",
    min_hits: int = 1,
    eval_small: bool | None = None,
    broadcast_below: int = 2_000_000,
    eval_windows: DataFrame | None = None,
) -> DataFrame:
    """Per-doc contamination of *docs* against an eval gram set given
    as a one-column DataFrame (``gram``) — the scoring plan shared by
    ``EvalGramIndex.contamination_for`` (which passes its persisted,
    retraction-aware gram set) and the q82 catalog entry (which builds
    the grams in-plan from the eval split). Output contract is
    ``corpus.ngram_contamination``'s: (id, n_windows, n_contaminated,
    contaminated), exact integers.

    ``eval_small`` picks the probe plan (broadcast vs shuffle hash);
    None falls back to an EAGER count over *grams* at call time —
    index callers decide from their slim partials and entry callers
    from parquet footers precisely to avoid that job.

    ``eval_windows`` (skipgram mode, broadcast regime only): the eval
    split's window rows (``corpus.skipgram_windows`` shape) — when
    given, the scoring routes through the pigeonhole-prefiltered
    tagged-broadcast engine (``corpus.skipgram_window_hits``: exact,
    results unchanged, n-variant emission only for candidate windows).
    ``eval_windows`` MUST be the window set whose masked keys equal
    *grams* (the scoring then reads the eval side from the windows,
    not from *grams* — passing inconsistent frames answers for the
    windows). Callers holding only the masked GRAM set (the persisted
    ``EvalGramIndex``) omit it: half sets are not derivable from
    masked keys when raw text can embed literal ``\\x01`` tokens, so
    the index path keeps the full-volume emission."""
    if min_hits < 1:
        raise ValueError("min_hits must be positive")
    if mode not in ("ngram", "skipgram"):
        raise ValueError(f"unknown mode {mode!r}")
    spread = spread_small_scan(docs).select(
        F.col(id_col).alias("id"), text_col
    )
    if eval_small is None:
        eval_small = (grams.count() or 0) <= broadcast_below
    probe = grams.select("gram").withColumn("__hit", F.lit(1))
    probe = F.broadcast(probe) if eval_small else probe.hint("shuffle_hash")
    if mode == "ngram":
        # outer explode: windowless docs ride the same scan as
        # NULL-gram rows — no zero-fill restore join (round 15, the
        # batch-twin topology in corpus.ngram_contamination)
        exploded = spread.select(
            "id",
            F.posexplode_outer(gram_array(text_col, n)).alias(
                "__i", "gram"
            ),
        )
        per_doc = (
            exploded.join(probe, "gram", "left")
            .groupBy("id")
            .agg(
                F.count("__i").alias("n_windows"),
                F.sum(
                    F.coalesce("__hit", F.lit(0))
                ).alias("n_contaminated"),
            )
        )
    elif eval_windows is not None and eval_small:
        # prefilter engine: inner-exploded window frame, so the
        # zero-fill restore join stays for THIS branch only
        win = skipgram_windows(spread, text_col, n, "id")
        win_hits = skipgram_window_hits(win, eval_windows, n, "id")
        per_doc = win_hits.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("__h").alias("n_contaminated"),
        )
        base = docs.select(F.col(id_col).alias("id")).distinct()
        return (
            base.join(per_doc, "id", "left")
            .select(
                "id",
                F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                F.coalesce("n_contaminated", F.lit(0)).alias(
                    "n_contaminated"
                ),
                (
                    F.coalesce("n_contaminated", F.lit(0)) >= min_hits
                ).alias("contaminated"),
            )
        )
    else:
        # skipgram: a window matching via SEVERAL masked variants
        # counts once — collapse the n keyed rows back to one per
        # (id, window) first (two-level hash agg, map-side partial
        # on both levels; the q81 shape, no Expand node). Outer
        # explode keeps windowless docs as NULL rows.
        vrows = window_variant_rows(spread, "id", text_col, n).select(
            "id", "__i", F.explode_outer("__vars").alias("gram")
        )
        win_hits = (
            vrows.join(probe, "gram", "left")
            .groupBy("id", "__i")
            .agg(
                F.max(
                    F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
                ).alias("__h")
            )
        )
        per_doc = win_hits.groupBy("id").agg(
            F.count("__i").alias("n_windows"),
            F.sum("__h").alias("n_contaminated"),
        )
    return per_doc.select(
        "id",
        "n_windows",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        (F.coalesce("n_contaminated", F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )


class EvalGramIndex:
    """Parquet-backed summed (gram, occ) partials of an eval corpus's
    n-token windows — the persisted probe side of decontamination.

    ``mode``: ``"ngram"`` (default) stores the verbatim space-joined
    windows (the q80 check); ``"skipgram"`` stores the n masked
    one-substitution variants per window (the q81 check — matching an
    arriving train window against ANY stored key means it differs from
    some eval window in at most one token). Both modes share the exact
    tokenization of their batch twins (``corpus.gram_array`` /
    ``corpus.skipgram_windows+skipgram_keys``), so arrival rows equal
    the batch operators by construction.

    The gram definition, *n*, and *mode* are stamped in a ``_meta``
    marker at creation; reopening with different parameters raises
    instead of silently mixing key spaces."""

    def __init__(
        self, spark: SparkSession, path: str, n: int = 8,
        mode: str = "ngram",
    ) -> None:
        if n < 1:
            raise ValueError("n must be positive")
        if mode not in ("ngram", "skipgram"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "skipgram" and n > 32:
            raise ValueError("n > 32 masked variants per window is a mistake")
        self.spark = spark
        self.path = path
        self.n = n
        self.mode = mode
        fs, jroot = _hadoop(spark, path)
        fs.mkdirs(jroot)
        _claim_stamp(spark, path, "_meta", f"n={n};mode={mode}")

    # -- eval-side maintenance (the small, slowly-changing side) --------

    def _keys(self, docs: DataFrame, text_col: str, *keep) -> DataFrame:
        """(*keep*, gram) rows under this index's mode (``mode_keys``)."""
        return mode_keys(docs, text_col, self.n, self.mode, *keep)

    def _partial(self, eval_docs: DataFrame, text_col: str) -> DataFrame:
        return (
            self._keys(eval_docs, text_col)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("occ"))
        )

    def append(
        self, eval_docs: DataFrame, text_col: str, batch_id: int = 0
    ) -> None:
        """Add *eval_docs*' gram occurrences under ``batch=<batch_id>``
        (overwrite — re-delivery replaces). O(their grams)."""
        self._partial(eval_docs, text_col).write.mode("overwrite").parquet(
            posixpath.join(self.path, f"batch={batch_id}")
        )

    def retract(
        self,
        eval_docs: DataFrame,
        text_col: str,
        id_col: str = "doc_id",
        retraction_id: int | None = None,
    ) -> None:
        """Withdraw eval documents (a benchmark fixes a leaked split, a
        doc is taken down): the NEGATED gram counts land under
        ``batch=retract<k>`` and cancel exactly — grams shared with
        surviving eval docs keep a positive sum and stay probed.
        At-most-once per *id_col* is ENFORCED via the shared retraction
        ledger; ambiguous-failure retries pass the same *retraction_id*
        (see ``WindowHashIndex.retract``). Text must be the exact
        appended text."""
        target = _retraction_guard(
            self.spark, self.path, eval_docs.select(id_col), retraction_id
        )
        self._partial(eval_docs, text_col).select(
            "gram", (-F.col("occ")).alias("occ")
        ).write.mode("overwrite").parquet(target)

    # -- reads -----------------------------------------------------------

    def partials(self) -> DataFrame:
        dirs = _list_batch_dirs(self.spark, self.path)
        if not dirs:
            return self.spark.createDataFrame([], GRAM_SCHEMA)
        return self.spark.read.schema(GRAM_SCHEMA).parquet(*dirs)

    def grams(self) -> DataFrame:
        """The CURRENT distinct eval gram set: summed partials with a
        positive total (zero = fully retracted)."""
        return (
            self.partials()
            .groupBy("gram")
            .agg(F.sum("occ").alias("occ"))
            .filter(F.col("occ") > 0)
            .select("gram")
        )

    def contamination_for(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        min_hits: int = 1,
        eval_small: bool | None = None,
        broadcast_below: int = 2_000_000,
    ) -> DataFrame:
        """Per-doc contamination of *docs* against the CURRENT eval gram
        set — (id, n_windows, n_contaminated, contaminated), the exact
        output contract (and tokenization) of
        ``corpus.ngram_contamination``, so arrival rows are directly
        comparable to the batch operator.

        Same size routing as the batch operator: the gram set
        broadcasts when small, otherwise the probe is a shuffled hash
        join. The routing probe here is a store-side sum over the slim
        (gram, occ) partials — it never touches document text."""
        if eval_small is None:
            # occurrence total >= distinct grams: an upper bound, errs
            # only toward the safe shuffle plan (the q80 probe rule),
            # computed on the store partials — O(index), not O(corpus)
            total = self.partials().agg(
                F.sum(F.greatest("occ", F.lit(0))).alias("__n")
            ).first()["__n"]
            eval_small = (total or 0) <= broadcast_below
        return contamination_against(
            docs, self.grams(), id_col, text_col, self.n, self.mode,
            min_hits, eval_small, broadcast_below,
        )

    def compact(self, coalesce_n: int = 1) -> int:
        """Merge every batch dir into one summed base generation —
        files AND rows bounded at distinct-gram cardinality. Snapshot
        semantics and the non-negativity backstop as in
        ``NgramStatsStore.compact``."""
        dirs = _list_batch_dirs(self.spark, self.path)
        old = _foldable_dirs(dirs)
        if len(old) <= 1:
            return 0
        _assert_counters_nonnegative(
            self.spark.read.schema(GRAM_SCHEMA)
            .parquet(*dirs)
            .groupBy("gram")
            .agg(F.sum("occ").alias("occ")),
            ["occ"],
            "EvalGramIndex.compact",
        )
        merged = (
            self.spark.read.schema(GRAM_SCHEMA)
            .parquet(*old)
            .groupBy("gram")
            .agg(F.sum("occ").alias("occ"))
            .filter(F.col("occ") != 0)
        )
        return _fold_batch_dirs(self.spark, self.path, merged, old, coalesce_n)


def start_contamination_stream(
    spark: SparkSession,
    landing_dir: str,
    index: EvalGramIndex,
    checkpoint_dir: str,
    on_stats: Callable[[list, int], None] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
    stats_dir: str | None = None,
):
    """Stream newline-JSON ``{<id_col>, <text_col>}`` TRAINING docs
    from *landing_dir*; per micro-batch: write each arriving doc's
    contamination row against the eval gram set as it stands (id /
    n_windows / n_contaminated / contaminated — the q80 contract) to
    ``<stats_dir>/batch=<batch_id>`` (default ``<index>/_stats``).
    ``on_stats(rows, batch_id)`` opts in to a driver read-back of the
    written epoch; the id is the STORE batch id
    (``_stream_batch_base + epoch``), stable across checkpoint
    lineages.

    Train docs do NOT modify the index (contamination checking reads
    eval state; only eval append/retract writes it), so re-delivery is
    naturally idempotent — the epoch's stats dir is overwritten, no id
    guard needed. A doc scored before an eval change keeps its
    original verdict (the arrival-time answer); re-land it to rescore,
    or run the batch operator for a full-corpus refresh."""
    out_dir = stats_dir or posixpath.join(index.path, "_stats")
    base = _stream_batch_base(spark, checkpoint_dir, [index.path, out_dir])
    doc_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(text_col, StringType(), True),
        ]
    )

    def _process(batch: DataFrame, epoch_id: int) -> None:
        bid = base + epoch_id
        batch = batch.dropDuplicates([id_col])
        if not batch.take(1):
            return
        rows = index.contamination_for(batch, id_col, text_col, min_hits)
        dest = posixpath.join(out_dir, f"batch={bid}")
        rows.write.mode("overwrite").parquet(dest)
        if on_stats is not None:
            back = spark.read.parquet(dest).collect()
            on_stats([r.asDict() for r in back], bid)

    stream = (
        spark.readStream.schema(doc_schema)
        .json(landing_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
