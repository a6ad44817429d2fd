"""Vocab-on-arrival: a BPE tokenizer kept current as documents land —
the streaming twin of ``operators.tokenizer.bpe_train`` (q75), the
fifth arrival-time pipeline (text dedup, embedding dedup, n-gram
audit, substring dedup, and now tokenizer retraining).

Why incremental: retraining a tokenizer from scratch re-tokenizes the
WHOLE corpus; at 100 TB that is a full-corpus pass per refresh. Word
counts are a sum monoid, so the running state only needs each batch's
(word, freq) partial — per epoch the stream tokenizes O(batch),
appends one slim partial, and re-derives the merge list from the
summed counts, which costs the VOCAB loop (Zipf-bounded, driver-tiered
below 100k words), never a corpus re-scan. Merges reported at each
epoch equal ``bpe_train`` over all documents landed so far (pinned by
test_vocab_stream's prefix-equivalence probe).

Store layout mirrors ``NgramStatsStore``: ``batch=<epoch>`` dirs with
overwrite (epoch re-delivery replaces, never doubles), folded by
``compact()`` into a merged base generation; the merge reads strictly
the snapshot it deletes (counts are summed — the corpus_stream
double-count lesson). Delivery contract: each document lands at most
once across epochs — pair with ``dedup_stream``'s text store when the
source cannot guarantee that.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.tokenizer import bpe_train_from_counts, word_counts
from .dedup_stream import (
    _assert_counters_nonnegative,
    _fold_batch_dirs,
    _foldable_dirs,
    _hadoop,
    _list_batch_dirs,
    _retraction_guard,
    _stream_batch_base,
)

VOCAB_SCHEMA = StructType(
    [
        StructField("word", StringType(), False),
        StructField("freq", LongType(), False),
    ]
)


class WordCountStore:
    """Parquet-backed running (word, freq) partial counts."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        fs, jroot = _hadoop(spark, path)
        fs.mkdirs(jroot)

    def partials(self) -> DataFrame:
        return (
            self.spark.read.schema(VOCAB_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(self.path)
        )

    def counts(self) -> DataFrame:
        """Current corpus word counts (partials summed)."""
        return self.partials().groupBy("word").agg(
            F.sum("freq").alias("freq")
        )

    def append(self, docs: DataFrame, text_col: str, batch_id: int = 0) -> None:
        word_counts(docs, text_col).write.mode("overwrite").parquet(
            posixpath.join(self.path, f"batch={batch_id}")
        )

    def retract(
        self,
        docs: DataFrame,
        text_col: str,
        id_col: str = "doc_id",
        retraction_id: int | None = None,
    ) -> None:
        """Remove *docs*' word-count contribution: the NEGATED counts
        land under ``batch=retract<k>`` and cancel exactly in
        ``counts``/``train``. At-most-once is ENFORCED per *id_col*
        via the shared retraction ledger (``_retraction_guard``):
        double retract raises, ambiguous-failure retries pass the same
        *retraction_id* to overwrite idempotently. Text must be the
        exact appended text, as with ``WindowHashIndex.retract``."""
        target = _retraction_guard(
            self.spark, self.path, docs.select(id_col), retraction_id
        )
        word_counts(docs, text_col).select(
            "word", (-F.col("freq")).alias("freq")
        ).write.mode("overwrite").parquet(target)

    def compact(self, coalesce_n: int = 1) -> int:
        """Fold every ``batch=*`` dir into one merged base generation —
        files AND rows bounded at vocab cardinality. Merges strictly
        the ``old`` snapshot (summed counts; a mid-compaction epoch is
        neither double-counted nor lost); single concurrent writer
        assumed. Returns the number of directories folded."""
        # newest epoch dir never folds (see dupwin_stream.compact)
        dirs = _list_batch_dirs(self.spark, self.path)
        old = _foldable_dirs(dirs)
        if len(old) <= 1:
            return 0
        # retraction-contract backstop (see dupwin_stream.compact)
        _assert_counters_nonnegative(
            self.spark.read.schema(VOCAB_SCHEMA)
            .parquet(*dirs)
            .groupBy("word")
            .agg(F.sum("freq").alias("freq")),
            ["freq"],
            "WordCountStore.compact",
        )
        merged = (
            self.spark.read.schema(VOCAB_SCHEMA)
            .parquet(*old)
            .groupBy("word")
            .agg(F.sum("freq").alias("freq"))
            .filter(F.col("freq") != 0)
        )
        return _fold_batch_dirs(self.spark, self.path, merged, old, coalesce_n)

    def train(
        self, num_merges: int = 8, min_freq: int = 1
    ) -> list[tuple[str, str, int]]:
        """Merges for the corpus landed so far — the vocab loop only."""
        return bpe_train_from_counts(self.counts(), num_merges, min_freq)


def start_vocab_stream(
    spark: SparkSession,
    landing_dir: str,
    store: WordCountStore,
    checkpoint_dir: str,
    on_merges: Callable[[list, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 8,
    min_freq: int = 1,
):
    """Stream newline-JSON ``{<id_col>, <text_col>}`` docs from
    *landing_dir*; per micro-batch: fold the batch's word counts into
    *store* and report the UPDATED merge list through
    ``on_merges(merges, batch_id)`` (a list of (left, right, count)
    tuples, equal to batch training over everything landed so far).
    ``availableNow`` + the same checkpoint dir resumes across
    restarts."""
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
        store.append(batch, text_col, batch_id=base + epoch_id)
        on_merges(store.train(num_merges, min_freq), base + epoch_id)

    stream = (
        spark.readStream.schema(doc_schema)
        .json(landing_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
