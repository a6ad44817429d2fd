"""Reorg-safe partitioned block store (SURVEY S8-S11, §7 risk 2).

The reference persists each block in one Postgres transaction — insert
block, upsert txs/events, and on a same-number/different-hash conflict
cascade-delete the old version first (``StoreBlock``,
``app/db/block.go:24-106``; cascade decl ``model.go:31-32,73``).

Spark-first equivalent: the three tables are parquet directories
partitioned by ``bucket = number // BLOCK_BUCKET_SIZE``. A micro-batch
upsert rewrites only the touched buckets: surviving rows = existing rows
whose ``number`` is NOT being replaced, plus the new rows — an idempotent
read-merge-overwrite keyed on block number, re-runnable from a streaming
checkpoint (at-least-once delivery collapses to exactly-once state).
Reorgs fall out naturally: the new block at a number replaces the old
one, and txs/events of the replaced block disappear with it (the cascade
delete, expressed relationally).

At 100 TB this stays bounded: a micro-batch touches O(new-blocks /
bucket-size) partitions, and dynamic partition overwrite
(``partitionOverwriteMode=dynamic``) leaves every other bucket untouched.
On a Delta/Iceberg deployment the same logic is a three-table MERGE; the
bucket layout and number-keyed replacement are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BLOCK_BUCKET_SIZE, BLOCKS_SCHEMA, EVENTS_SCHEMA, TRANSACTIONS_SCHEMA

_SCHEMAS = {
    "blocks": BLOCKS_SCHEMA,
    "transactions": TRANSACTIONS_SCHEMA,
    "events": EVENTS_SCHEMA,
}


def bucket_of(number_col):
    return (number_col / BLOCK_BUCKET_SIZE).cast("long")


class BlockStore:
    """Three bucket-partitioned parquet tables + a tiny publish log."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, table: str) -> DataFrame:
        path = self._path(table)
        # fresh StructType: .add() would mutate the shared module-level
        # schema object in place, growing a `bucket` field per call
        schema = T.StructType(
            list(_SCHEMAS[table].fields) + [T.StructField("bucket", T.LongType())]
        )
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], schema)
        # explicit schema: a bucket dir that exists but holds no data
        # files yet (empty micro-batch) must read as an empty frame, not
        # fail schema inference
        return self.spark.read.schema(schema).parquet(path)

    def historical_queries(self, config=None):
        """HistoricalQueries wired for partition pruning: tables keep the
        ``bucket`` column and number-window queries constrain it, so a
        guardrail-bounded query touches 1-2 partitions regardless of
        chain length. The plain ``blocks()``/... accessors drop the
        column for layout-agnostic consumers."""
        from ..config import DEFAULT_CONFIG
        from ..operators.historical import HistoricalQueries

        return HistoricalQueries(
            self.read("blocks"),
            self.read("transactions"),
            self.read("events"),
            config or DEFAULT_CONFIG,
            bucket_size=BLOCK_BUCKET_SIZE,
            time_bucket_resolver=self.buckets_for_time_range,
        )

    def rest_facade(self, config=None):
        """RestFacade with the hash→bucket hint index wired by default —
        point reads by hash scan one bucket, not the chain."""
        from ..api import RestFacade
        from ..config import DEFAULT_CONFIG

        return RestFacade(
            self.historical_queries(config),
            config or DEFAULT_CONFIG,
            hash_index=HashIndex(self),
        )

    def blocks(self) -> DataFrame:
        return self.read("blocks").drop("bucket")

    def transactions(self) -> DataFrame:
        return self.read("transactions").drop("bucket")

    def events(self) -> DataFrame:
        return self.read("events").drop("bucket")

    # -- upsert ------------------------------------------------------------

    def upsert_batch(
        self, blocks: DataFrame, txs: DataFrame, events: DataFrame
    ) -> None:
        """Atomically-enough replace-by-number for one micro-batch.

        Write order blocks→txs→events matches the reference's FK order;
        a crash between table writes is healed by re-running the batch
        (idempotent) or by the gap-repair job (T7).
        """
        blocks = blocks.withColumn("bucket", bucket_of(F.col("number")))
        # map each fact row to its block's bucket/number via the batch's
        # own blocks (every tx/event in a batch belongs to a batch block)
        key = blocks.select(
            F.col("hash").alias("_bh"), F.col("number").alias("_num"), "bucket"
        )
        txs = txs.join(key, txs["blockhash"] == key["_bh"], "inner").drop("_bh")
        events = events.join(key, events["blockhash"] == key["_bh"], "inner").drop(
            "_bh"
        )

        replaced = blocks.select(F.col("number").alias("_num")).distinct()
        touched = [r[0] for r in blocks.select("bucket").distinct().collect()]

        self._rewrite(
            "blocks",
            touched,
            blocks,
            lambda existing: existing.join(
                replaced, existing["number"] == replaced["_num"], "left_anti"
            ),
        )
        # cascade-delete semantics: a surviving fact row is one whose parent
        # block hash still exists in the (just-rewritten) touched buckets
        def keep_children(existing: DataFrame) -> DataFrame:
            parents = (
                self.read("blocks")
                .filter(F.col("bucket").isin(touched))
                .select(F.col("hash").alias("_kh"))
            )
            return existing.join(
                F.broadcast(parents),
                existing["blockhash"] == F.col("_kh"),
                "left_semi",
            )

        for table, batch in (("transactions", txs), ("events", events)):
            self._rewrite(table, touched, batch.drop("_num"), keep_children)
        self._refresh_time_stats(touched)

    # -- zone maps (by-time pruning) ---------------------------------------

    def _time_stats_path(self) -> str:
        return self._path("_time_stats.json")

    def _time_stats(self) -> dict:
        import json

        try:
            with open(self._time_stats_path()) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return {}

    def _refresh_time_stats(self, touched: list[int]) -> None:
        """Record exact [min,max] block time per just-rewritten bucket —
        the same zone maps AtomicBlockStore keeps in its manifest,
        here as a side file under the store root. Consistency follows
        the store's own contract: the stats write happens after the
        partition overwrites, and a crash in between is healed by the
        idempotent batch replay (which recomputes them); a DELETE only
        ever leaves bounds over-wide, never wrong-narrow."""
        import json

        stats = self._time_stats()
        fresh = (
            self.read("blocks")
            .filter(F.col("bucket").isin(touched))
            .groupBy("bucket")
            .agg(F.min("time").alias("tmin"), F.max("time").alias("tmax"))
            .collect()
        )
        for r in fresh:
            stats[str(int(r["bucket"]))] = [r["tmin"], r["tmax"]]
        tmp = self._time_stats_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, self._time_stats_path())

    def buckets_for_time_range(self, frm: int, to: int) -> list[int] | None:
        """Buckets whose recorded time bounds intersect [frm, to]; None
        when no stats exist yet (full-scan fallback). Bucket dirs on
        disk that predate the stats file are conservatively included."""
        stats = self._time_stats()
        if not stats:
            return None
        path = self._path("blocks")
        try:
            on_disk = [
                int(d.split("=", 1)[1])
                for d in os.listdir(path)
                if d.startswith("bucket=")
            ]
        except OSError:
            return None
        out = []
        for b in on_disk:
            bounds = stats.get(str(b))
            if (
                bounds is None
                or bounds[0] is None
                or bounds[1] is None
                or (bounds[0] <= to and bounds[1] >= frm)
            ):
                out.append(b)
        return sorted(out)

    def _rewrite(self, table: str, buckets: list[int], new_rows: DataFrame, keep_fn):
        """Overwrite the touched buckets with keep_fn(existing) ∪ new."""
        path = self._path(table)
        cols = [f.name for f in _SCHEMAS[table]] + ["bucket"]
        if os.path.isdir(path):
            existing = self.read(table).filter(F.col("bucket").isin(buckets))
            survivors = keep_fn(existing).select(*cols)
            merged = survivors.unionByName(new_rows.select(*cols))
        else:
            merged = new_rows.select(*cols)
        sort_key = "number" if table == "blocks" else "blockhash"
        (
            merged.repartition("bucket")
            # clustering within each bucket file gives parquet row-group
            # min/max stats real selectivity for number/blockhash
            # predicates (the reference's B-tree analog, SURVEY §4)
            .sortWithinPartitions("bucket", sort_key)
            .write.partitionBy("bucket")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )

    # -- publish log (T5 publish-once) -------------------------------------

    def published(self) -> DataFrame:
        path = self._path("_published")
        if not os.path.isdir(path):
            # crash recovery: a compaction interrupted mid-swap leaves the
            # old log renamed aside — restore it rather than reporting an
            # empty log (which would re-publish every block)
            retired = path + "_retired"
            if os.path.isdir(retired):
                os.rename(retired, path)
            else:
                return self.spark.createDataFrame(
                    [], "number long, hash string"
                )
        return self.spark.read.parquet(path)

    def mark_published(self, rows: DataFrame) -> None:
        rows.select("number", "hash").write.mode("append").parquet(
            self._path("_published")
        )

    # NOTE: the core tables need no OPTIMIZE-style compaction — every
    # upsert rewrites its touched buckets wholesale (sorted, one file
    # set), so files never fragment. Only the append-only publish log
    # accumulates small files; see ``compact_published``.

    def compact_published(self) -> None:
        """Rewrite the append-only publish log as one deduped file set.

        The log grows one tiny file per micro-batch and keeps
        reorged-away hashes forever; periodic compaction (e.g. alongside
        the T7 repair sweep) bounds both file count and the anti-join
        probe size. Dedup on (number, hash) preserves publish-once
        semantics exactly.
        """
        path = self._path("_published")
        if not os.path.isdir(path):
            return
        compacted = self.published().dropDuplicates(["number", "hash"])
        tmp = path + "_compacting"
        compacted.coalesce(1).write.mode("overwrite").parquet(tmp)
        # Swap via directory renames so the live log is never absent: a
        # mode('overwrite') onto `path` deletes it before the rewrite
        # lands, and a crash in that window would make the T5 anti-join
        # see an empty log and re-publish every block. Rename is atomic
        # on a POSIX filesystem; the worst crash outcome now is a stale
        # `_retired` directory, never a missing log.
        import shutil

        retired = path + "_retired"
        shutil.rmtree(retired, ignore_errors=True)
        os.rename(path, retired)
        try:
            os.rename(tmp, path)
        except OSError:
            os.rename(retired, path)  # roll back: keep the old log live
            raise
        shutil.rmtree(retired, ignore_errors=True)


# -- hash→bucket hint index (SURVEY §7 risk 3) ------------------------------
#
# Point lookups by hash (P4: GetBlockByHash / GetTransactionByHash) can't
# prune the number-bucketed layout — the hash says nothing about the
# bucket. The reference leans on a Postgres B-tree; the columnar analog
# is a SLIM append-only side index (hash, bucket): ~50 bytes/block, so
# even a 20M-block chain indexes in ~1 GB of narrow parquet that scans
# in a trice vs. the full fact tables, and the bucket it yields turns
# the point read into a one-partition scan. Maintained alongside the
# publish log, compacted the same way.


class HashIndex:
    """Append-only (hash, bucket) hint index over a ``BlockStore`` or
    ``AtomicBlockStore`` (both expose the ``_path``/``read`` surface)."""

    def __init__(self, store) -> None:
        self.store = store

    def _path(self) -> str:
        return self.store._path("_hashidx")

    def append(self, blocks: DataFrame) -> None:
        """Record a batch's block hashes (call right after
        ``upsert_batch`` with the same normalized blocks)."""
        blocks.select(
            F.lower("hash").alias("hash"), bucket_of(F.col("number")).alias("bucket")
        ).write.mode("append").parquet(self._path())

    def read(self) -> DataFrame:
        import os as _os

        if not _os.path.isdir(self._path()):
            return self.store.spark.createDataFrame([], "hash string, bucket long")
        return self.store.spark.read.parquet(self._path())

    def bucket_of_hash(self, block_hash: str) -> int | None:
        """Resolve a block hash to its bucket; None if unindexed. One
        scan of the slim index — never of the fact tables. Reorged-away
        hashes may linger (like the publish log); the caller's point
        read simply finds no row in the bucket, which is correct."""
        rows = (
            self.read()
            .filter(F.col("hash") == block_hash.lower())
            .select("bucket")
            .limit(1)
            .collect()
        )
        return int(rows[0][0]) if rows else None

    def _bucket_slice(self, table: str, bucket: int | None) -> DataFrame:
        """The *table* rows for one bucket: manifest path-pruned when the
        store supports it (``read_buckets``), else the bucket-column
        filter over the full read (partition/row-group pruning)."""
        if bucket is None:
            return self.store.read(table)
        if hasattr(self.store, "read_buckets"):
            return self.store.read_buckets(table, [bucket])
        return self.store.read(table).filter(F.col("bucket") == bucket)

    def lookup_block(self, block_hash: str) -> DataFrame:
        """P4 point read pruned through the index: resolve the bucket,
        then scan ONLY that bucket of ``blocks``. Falls back to the full
        scan when the hash is unindexed (pre-index history)."""
        b = self.bucket_of_hash(block_hash)
        return (
            self._bucket_slice("blocks", b)
            .filter(F.lower(F.col("hash")) == block_hash.lower())
            .drop("bucket")
        )

    def lookup_block_transactions(self, block_hash: str) -> DataFrame:
        """Transactions of one block, bucket-pruned through the index:
        fact rows carry their parent block's bucket in both store
        layouts, so the block's bucket prunes the tx scan too."""
        b = self.bucket_of_hash(block_hash)
        return (
            self._bucket_slice("transactions", b)
            .filter(F.lower(F.col("blockhash")) == block_hash.lower())
            .drop("bucket")
        )

    def compact(self) -> None:
        """Dedup + rewrite (same crash-safe rename swap as the publish
        log would need; the index is advisory, so a lost index only
        costs performance, never correctness)."""
        import shutil

        path = self._path()
        import os as _os

        if not _os.path.isdir(path):
            return
        tmp = path + "_compacting"
        self.read().dropDuplicates(["hash"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        retired = path + "_retired"
        shutil.rmtree(retired, ignore_errors=True)
        _os.rename(path, retired)
        _os.rename(tmp, path)
        shutil.rmtree(retired, ignore_errors=True)
