"""Streaming ingestion pipeline (SURVEY §2.8 T1-T7, §3.3).

The reference's block-processor queue — unconfirmed fetch → publish →
insert → depth-gated confirm, with retry/dedup bookkeeping
(``app/queue/queue.go:333-605``) — collapses on Spark into:

- a Structured Streaming ``readStream`` over the raw-block landing zone
  (file source here; a Kafka header topic in production) feeding
- one ``foreachBatch`` handler that normalizes, upserts with
  replace-by-number (reorg-safe, see ``store``), and emits
  notification rows exactly once (publish log anti-join = T5), plus
- a depth-gate view for finality (T2) and a scheduled gap-repair job
  reusing the J6 anti-join (T7).

Checkpointing replaces the hand-rolled two-phase state machine: a
replayed micro-batch re-runs the idempotent upsert and the publish-log
anti-join drops already-sent notifications.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT_CONFIG, EngineConfig
from ..operators.sync import find_missing_blocks_in_range
from ..sources.normalize import (
    RAW_BLOCK_SCHEMA,
    normalize_blocks,
    normalize_events,
    normalize_transactions,
)
from .store import BlockStore


def _accepts_batch_arg(cb) -> bool:
    """True iff *cb* can take the batch-frames tuple as a THIRD
    POSITIONAL argument. Counting ``signature().parameters`` alone
    miscounts ``def cb(store, fresh, *, batch=None)`` (3 params, but
    the third is keyword-only) and ``(store, fresh, **kw)`` — both
    would then TypeError at publish time (round-15 ADVICE). Only
    POSITIONAL_OR_KEYWORD / POSITIONAL_ONLY slots count, and one
    ``*args`` accepts any arity. Unsignaturable callables (some
    builtins / partials over them) fall back to the 2-arg contract."""
    import inspect

    try:
        params = inspect.signature(cb).parameters.values()
    except (TypeError, ValueError):
        return False
    positional = 0
    for p in params:
        if p.kind in (
            inspect.Parameter.POSITIONAL_ONLY,
            inspect.Parameter.POSITIONAL_OR_KEYWORD,
        ):
            positional += 1
        elif p.kind is inspect.Parameter.VAR_POSITIONAL:
            return True
    return positional >= 3


def process_raw_batch(
    store: BlockStore,
    raw: DataFrame,
    batch_id: int = 0,
    on_fresh=None,
    on_timing=None,
) -> DataFrame:
    """One micro-batch: normalize → dedup → upsert → publish-once.

    Returns the notification rows actually published this batch (block
    numbers+hashes not seen in the publish log — T5 semantics,
    queue.go:155-189). Duplicate header delivery inside or across
    batches is a no-op.

    *on_fresh*, when given, is called with ``(store, fresh)`` BEFORE the
    publish log is appended — delivery order matters: if the callback
    (e.g. a pub/sub send) dies, the batch fails with the log untouched,
    the replay recomputes the same fresh set and re-sends — at-least-
    once, deduped downstream by (number, hash), exactly the reference's
    publish-before-persist semantics (block.go:22-52, fetch.go:34).
    Appending the log first would silently drop notifications on a
    mid-publish crash (at-most-once).

    *on_timing*, when given, receives one dict of per-leg wall-clock
    seconds per batch — ``{"upsert": s, "fresh": s, "publish": s,
    "mark": s}`` — the driver-side decomposition behind the
    notification-latency bench's leg breakdown. Pure observation: no
    leg is reordered or skipped.
    """
    import time as _time

    t0 = _time.perf_counter()
    # malformed landing docs parse to null key fields under the declared
    # schema (PERMISSIVE mode) — drop them; the gap they leave is healed
    # by the T7 repair job rather than poisoning the store
    raw = raw.filter(F.col("hash").isNotNull() & F.col("number").isNotNull())
    # empty-batch short-circuit: a live stream (processingTime=0) spins
    # continuously between arrivals, and an empty micro-batch would
    # still pay the full upsert/publish/mark job chain (~1s of
    # scheduling floors) — one limit-1 probe job instead. This also
    # keeps the leg-timing samples free of degenerate empty batches.
    if raw.isEmpty():
        return raw.sparkSession.createDataFrame(
            [], "number long, hash string"
        )
    raw = raw.dropDuplicates(["number", "hash"])  # duplicate header delivery
    # NOTE: deliberately NOT persisted — caching the deeply nested raw
    # rows measured ~10% slower than letting each normalizer re-parse
    # the source (Tungsten caching of nested arrays is expensive;
    # measured 1030 vs 900 blocks/s warm)
    blocks = normalize_blocks(raw)
    txs = normalize_transactions(raw)
    events = normalize_events(raw)

    wants_batch = on_fresh is not None and _accepts_batch_arg(on_fresh)
    upsert_wall = [0.0]

    def run_upsert() -> None:
        ts = _time.perf_counter()
        store.upsert_batch(blocks, txs, events)
        upsert_wall[0] = _time.perf_counter() - ts

    def build_fresh() -> DataFrame:
        f = blocks.select("number", "hash").join(
            store.published(), ["number", "hash"], "left_anti"
        )
        # eager lineage cut: the plan reads the publish log we are
        # about to append to — without materializing first, a later
        # re-evaluation would see its own append and report nothing as
        # fresh
        return f.localCheckpoint(eager=True)

    if wants_batch:
        # 3-arg publishers build payloads from the BATCH's own frames
        # and never read the tables the upsert writes, so the upsert
        # and the fresh/publish legs are independent — overlap them
        # (round-15 latency leg cut: serially they were the two
        # largest legs of the notify path). Crash semantics are
        # unchanged: either failure fails the batch before the publish
        # log is appended, and the replay re-runs the idempotent
        # upsert and re-sends (at-least-once, deduped downstream).
        # Batch-internal ordering vs the reference's per-block
        # publish-before-persist is already the documented divergence
        # (PARITY.md).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(run_upsert)
            try:
                fresh = build_fresh()
                t2 = _time.perf_counter()
                on_fresh(store, fresh, (blocks, txs, events))
                t3 = _time.perf_counter()
            finally:
                fut.result()  # surface upsert failures; never orphan it
        t1 = None  # unused in the overlapped branch (legs read t0/t2)
    else:
        # 2-arg publishers may read the STORE tables (the manual
        # re-publish fallback), so the upsert must complete first
        run_upsert()
        t1 = _time.perf_counter()
        fresh = build_fresh()
        t2 = _time.perf_counter()
        if on_fresh is not None:
            on_fresh(store, fresh)
        t3 = _time.perf_counter()
    store.mark_published(fresh)
    if on_timing is not None:
        t4 = _time.perf_counter()
        on_timing(
            {
                # NOTE under wants_batch the upsert leg OVERLAPS
                # fresh+publish — legs can sum past the batch wall time
                "upsert": upsert_wall[0],
                "fresh": t2 - (t1 if not wants_batch else t0),
                "publish": t3 - t2,
                "mark": t4 - t3,
                "overlapped": 1.0 if wants_batch else 0.0,
            }
        )
    return fresh


def start_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    store: BlockStore,
    checkpoint_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    publish=None,
    trigger: dict | None = None,
    on_timing=None,
) -> StreamingQuery:
    """File-source streaming ingest: JSON block docs dropped into
    *landing_dir* flow through ``process_raw_batch`` under a checkpoint.

    *publish*, when given, is called as ``publish(store, fresh)`` with
    each batch's publish-once-fresh (number, hash) rows — e.g.
    ``resp.make_resp_publisher`` pushing the reference's three
    notification channels. It runs BEFORE the publish log is appended
    (see ``process_raw_batch``): a publisher crash fails the batch with
    the log untouched, so the replay re-sends — at-least-once delivery,
    deduplicated downstream by (number, hash); a cleanly replayed batch
    has an empty fresh set and re-fires nothing.

    T1's gap/regression detection is delegated to the T7 repair job
    (`repair_gaps`) rather than crashing the stream — a deliberate
    divergence documented in SURVEY §2.8 (listener.go:57-61 crashes on
    gap; a 1000-executor stream should heal instead).
    """
    raw_stream = (
        spark.readStream.schema(RAW_BLOCK_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(landing_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_raw_batch(
            store, batch_df, batch_id, on_fresh=publish,
            on_timing=on_timing,
        )

    # default trigger drains what's there and stops (the backfill /
    # test shape); a live sync loop passes e.g.
    # trigger={"processingTime": "0 seconds"} to keep polling the
    # landing dir — the reference's continuously running listener
    return (
        raw_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def confirmed_blocks(
    blocks: DataFrame, latest: int | None = None, depth: int | None = None
) -> DataFrame:
    """T2 finality gate: block is confirmed iff latest - number >= depth
    (CanBeConfirmed, app/queue/queue.go:320-328).

    With ``latest=None`` the head is derived from the table itself via a
    broadcast scalar join (no driver round-trip).
    """
    d = DEFAULT_CONFIG.block_confirmations if depth is None else depth
    if latest is not None:
        return blocks.filter(F.lit(latest) - F.col("number") >= d)
    head = blocks.agg(F.max("number").alias("_head"))
    return (
        blocks.join(F.broadcast(head))
        .filter(F.col("_head") - F.col("number") >= d)
        .drop("_head")
    )


def repair_gaps(
    spark: SparkSession, store: BlockStore, frm: int, to: int
) -> DataFrame:
    """T7 gap repair: the J6 anti-join over the expected range — returns
    the numbers to refetch (SyncMissingBlocksInDB, syncer.go:152-207)."""
    return find_missing_blocks_in_range(spark, store.blocks(), frm, to)


def confirmed_mismatches(store: BlockStore, raw_confirmed: DataFrame) -> DataFrame:
    """T3 confirmed re-pass: blocks whose stored hash differs from the
    refetched doc at finality depth — the reorg check the reference does
    with ``SimilarTo`` before replacing (``listener.go:124-148``,
    ``model.go:41-57``, ``db/block.go:44-58``).

    Returns (number, stored_hash, confirmed_hash); feeding the matching
    raw docs back through ``process_raw_batch`` performs the replacement
    (idempotent replace-by-number).
    """
    stored = store.blocks().select("number", F.lower("hash").alias("stored_hash"))
    incoming = normalize_blocks(raw_confirmed).select(
        "number", F.col("hash").alias("confirmed_hash")
    )
    return (
        incoming.join(stored, "number", "inner")
        .filter(F.col("stored_hash") != F.col("confirmed_hash"))
        .select("number", "stored_hash", "confirmed_hash")
    )
