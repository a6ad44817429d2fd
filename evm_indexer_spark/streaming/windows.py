"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference's only time-based streaming construct is the
confirmation-depth gate (T2); these operators extend the engine with the
standard event-time toolkit a stream of chain or product events needs at
scale: tumbling-window aggregates and gap-based sessionization, with a
watermark bounding both state size and late-data acceptance. The same
expressions run in batch (driver catalog q42/q43) — one definition, two
execution modes.

State-size note: with watermark delay W and window width T, the store
holds O(W/T) windows per group key — bounded regardless of stream
length; without the watermark, state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum per event_type; rows older than the
    watermark are dropped from aggregation state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session aggregation per user (native session_window —
    state merges as events arrive, closes once the watermark passes).

    Streaming sinks must use ``append`` output mode (sessions emit only
    when the watermark closes them; Spark rejects ``update`` here).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def start_to_memory(
    agg: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> StreamingQuery:
    """Run a windowed aggregate into an in-memory sink (tests/dev)."""
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    max_interval_seconds: int,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bin_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream point-in-interval join: every point row joins the
    interval rows with ``start <= point_ts < end``.

    The streaming twin of ``operators.temporal.interval_join``, using
    the same time-binning trick — and here the bin is load-bearing
    twice: Spark refuses stream-stream joins without an equality
    predicate, and the bin IS that equality key.

    State eviction needs a range condition BETWEEN THE TWO WATERMARKED
    columns (``point_ts`` and ``start_col``) — the ``point_ts <
    end_col`` residual can't evict anything because ``end_col`` carries
    no watermark, and the derived ``__bin`` key drops watermark
    metadata. So the join adds ``point_ts < start_col +
    max_interval_seconds``: with it, interval-side state is bounded by
    O(watermark + max_interval) and point-side by O(watermark),
    regardless of stream length. *max_interval_seconds* is therefore a
    REQUIRED argument, not a default: it is a semantic contract —
    matches past the bound are silently dropped (unlike the batch twin
    ``operators.temporal.interval_join``, which has no bound) — so the
    caller must state the workload's true maximum interval length and
    enforce it upstream.
    Intervals explode into one state row per covered bin, identical to
    the batch operator's explosion factor. Inner join (the batch twin's
    semantics)."""
    p = points.withWatermark(point_ts, watermark).withColumn(
        "__bin", (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("long")
    )
    i = intervals.withWatermark(start_col, watermark).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long"),
            )
        ),
    )
    cond = (
        (p["__bin"] == i["__bin"])
        & (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
        # eviction bound: watermarked col vs watermarked col (see above)
        & (
            F.col(point_ts)
            < F.col(start_col) + F.expr(f"INTERVAL {max_interval_seconds} SECOND")
        )
    )
    return p.join(i, cond, "inner").drop("__bin")
