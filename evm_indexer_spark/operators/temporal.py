"""Temporal join operators: as-of joins and point-in-interval joins.

The reference engine has no temporal joins (its Postgres layer would
need LATERAL; SURVEY §2.3 stops at equi/semi/anti joins) — these extend
the engine the way a time-series workload needs: "state as of event
time" (as-of) and "events inside incident windows" (interval join).

Scale shapes:

- ``asof_join`` is the union+window formulation: tag both inputs, union,
  one hash shuffle on the key, one in-partition sort, then a running
  ``last(..., ignorenulls)``. No join explosion, no per-row lookups —
  the same single-shuffle plan survives a 1000-executor cluster. Skewed
  keys cannot be salted here (the running window needs a total order per
  key); the mitigation at scale is range partitioning within the hot key
  (Spark does this automatically under AQE for the sort, not the
  window), or pre-aggregating the right side to a coarser time grain.
- ``interval_join`` bins time into fixed-width buckets: points land in
  exactly one bucket, intervals explode into the buckets they cover,
  and the match becomes an equi-join on the bucket id plus a residual
  range filter. Each (point, interval) pair meets in exactly one bucket
  (the point's), so no dedup pass is needed. Explosion factor is
  interval_length / bin_width — pick the bin near the median interval
  length so the factor stays O(1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_L, _R = 1, 0  # side tags; right sorts first so ties (left.ts == right.ts) match


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For every left row, attach the single right row with the largest
    ``right_ts`` <= ``left_ts`` on the same key (``direction="backward"``;
    ``"forward"`` takes the smallest >=). Matches DuckDB ``ASOF JOIN``
    / pandas ``merge_asof`` semantics, LEFT-outer: unmatched left rows
    keep nulls in the right columns.

    Column contract: ``right``'s columns must be disjoint from
    ``left``'s except for ``on`` (rename before calling). Right rows
    must be unique per (key, ts) — with duplicates the winner would be
    engine-dependent, so dedupe first (``groupBy(on, right_ts).agg(...)``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    right_payload = [c for c in right.columns if c != on]
    overlap = set(right_payload) & set(left_cols)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    # The right payload rides as ONE struct so the running fill is
    # atomic per matched row: filling columns independently would mix an
    # older row's value into a newer row's NULL column, diverging from
    # DuckDB ASOF / pandas merge_asof (which attach the whole matched
    # row, NULLs included). One last() over a struct also beats
    # |payload| parallel window functions.
    from pyspark.sql.types import StructField, StructType

    rp_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_payload]
    )
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(_L).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(rp_type).alias("__rp"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(_R).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in right_payload]).alias("__rp"),
    )
    u = l_tag.unionByName(r_tag)

    # backward: ascending scan, right row at equal ts sorts first so an
    # exact match is visible to the left row; forward: flip the time
    # order. Excluding exact matches flips the side order instead.
    side = F.col("__side") if allow_exact_matches else (1 - F.col("__side"))
    t = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t, side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "__side",
        *[F.col(c) for c in left_cols],
        F.last("__rp", ignorenulls=True).over(w).alias("__rp"),
    )
    return filled.filter(F.col("__side") == _L).select(
        *left_cols,
        *[F.col("__rp")[c].alias(c) for c in right_payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    end_inclusive: bool = False,
) -> DataFrame:
    """Join every point row to every interval row with
    ``start <= point_ts < end`` (``<= end`` when *end_inclusive*).

    No equality key is required: the bucket id IS the join key. Both
    sides shuffle on it; common buckets (bursts) behave like any other
    hot groupBy key and respond to AQE skew splitting.

    A broadcast-the-exploded-intervals variant was A/B'd in round 16
    and REJECTED: interleaved fresh-plan medians were statistically
    flat at both sf0.1 (0.478s vs 0.497s) and a synthetic 250k-event
    corpus at the q54 route boundary (0.800s vs 0.809s) — on dense
    data the broadcast build of |intervals| × (len/bin + 1) rows costs
    what the two saved shuffles earn, while giving up AQE skew
    splitting on burst bins. The shuffle join stays.

    Tuning: *bin_seconds* trades interval-row explosion (each interval
    appears in ceil(len/bin)+1 bins) against false candidates (every
    point meets every interval sharing its bin). For dense data, bins
    much finer than the interval length win: the exploded interval rows
    are slim while candidate pairs per bin shrink linearly — measured
    ~35% faster at bin=len/12 than bin=len on a 1M-point / 200k-interval
    join, at both 10× scales tested. Very sparse data prefers coarser
    bins (explosion dominates).
    """
    p_bin = (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("long")
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long"),
            )
        ),
    )
    upper = (
        F.col(point_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(point_ts) < F.col(end_col)
    )
    return (
        p.join(i, "__bin")
        .filter((F.col(start_col) <= F.col(point_ts)) & upper)
        .drop("__bin")
    )


def interval_aggregate(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    id_cols: Sequence[str],
    value_col: str | None = None,
    sum_scale: int = 1_000_000,
    end_inclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """COUNT(+SUM) of the points inside every interval — the algebraic
    fast path of ``interval_join`` + groupBy, via distributed prefix
    sums: O(|points| + |intervals|) instead of O(matching pairs).

    agg([s, e)) = P(e⁻) − P(s⁻) where P(t) is the running prefix
    (count, sum) of all points strictly before t. Every interval
    contributes two boundary probe rows (sign −1 at start, +1 at end);
    points and probes merge into one totally-ordered stream, the prefix
    is computed with the same literal-bucket two-phase range partition
    ``operators.order`` uses (sampled once, deterministic under
    recomputation, nothing persisted), and a final tiny groupBy over
    2·|intervals| probe rows emits one row per interval.

    Scale shape: one count/min/max agg job, one small per-bucket totals
    job, then a single range shuffle of slim (ts, tag, cnt, sval) rows
    — no pair blow-up. A 1-hour window over a 1M-events/hour stream
    costs the pair join ~1M pair-visits per interval; this path costs 2
    probe rows per interval regardless of density.

    Exactness: sums run in ``value*sum_scale`` int64 (associative,
    order-independent — float running sums drift by ~n·eps·Σ|x|, which
    breaks hash-stable comparisons). The caller picks *sum_scale* so
    scaled values stay integral and partition totals fit int64; values
    with more precision than the scale are rounded into it.

    Output: *id_cols* + ``n_points`` (long) + ``total_<value_col>``
    (double, unrounded) when *value_col* is given. Intervals with no
    points are INCLUDED with n_points = 0 (filter afterwards for
    inner-join semantics). Rows with NULL timestamps/bounds are
    dropped, matching SQL range-predicate semantics.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.types import LongType, StructField, StructType

    spark = points.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    ts_d = F.unix_micros(F.col(point_ts).cast("timestamp"))
    sval = (
        F.round(F.col(value_col) * sum_scale).cast("long")
        if value_col
        else F.lit(0).cast("long")
    )
    id_types = {c: intervals.schema[c].dataType for c in id_cols}
    ev = points.filter(F.col(point_ts).isNotNull()).select(
        ts_d.alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(1).cast("long").alias("__cnt"),
        sval.alias("__sv"),
        F.lit(0).alias("__sign"),
        *[F.lit(None).cast(id_types[c]).alias(c) for c in id_cols],
    )
    iv = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    # start probes read P(<s) (tag 0 sorts before same-ts points: points
    # at ts == s belong to the window, so they must NOT be in the start
    # prefix); end probes read P(<e), or P(<=e) when end_inclusive
    # (tag 2 sorts after same-ts points)
    end_tag = 2 if end_inclusive else 0
    probes = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.unix_micros(F.col(start_col).cast("timestamp")).alias(
                        "__ts"
                    ),
                    F.lit(0).alias("__tag"),
                    F.lit(-1).alias("__sign"),
                ),
                F.struct(
                    F.unix_micros(F.col(end_col).cast("timestamp")).alias(
                        "__ts"
                    ),
                    F.lit(end_tag).alias("__tag"),
                    F.lit(1).alias("__sign"),
                ),
            )
        ).alias("__b"),
        *[F.col(c) for c in id_cols],
    ).select(
        F.col("__b.__ts").alias("__ts"),
        F.col("__b.__tag").alias("__tag"),
        F.lit(0).cast("long").alias("__cnt"),
        F.lit(0).cast("long").alias("__sv"),
        F.col("__b.__sign").alias("__sign"),
        *id_cols,
    )
    u = ev.unionByName(probes)

    # literal-driven equal-width time buckets (order.py's numeric fast
    # path): one agg job for the range, an O(1) bucket expression, and
    # deterministic assignment under any recomputation
    n_rows, lo, hi = u.agg(
        F.count(F.lit(1)), F.min("__ts"), F.max("__ts")
    ).collect()[0]
    out_schema = StructType(
        [StructField(c, id_types[c]) for c in id_cols]
        + [
            StructField("__sign", u.schema["__sign"].dataType),
            StructField("__pc", LongType()),
            StructField("__ps", LongType()),
        ]
    )
    if n_rows == 0:
        empty = spark.createDataFrame([], out_schema)
        return _finish_interval_agg(empty, id_cols, value_col, sum_scale)
    n_buckets = n_part * 4
    if lo is not None and hi is not None and lo < hi:
        bucket = (
            F.width_bucket(
                F.col("__ts").cast("double"),
                F.lit(float(lo)),
                F.lit(float(hi)),
                F.lit(n_buckets),
            )
            .cast("int")
            .alias("__bk")
        )
    else:
        bucket = F.lit(1).alias("__bk")
    b = u.select("*", bucket)

    totals = {
        r[0]: (r[1], r[2])
        for r in b.groupBy("__bk")
        .agg(F.sum("__cnt"), F.sum("__sv"))
        .collect()
    }
    offsets: dict[int, tuple[int, int]] = {}
    acc_c, acc_s = 0, 0
    for k in sorted(totals):
        offsets[k] = (acc_c, acc_s)
        acc_c += int(totals[k][0])
        acc_s += int(totals[k][1])
    b_off = spark.sparkContext.broadcast(offsets)
    out_names = [f.name for f in out_schema.fields]

    def scan(it):
        import numpy as np

        offs = b_off.value
        cur_bk = None
        run_c = run_s = 0
        for batch in it:
            if not len(batch):
                continue
            bks = batch["__bk"].to_numpy()
            cnt = batch["__cnt"].to_numpy(dtype="int64")
            sv = batch["__sv"].to_numpy(dtype="int64")
            pc = np.empty(len(batch), dtype="int64")
            ps = np.empty(len(batch), dtype="int64")
            i = 0
            while i < len(batch):
                bk = bks[i]
                j = int(np.searchsorted(bks, bk, side="right"))
                if bk != cur_bk:
                    cur_bk = bk
                    run_c, run_s = offs.get(int(bk), (0, 0))
                pc[i:j] = run_c + np.cumsum(cnt[i:j])
                ps[i:j] = run_s + np.cumsum(sv[i:j])
                run_c, run_s = int(pc[j - 1]), int(ps[j - 1])
                i = j
            mask = batch["__sign"].to_numpy() != 0
            if not mask.any():
                continue
            out = batch.loc[mask, [*id_cols, "__sign"]].copy()
            out["__pc"] = pc[mask]
            out["__ps"] = ps[mask]
            yield out[out_names]

    ranged = b.repartitionByRange(
        max(1, n_part), "__bk"
    ).sortWithinPartitions("__bk", "__ts", "__tag")
    scanned = ranged.mapInPandas(scan, schema=out_schema)
    return _finish_interval_agg(scanned, id_cols, value_col, sum_scale)


def _finish_interval_agg(
    scanned: DataFrame,
    id_cols: Sequence[str],
    value_col: str | None,
    sum_scale: int,
) -> DataFrame:
    aggs = [F.sum(F.col("__sign") * F.col("__pc")).alias("n_points")]
    if value_col:
        aggs.append(
            (
                F.sum(F.col("__sign") * F.col("__ps"))
                / F.lit(float(sum_scale))
            ).alias(f"total_{value_col}")
        )
    return scanned.groupBy(*id_cols).agg(*aggs)
