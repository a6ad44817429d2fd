"""Global ordering utilities: dense row numbers over a total order.

``ROW_NUMBER() OVER (ORDER BY ...)`` with an empty PARTITION BY is the
classic Spark scale trap: Catalyst plans a single-partition Exchange and
one task sorts the entire table. This module provides the scalable
formulation:

1. every row gets a deterministic bucket id that is MONOTONE in the
   sort key — ``width_bucket`` over the leading numeric column's
   min/max (footer-provided literals when the caller has them, else an
   in-plan scalar aggregate attached by broadcast), or, for
   non-numeric keys, how many sampled boundary tuples the key exceeds
   (lexicographic compare, pure JVM expressions);
2. per-bucket row counts roll into exclusive prefix offsets — a
   window over AT MOST ``4·n_part + 3`` aggregate rows (bounded by a
   plan constant, never by data), broadcast back onto the rows;
3. one hash exchange clusters each bucket and a per-bucket
   ``row_number`` window adds the local position to the bucket offset.

Everything is a single LAZY plan (round 15): no driver-side collect of
counts, no Arrow round-trip — the earlier formulation collected bucket
counts eagerly at build time and numbered rows in an Arrow-batched
``mapInPandas`` walk, which shipped the whole table through Python
(31.7s at sf1 vs DuckDB's 15.7s single window; the JVM window form
needs no Python stage at all). NOTHING is persisted: bucket ids are
pure expressions over the data (plus plan literals), so any
recomputation — retries, lost partitions, a second action on the
result — reproduces identical ids. The result is identical to the
single-partition window whenever the sort key is a total order
(unique); ties would make both formulations nondeterministic, so
require uniqueness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__gbucket"


def _lex_gt(cols: Sequence[str], bound: tuple) -> Column:
    """Lexicographic (col1, col2, ...) > bound as a JVM expression."""
    pred = F.lit(False)
    eq_prefix = F.lit(True)
    for c, v in zip(cols, bound):
        pred = pred | (eq_prefix & (F.col(c) > F.lit(v)))
        eq_prefix = eq_prefix & (F.col(c) == F.lit(v))
    # null keys compare to null -> treat as not-greater (bucket 0, where
    # the within-partition asc sort also puts nulls first)
    return F.coalesce(pred, F.lit(False))


def _sample_boundaries(
    df: DataFrame, cols: Sequence[str], n_part: int, n_rows: int
) -> list[tuple]:
    """n_part-1 boundary tuples from a seeded sample of the key columns.

    The sample is collected once at plan-build time and baked into the
    plan as literals, so the bucket assignment is deterministic however
    many times the result recomputes. Boundary quality only affects
    balance, never correctness."""
    target = n_part * 40
    keyed = df.select(*cols)
    if n_rows <= target * 2:
        rows = keyed.collect()
    else:
        frac = min(1.0, (target * 1.5) / n_rows)
        rows = keyed.sample(withReplacement=False, fraction=frac, seed=42).collect()
    # rows containing nulls can't be compared for boundary ranking (and
    # _lex_gt already routes them to bucket 0, nulls-first); drop them
    # from the boundary pool — this only affects balance, not ids
    tuples = sorted(
        set(t for t in (tuple(r) for r in rows) if None not in t)
    )
    if len(tuples) < 2:
        return []
    step = len(tuples) / n_part
    bounds: list[tuple] = []
    for i in range(1, n_part):
        b = tuples[min(int(i * step), len(tuples) - 1)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
    start: int = 1,
    n_rows_hint: int | None = None,
    small_below: int = 300_000,
    key_range_hint: tuple | None = None,
) -> DataFrame:
    """Assign consecutive global row ids (``start``, ``start``+1, ...)
    following the total order of *order_by*. The caller guarantees the
    key is unique — duplicates make any global numbering arbitrary.

    Output: input columns + ``id_col`` (bigint). The result is lazy,
    deterministic under recomputation, and pins no executor storage
    (nothing is persisted or checkpointed — the round-3 retention leak
    is gone by construction).

    ``n_rows_hint``: caller-known row count (e.g. from parquet footer
    statistics — ``sources.tables.table_rowcount``). When provided and
    ≤ ``small_below``, the single-partition window plan is used
    instead: below a few hundred thousand narrow rows one sort task
    beats the two-phase formulation (scheduling floors dominate; the
    round-15 JVM-window rewrite moved the measured crossover — 60k
    rows: 0.29s single vs 0.81s two-phase; 600k rows: 0.95 vs 0.83 —
    so the default sits at 300k). The hint routes the PLAN only;
    results are identical (the key is a total order).

    ``key_range_hint``: caller-known (min, max) of the FIRST order
    column (``sources.tables.table_column_range``) — with it the
    numeric path is a fully lazy plan with ZERO build-time Spark jobs;
    without it one scalar min/max aggregate is attached in-plan by
    broadcast (still zero build jobs, one extra narrow scan at
    execution). Hostile numeric keys need no fallback: NULLs take
    bucket 0 (nulls-first), NaNs take the top bucket (Spark sorts NaN
    last), ±Inf land on width_bucket's under/overflow buckets — the
    bucket id stays monotone in the key, which is the only property
    correctness needs (a degenerate range only costs balance)."""
    from pyspark.sql.types import NumericType
    from pyspark.sql.window import Window

    cols = list(order_by)
    if _BUCKET in df.columns:
        raise ValueError(f"column name {_BUCKET!r} is reserved")
    if n_rows_hint is not None and n_rows_hint <= small_below:
        w = Window.orderBy(*cols)
        return df.withColumn(
            id_col,
            (F.row_number().over(w) + F.lit(start - 1)).cast("long"),
        )
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    bucketed = None
    if isinstance(df.schema[cols[0]].dataType, NumericType):
        # numeric fast path: equal-width buckets on the first key column
        # — an O(1) monotone bucket expression (a chain of per-boundary
        # lexicographic predicates costs the optimizer ~1.5s per build
        # at 32 partitions; width_bucket is a single node). Uneven
        # buckets only skew partition sizes — the offsets below make
        # any assignment correct.
        n_buckets = n_part * 4  # finer grain absorbs mild skew
        xd = F.col(cols[0]).cast("double")
        hint_ok = (
            key_range_hint is not None
            and key_range_hint[0] is not None
            and key_range_hint[1] is not None
            and float(key_range_hint[0]) == float(key_range_hint[0])  # not NaN
            and float(key_range_hint[1]) == float(key_range_hint[1])
            and float(key_range_hint[0]) < float(key_range_hint[1])
        )
        if hint_ok:
            base = df
            lo_c = F.lit(float(key_range_hint[0]))
            hi_c = F.lit(float(key_range_hint[1]))
        else:
            # in-plan scalar range, NaN-excluded so one hostile value
            # cannot collapse every row into a single bucket
            clean = F.when(~F.isnan(xd), xd)
            rng = df.agg(
                F.min(clean).alias("__glo"), F.max(clean).alias("__ghi")
            )
            base = df.crossJoin(F.broadcast(rng))
            lo_c, hi_c = F.col("__glo"), F.col("__ghi")
        usable = lo_c.isNotNull() & hi_c.isNotNull() & (lo_c < hi_c)
        bucket = (
            F.when(F.col(cols[0]).isNull(), F.lit(0))
            .when(F.isnan(xd), F.lit(n_buckets + 2))
            .when(
                usable,
                F.width_bucket(xd, lo_c, hi_c, F.lit(n_buckets)),
            )
            .otherwise(F.lit(1))
        ).cast("int")
        bucketed = base.withColumn(_BUCKET, bucket)
        if not hint_ok:
            bucketed = bucketed.drop("__glo", "__ghi")
    else:
        # generic path: sampled lexicographic boundaries over the full
        # key (non-numeric leading column) — the sample is the one
        # build-time job this path keeps (bounds must be literals)
        n_rows = n_rows_hint if n_rows_hint is not None else df.count()
        bounds = _sample_boundaries(df, cols, n_part, n_rows)
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + _lex_gt(cols, b).cast("int")
        bucketed = df.withColumn(_BUCKET, bucket)

    # per-bucket counts -> exclusive prefix offsets, ALL in-plan: the
    # prefix window runs over at most n_buckets+3 aggregate rows (a
    # plan constant — this is the only single-partition exchange, and
    # it never sees data rows), then broadcasts back onto the rows
    counts = bucketed.groupBy(_BUCKET).agg(
        F.count(F.lit(1)).alias("__gcnt")
    )
    wo = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        _BUCKET,
        (
            F.coalesce(F.sum("__gcnt").over(wo), F.lit(0)) + F.lit(start)
        ).alias("__goff"),
    )
    # one hash exchange clusters each bucket; the window sorts within
    # and the global id is bucket offset + local position — no Python
    # stage, no driver collect, nothing persisted
    wb = Window.partitionBy(_BUCKET).orderBy(*cols)
    return (
        bucketed.join(F.broadcast(offs), _BUCKET)
        .withColumn(
            id_col,
            (F.col("__goff") + F.row_number().over(wb) - 1).cast("long"),
        )
        .drop(_BUCKET, "__goff")
    )
