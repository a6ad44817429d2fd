"""Global ordering utilities: dense row numbers over a total order.

``ROW_NUMBER() OVER (ORDER BY ...)`` with an empty PARTITION BY is the
classic Spark scale trap: Catalyst plans a single-partition Exchange and
one task sorts the entire table. This module provides the scalable
formulation:

1. a small driver-side sample of the sort key picks ``n_part - 1``
   boundary tuples, embedded in the plan as literals; every row gets a
   deterministic bucket id = how many boundaries it exceeds
   (lexicographic compare, pure JVM expressions);
2. one column-pruned pass counts rows per bucket; the exclusive
   cumulative counts give each bucket's global offset (a handful of
   numbers, driver-side);
3. ``repartitionByRange`` on the bucket id (equal values are never
   split across partitions) + ``sortWithinPartitions`` on (bucket,
   key), then an Arrow-batched ``mapInPandas`` walks each sorted
   partition once, adding bucket offset + local position.

Total cost: one count, one sample scan, one counting scan, then a
single range shuffle of the data — and NOTHING persisted: unlike a
pid-offset design (which must pin the shuffled table so the counting
job and the numbering job see identical partition boundaries), bucket
ids are literal-driven, so any recomputation — retries, lost
partitions, a second action on the result — reproduces identical ids.
The result is identical to the single-partition window whenever the
sort key is a total order (unique); ties would make both formulations
nondeterministic, so require uniqueness.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

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
    small_below: int = 2_000_000,
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
    instead: below ~2M narrow rows, one sort task beats the two-phase
    formulation's three jobs (count/min-max agg, bucket counting, the
    range shuffle) — measured via noop-write 5-run medians at 600k
    rows on local[32]: 1.33s two-phase vs 0.87s window (collect-style
    timing hides the gap; result transfer dominates both). The hint
    routes the PLAN only; results are identical (the key is a total
    order). Above the tier — and whenever the caller has no cheap
    count — the scalable two-phase path runs, so nothing at 100-TB
    scale ever touches the single-partition window."""
    import pandas as pd  # noqa: F401 — mapInPandas batch type

    from pyspark.sql.types import NumericType

    cols = list(order_by)
    if _BUCKET in df.columns:
        raise ValueError(f"column name {_BUCKET!r} is reserved")
    if n_rows_hint is not None and n_rows_hint <= small_below:
        from pyspark.sql.window import Window

        w = Window.orderBy(*cols)
        return df.withColumn(
            id_col,
            (F.row_number().over(w) + F.lit(start - 1)).cast("long"),
        )
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    bucketed = None
    n_buckets = n_part
    if isinstance(df.schema[cols[0]].dataType, NumericType):
        # numeric fast path: equal-width buckets on the first key column
        # — count/min/max in ONE agg job and an O(1) bucket expression
        # (a chain of per-boundary lexicographic predicates costs the
        # optimizer ~1.5s per build at 32 partitions; width_bucket is a
        # single node). Uneven buckets only skew partition sizes — the
        # offsets below make any assignment correct.
        n_rows, lo, hi = df.agg(
            F.count(F.lit(1)), F.min(cols[0]), F.max(cols[0])
        ).collect()[0]
        if n_rows == 0:
            return df.withColumn(id_col, F.lit(start).cast("long")).limit(0)
        if lo is not None and hi is not None and lo < hi:
            # (a NaN min/max fails the lo < hi check, so frames holding
            # NaN keys fall through to the generic sampled path, whose
            # `>` predicates follow Spark's NaN-sorts-last semantics)
            n_buckets = n_part * 4  # finer grain absorbs mild skew
            bucketed = df.withColumn(
                _BUCKET,
                # null keys -> bucket 0, matching the nulls-first order
                # of the within-partition asc sort; width_bucket would
                # return NULL and break the int-keyed offset table
                F.when(F.col(cols[0]).isNull(), F.lit(0))
                .otherwise(
                    F.width_bucket(
                        F.col(cols[0]).cast("double"),
                        F.lit(float(lo)),
                        F.lit(float(hi)),
                        F.lit(n_buckets),
                    )
                )
                .cast("int"),
            )
    else:
        n_rows = df.count()
        if n_rows == 0:
            return df.withColumn(id_col, F.lit(start).cast("long")).limit(0)
    if bucketed is None:
        # generic path: sampled lexicographic boundaries over the full
        # key (non-numeric leading column, or a constant one)
        bounds = _sample_boundaries(df, cols, n_part, n_rows)
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + _lex_gt(cols, b).cast("int")
        bucketed = df.withColumn(_BUCKET, bucket)

    # pass: rows per bucket -> exclusive cumulative offsets (<= n_part
    # numbers on the driver; the scan is column-pruned to the key cols)
    counts = {
        r[0]: r[1]
        for r in bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1))).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    from pyspark.sql.types import LongType, StructField, StructType

    # list concat, not .add() — StructType.add mutates shared schemas
    out_schema = StructType(
        list(df.schema.fields) + [StructField(id_col, LongType())]
    )
    out_cols = [f.name for f in out_schema.fields]
    b_offsets = spark.sparkContext.broadcast(offsets)

    def number(iterator: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        offs = b_offsets.value
        cur_b = None
        pos = start
        for batch in iterator:
            m = len(batch)
            if m == 0:
                continue
            b_arr = batch[_BUCKET].to_numpy()
            ids = np.empty(m, dtype="int64")
            i = 0
            while i < m:
                b = b_arr[i]
                j = int(np.searchsorted(b_arr, b, side="right"))
                if b != cur_b:
                    cur_b = b
                    pos = offs.get(int(b), start)
                ids[i:j] = np.arange(pos, pos + (j - i))
                pos += j - i
                i = j
            out = batch.drop(columns=[_BUCKET])
            out[id_col] = ids
            yield out[out_cols]

    ranged = bucketed.repartitionByRange(
        max(1, n_part), _BUCKET
    ).sortWithinPartitions(_BUCKET, *cols)
    return ranged.mapInPandas(number, schema=out_schema)
