"""Global row numbering: correctness vs a single-partition window, plan
shape, and edge cases."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from evm_indexer_spark.operators import order, stats


def test_matches_single_partition_window(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 4999).alias("k"), F.col("id").alias("payload")
    )
    # k is a permutation of 0..4998 plus one dup of k=0 (id 0 and... no:
    # 37 is coprime to 4999 so k is unique per id for id < 4999; drop the rest
    df = df.filter(F.col("id") < 4999)
    got = order.global_row_number(df, ["k"], num_partitions=8).toPandas()
    w = Window.orderBy("k")
    exp = df.withColumn("row_id", F.row_number().over(w).cast("long")).toPandas()
    got = got.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert got[["k", "payload", "row_id"]].equals(exp[["k", "payload", "row_id"]])


def test_start_offset_and_contiguity(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    rows = order.global_row_number(df, ["k"], num_partitions=4, start=10).collect()
    ids = sorted(r["row_id"] for r in rows)
    assert ids == list(range(10, 110))
    by_k = {r["k"]: r["row_id"] for r in rows}
    assert by_k[0] == 10 and by_k[99] == 109


def test_small_tier_matches_two_phase(spark):
    """n_rows_hint below the tier routes to the one-task window plan;
    ids must be identical to the scalable formulation's."""
    df = spark.range(0, 3000).select(
        (F.col("id") * 7 % 3001).alias("k"), F.col("id").alias("payload")
    )
    small = order.global_row_number(
        df, ["k"], n_rows_hint=3000, small_below=10_000
    )
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in plan  # the window tier really ran
    big = order.global_row_number(
        df, ["k"], num_partitions=8, n_rows_hint=3000, small_below=100,
        key_range_hint=(0, 3000),
    )
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    # the DATA never passes a single-partition exchange: with the
    # footer range hint the one SinglePartition in the two-phase plan
    # is the bucket-count prefix window over at most 4*n_part+3
    # aggregate rows (a plan constant)
    assert big_plan.count("SinglePartition") == 1
    assert "__gcnt" in big_plan
    assert "hashpartitioning(__gbucket" in big_plan
    sp = small.toPandas().sort_values("k").reset_index(drop=True)
    bp = big.toPandas().sort_values("k").reset_index(drop=True)
    assert sp[["k", "payload", "row_id"]].equals(bp[["k", "payload", "row_id"]])
    # names and types must agree; the driver's schema check compares
    # pandas dtypes, which both plans produce identically
    assert [(f.name, f.dataType) for f in small.schema.fields] == [
        (f.name, f.dataType) for f in big.schema.fields
    ]


def test_empty_input(spark):
    df = spark.range(0, 0).select(F.col("id").alias("k"))
    assert order.global_row_number(df, ["k"]).count() == 0


def test_no_single_partition_exchange_of_data(spark):
    """The whole point: the table itself never passes a
    single-partition exchange. The two-phase plan clusters DATA by a
    hash exchange on the bucket id and numbers it with a per-bucket
    row_number window; the only SinglePartition exchange carries the
    per-bucket COUNT rows (≤ 4·n_part + 3, a plan constant) into the
    prefix-offset window."""
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = order.global_row_number(
        df, ["k"], num_partitions=8, key_range_hint=(0, 999)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SinglePartition") == 1
    assert "__gcnt" in plan  # ...and it is the bounded counts frame
    assert "hashpartitioning(__gbucket" in plan
    assert "row_number" in plan
    # hintless numeric path: the in-plan scalar min/max aggregate adds
    # a global-agg exchange (referenced from both the counts side and
    # the data side) — still only bounded frames, never table rows
    nohint = order.global_row_number(df, ["k"], num_partitions=8)
    nplan = nohint._jdf.queryExecution().executedPlan().toString()
    assert nplan.count("SinglePartition") == 3
    assert sorted(r["row_id"] for r in nohint.collect()) == list(
        range(1, 1001)
    )


def test_percentile_sketch_check_all_ok(spark):
    df = spark.range(0, 20_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    rows = stats.percentile_sketch_check(df, "k", "v").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]


def test_percentile_sketch_check_rel_tol_deprecated_not_typeerror(spark):
    # round-13 ADVICE: the rank-band rewrite dropped the public
    # rel_tol kwarg, breaking pre-round-13 callers with a TypeError;
    # it is accepted (and ignored — value tolerance is not the G-K
    # contract) so old call sites keep working
    df = spark.range(0, 1000).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("v")
    )
    rows = stats.percentile_sketch_check(df, "k", "v", rel_tol=0.05).collect()
    assert rows and all(r["p50_ok"] for r in rows)


def test_percentile_sketch_check_bounded_memory_plan(spark):
    # round-13 ADVICE: the rank-band check materialized
    # sort_array(collect_list(value)) per group — an OOM surface on
    # large groups. The band is now read off G-K probe points (one
    # extra fixed-size sketch buffer); no per-group value buffering
    # beyond the exact `percentile` columns themselves.
    df = spark.range(0, 100).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("v")
    )
    out = stats.percentile_sketch_check(df, "k", "v")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    assert "sort_array" not in plan


def test_percentile_sketch_check_heavy_tail_and_ties_still_ok(spark):
    # the adversarial shapes that broke the value-tolerance form:
    # tie-dense (all-equal) groups and a heavy tail where neighboring
    # order statistics differ by 12 orders of magnitude — the G-K
    # monotonic probe band is unconditional, so ok must stay TRUE
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 2 == 0, "ties").otherwise("tail").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(7.0))
        .otherwise(
            F.when(F.col("id") < 9_990, F.lit(1e-6)).otherwise(F.lit(1e12))
        )
        .alias("v"),
    )
    rows = stats.percentile_sketch_check(df, "k", "v").collect()
    assert len(rows) == 2
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]


def test_string_keys_take_generic_boundary_path(spark):
    """Non-numeric leading keys use the sampled lexicographic-boundary
    path (width_bucket only handles numerics) — same contract."""
    df = spark.range(0, 3000).select(
        F.format_string("k%07d", (F.col("id") * 2654435761) % 3000).alias("k")
    ).distinct()
    n = df.count()
    got = order.global_row_number(df, ["k"], num_partitions=8).toPandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert list(got["row_id"]) == list(range(1, n + 1))


def test_multi_column_mixed_type_keys(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        F.col("id").alias("sub"),
    )
    got = order.global_row_number(df, ["g", "sub"], num_partitions=8).toPandas()
    got = got.sort_values(["g", "sub"]).reset_index(drop=True)
    assert list(got["row_id"]) == list(range(1, 2001))


def test_hypothesis_random_long_keys(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=200, unique=True))
    def run(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        rows = order.global_row_number(df, ["k"], num_partitions=4).collect()
        by_k = {r["k"]: r["row_id"] for r in rows}
        for rank, k in enumerate(sorted(keys), start=1):
            assert by_k[k] == rank

    run()


def test_null_keys_numeric_fast_path(spark):
    """NULL leading keys must land in bucket 0 (nulls-first asc order),
    not crash the offset table (width_bucket returns NULL on NULL)."""
    df = spark.range(0, 200).select(
        F.when(F.col("id") < 5, None).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    got = order.global_row_number(df, ["k"], num_partitions=8)
    rows = got.collect()
    assert sorted(r["row_id"] for r in rows) == list(range(1, 201))
    # nulls-first: the 5 null keys take ids 1..5 (any order among
    # themselves — null ties are arbitrary), non-nulls follow key order
    null_ids = sorted(r["row_id"] for r in rows if r["k"] is None)
    assert null_ids == [1, 2, 3, 4, 5]
    nonnull = sorted(
        (r["k"], r["row_id"]) for r in rows if r["k"] is not None
    )
    ids = [rid for _, rid in nonnull]
    assert ids == list(range(6, 201))


def test_null_keys_generic_string_path(spark):
    df = spark.range(0, 120).select(
        F.when(F.col("id") < 3, None)
        .otherwise(F.format_string("k%05d", F.col("id")))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    got = order.global_row_number(df, ["k"], num_partitions=6)
    rows = got.collect()
    assert sorted(r["row_id"] for r in rows) == list(range(1, 121))
    null_ids = sorted(r["row_id"] for r in rows if r["k"] is None)
    assert null_ids == [1, 2, 3]
    nonnull = sorted((r["k"], r["row_id"]) for r in rows if r["k"] is not None)
    assert [rid for _, rid in nonnull] == list(range(4, 121))


def test_percentile_sketch_check_detects_lying_sketch(spark):
    """Round-15 ADVICE (medium): the probe band read lo/hi off the SAME
    approx_percentile call — monotone in p by construction — so a sketch
    returning wrong VALUES still passed. The default exact_band mode now
    rank-checks the sketch value against the data itself: a sketch that
    always answers the group min must FAIL at p50/p90/p99."""
    df = spark.range(0, 10_000).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("v")
    )
    lying = spark.range(1).select(
        F.lit("k").alias("k"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)).alias("__a"),
    )
    rows = stats.percentile_sketch_check(
        df, "k", "v", _sketch_override=lying
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert not r["p50_ok"] and not r["p90_ok"] and not r["p99_ok"]
    # and the exact percentile columns are untouched by the lie
    assert r["p50"] == 4999.5


def test_percentile_sketch_check_small_groups_no_false_failure(spark):
    """The rank window carries ±1 rank of slack for ceil-vs-floor
    target rounding: tiny groups (where interpolated exact percentiles
    sit BETWEEN the order statistics a sketch can return) must not
    false-fail."""
    rows = [("a", float(i)) for i in range(10)] + [("b", 1.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = stats.percentile_sketch_check(df, "k", "v").collect()
    assert len(out) == 2
    for r in out:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]


def test_percentile_sketch_check_production_sketch_only_mode(spark):
    """exact_band=False keeps the single-pass sketch-probe form (the
    no-second-data-pass production mode): same schema, ok all TRUE on
    honest data, and NO join in the plan."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 2).cast("string").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    out = stats.percentile_sketch_check(df, "k", "v", exact_band=False)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    rows = out.collect()
    assert len(rows) == 2
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]
