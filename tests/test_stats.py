"""Rollup / percentile / cardinality operator semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import stats


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        ("2024-01-01", "a", 1.0), ("2024-01-01", "a", 2.0),
        ("2024-01-01", "b", 4.0), ("2024-01-02", "a", 8.0),
    ]
    return spark.createDataFrame(rows, "day string, typ string, v double")


def test_rollup_levels_and_gid(spark, sales):
    out = stats.hierarchical_rollup(
        sales, ["day", "typ"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")],
    ).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    # leaf level: 3 (day,typ) groups; day level: 2; grand total: 1
    assert {g: len(rs) for g, rs in by_gid.items()} == {0: 3, 1: 2, 3: 1}
    total = by_gid[3][0]
    assert total["day"] is None and total["typ"] is None
    assert total["n"] == 4 and total["total"] == 15.0
    day1 = next(r for r in by_gid[1] if r["day"] == "2024-01-01")
    assert day1["n"] == 3 and day1["total"] == 7.0


def test_rollup_single_expand_one_shuffle(spark, sales):
    out = stats.hierarchical_rollup(sales, ["day", "typ"], [F.count(F.lit(1)).alias("n")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_group_percentiles_match_numpy(spark):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10_000, 999).astype(float)
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, v double"
    )
    got = stats.group_percentiles(df, "k", "v", (0.5, 0.9, 0.99)).collect()[0]
    for label, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
        exp = float(np.quantile(vals, q))  # linear interpolation, same def
        assert got[label] == pytest.approx(round(exp, 4), abs=1e-9)


def test_percentile_label_format(spark):
    df = spark.createDataFrame([("g", 1.0)], "k string, v double")
    out = stats.group_percentiles(df, "k", "v", (0.25, 0.999))
    assert out.columns == ["k", "p25", "p99_9"]


def test_cardinality_exact_and_hll(spark):
    df = spark.range(0, 20_000).select(
        (F.col("id") % 2).cast("string").alias("k"),
        (F.col("id") % 5000).alias("v"),
    )
    rows = {r["k"]: r for r in stats.cardinality(df, "k", "v").collect()}
    # even ids mod 5000 hit only the 2500 even residues (5000 is even);
    # odd ids only the odd ones
    assert rows["0"]["n_distinct"] == 2500 and rows["1"]["n_distinct"] == 2500
    for r in rows.values():
        rel = abs(r["approx_distinct"] - r["n_distinct"]) / r["n_distinct"]
        assert rel < 0.05  # rsd=0.01 -> 5 sigma headroom
