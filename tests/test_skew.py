"""Salted aggregation/join equivalence on deliberately skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key holding 90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return hot.unionByName(cold).cache()


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["count_v"], r["sum_v"], r["min_v"], r["max_v"])
        for r in skew.salted_agg(
            skewed, ["k"], {"v": "count"} | {}, salt=8
        ).join(
            skew.salted_agg(skewed, ["k"], {"v": "sum"}, salt=8), "k"
        ).join(
            skew.salted_agg(skewed, ["k"], {"v": "min"}, salt=8), "k"
        ).join(
            skew.salted_agg(skewed, ["k"], {"v": "max"}, salt=8), "k"
        ).withColumnRenamed("count_v", "count_v").collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["k"], {"v": "avg"})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"c{i}", float(i)) for i in range(50)],
        "k string, w double",
    )
    plain = sorted(
        tuple(r) for r in skewed.join(dim, "k", "inner").collect()
    )
    salted = sorted(
        tuple(r) for r in skew.salted_join(skewed, dim, "k", salt=8).collect()
    )
    assert plain == salted


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    out = skew.salted_join(skewed, dim, "k", salt=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter("k != 'hot' and w is not null").count() == 0
