"""uint256 numeric helpers: exactness, documented overflow bound, and
ANSI behavior on the fixture's >2^63 magnitude values."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from evm_indexer_spark.functions.numeric import as_decimal, calc_gas_cost, wei_to_eth


def test_exact_decimal_beyond_int64(spark):
    big = str(2**90)  # > int64, < 38 digits
    df = spark.createDataFrame([(big,)], "v string")
    got = df.select(as_decimal("v").alias("d")).collect()[0]["d"]
    assert got == Decimal(big)


def test_overflow_beyond_38_digits_is_null(spark):
    over = "9" * 39  # documented bound: decimal(38,0) cannot hold it
    df = spark.createDataFrame([(over,)], "v string")
    assert df.select(as_decimal("v").alias("d")).collect()[0]["d"] is None


def test_wei_to_eth_exact(spark):
    df = spark.createDataFrame(
        [("1000000000000000000",), ("1500000000000000000",), ("1",)], "v string"
    )
    got = [r["e"] for r in df.select(wei_to_eth("v").alias("e")).collect()]
    assert got[0] == Decimal("1")
    assert got[1] == Decimal("1.5")
    assert got[2] == Decimal("1E-18")


def test_calc_gas_cost_matches_fixture_cost(spark, evm):
    """The fixture's cost column is gas*gasprice+value computed in exact
    python ints — the decimal expression must reproduce gas*gasprice for
    every row whose quantities fit decimal(38,0) (uint256-stress rows
    beyond 38 digits yield NULL by the documented bound)."""
    tx = evm["transactions"].filter(F.length("cost") <= 38)
    assert tx.count() > 0
    mismatched = tx.select(
        "cost",
        "value",
        calc_gas_cost("gasprice", F.col("gas").cast("string")).alias("gc"),
    ).filter(as_decimal("cost") != (F.col("gc") + as_decimal("value")))
    assert mismatched.count() == 0
    # stress rows beyond the bound: NULL, never a throw
    over = evm["transactions"].filter(F.length("value") > 38)
    assert over.count() > 0
    assert over.select(as_decimal("value").alias("d")).filter(
        F.col("d").isNotNull()
    ).count() == 0
