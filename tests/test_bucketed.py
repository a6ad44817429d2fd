"""Bucketed co-located joins: correct results with zero exchanges."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, evm, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    write_bucketed(
        evm["transactions"], "b_txs", "blockhash", n_buckets=8,
        sort_col="blockhash", path=str(wh / "b_txs"),
    )
    write_bucketed(
        evm["events"], "b_events", "blockhash", n_buckets=8,
        sort_col="blockhash", path=str(wh / "b_events"),
    )
    yield "b_txs", "b_events"
    spark.sql("DROP TABLE IF EXISTS b_txs")
    spark.sql("DROP TABLE IF EXISTS b_events")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the plan must rely on bucketing (at real scale
    # neither side fits the broadcast threshold — that's the point)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "blockhash").select(
            "blockhash", "origin", "from"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_matches_unbucketed(spark, evm, bucketed_tables):
    left, right = bucketed_tables
    bucketed_count = colocated_join(spark, left, right, "blockhash").count()
    plain_count = evm["transactions"].join(evm["events"], "blockhash").count()
    assert bucketed_count == plain_count


def test_aggregation_on_bucket_key_skips_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("blockhash").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" not in _plan(agg)
