"""Partition pruning over the bucket store: a guardrail-bounded range
query must touch only its bucket's partitions."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.schemas import BLOCK_BUCKET_SIZE
from evm_indexer_spark.sources.rawgen import raw_block_doc
from evm_indexer_spark.sources.normalize import RAW_BLOCK_SCHEMA
from evm_indexer_spark.streaming.ingest import process_raw_batch
from evm_indexer_spark.streaming.store import BlockStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pruned")
    s = BlockStore(spark, str(root))
    docs = [
        raw_block_doc(n)
        for start in (0, BLOCK_BUCKET_SIZE, 2 * BLOCK_BUCKET_SIZE)
        for n in range(start, start + 30)
    ]
    process_raw_batch(s, spark.createDataFrame(docs, RAW_BLOCK_SCHEMA))
    return s


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_number_range_prunes_block_partitions(store):
    hq = store.historical_queries()
    frm = BLOCK_BUCKET_SIZE + 5
    df = hq.get_blocks_by_number_range(frm, frm + 10)
    plan = _plan(df)
    # the scan must carry a bucket partition filter, not just a row filter
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan
    assert df.count() == 11
    assert df.select(F.min("number")).first()[0] == frm


def test_unwired_queries_do_not_prune(store):
    from evm_indexer_spark.operators.historical import HistoricalQueries

    hq = HistoricalQueries(store.blocks(), store.transactions(), store.events())
    plan = _plan(hq.get_blocks_by_number_range(5, 15))
    seg = plan.split("PartitionFilters", 1)
    assert len(seg) == 1 or "bucket#" not in seg[1][:120]


def test_fact_side_prunes_too(store):
    hq = store.historical_queries()
    frm = 2 * BLOCK_BUCKET_SIZE
    df = hq.get_events_from_contract_by_block_number_range(
        "0x" + "0" * 40, frm, frm + 20
    )
    plan = _plan(df)
    # both the blocks slice and the events fact scan carry bucket filters
    assert plan.count("PartitionFilters") >= 2
    first, second = plan.split("PartitionFilters")[1:3]
    assert "bucket" in first[:200] and "bucket" in second[:200]
    assert df.count() > 0


def test_pruned_results_match_unpruned(store):
    pruned = store.historical_queries()
    plain = __import__(
        "evm_indexer_spark.operators.historical", fromlist=["HistoricalQueries"]
    ).HistoricalQueries(store.blocks(), store.transactions(), store.events())
    frm = BLOCK_BUCKET_SIZE - 5  # straddles two buckets
    a = sorted(r["number"] for r in pruned.get_blocks_by_number_range(frm, frm + 20).collect())
    b = sorted(r["number"] for r in plain.get_blocks_by_number_range(frm, frm + 20).collect())
    # only 100000..100015 exist in-range (bucket 0 ends at number 29)
    assert a == b and len(a) == 16
