"""Physical-plan assertions for catalog queries: the properties that
matter at 100 TB, pinned so refactors can't silently regress them.

- filters reach the parquet scan (PushedFilters) — a scan that filters
  after reading is a full-table read at scale;
- narrow projections prune the read schema;
- dimension-side joins broadcast (no fact-table shuffle);
- top-k compiles to TakeOrderedAndProject (never global sort);
- aggregate-only queries answer from parquet footers when possible.
"""

from __future__ import annotations

import pytest

from evm_indexer_spark import driver_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = driver_queries.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_scan_pushes_filters_and_prunes_columns(spark):
    plan = _plan(spark, "q02_range_scans")
    assert "PushedFilters: [" in plan
    # the event_id range must reach the reader, not sit in a Filter above
    assert "GreaterThanOrEqual(event_id,1000" in plan, plan
    # projection pruning: the props JSON blob is never read
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "props" not in read, read


def test_point_lookup_pushes_equality(spark):
    plan = _plan(spark, "q03_point_lookups")
    assert "EqualTo(o_orderkey,32)" in plan
    assert "EqualTo(l_orderkey,7)" in plan


def test_dim_join_broadcasts_small_side(spark):
    plan = _plan(spark, "q09_broadcast_join_number_range")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "q17_global_topk_join")
    assert "TakeOrderedAndProject" in plan


def test_minmaxcount_reads_one_column(spark):
    """min/max/count over orders must scan exactly the key column (the
    V1 parquet path has no footer-aggregate pushdown; column pruning is
    the property that holds — the scan reads one long per row)."""
    plan = _plan(spark, "q14_minmaxcount")
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "struct<o_orderkey:bigint>" in read, read


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "q12_semi_join")
    assert "LeftSemi" in plan


def test_no_cartesian_anywhere_in_catalog(spark):
    """Only the deliberate scalar-only cross joins (1-row sides) may
    appear; a BroadcastNestedLoopJoin over unbounded sides would be a
    scale-killer."""
    allowed_scalar = {"q03_point_lookups", "q11_scalar_counts", "q24_depth_gate"}
    for name, fn in driver_queries.queries().items():
        if name in allowed_scalar:
            continue
        try:
            plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception:  # pragma: no cover - non-plan failures caught elsewhere
            raise
        assert "CartesianProduct" not in plan, name
