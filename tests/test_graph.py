"""Connected-components and dedup clustering semantics."""

from __future__ import annotations

import pytest

from evm_indexer_spark.operators import graph


def _cc(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long") if nodes else None
    out = graph.connected_components(e, nodes=n, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 iteration) + pair 10-11
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    n = 40
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_isolated_nodes_label_themselves(spark):
    got = _cc(spark, [(1, 2)], nodes=[1, 2, 7, 9])
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1, 5: 5}


def test_max_iter_guard(spark):
    # driver_threshold=0 forces the distributed loop, whose round bound
    # is what the guard protects (the driver fast path never iterates)
    with pytest.raises(RuntimeError, match="converge"):
        _cc(spark, [(i, i + 1) for i in range(8)], max_iter=1,
            driver_threshold=0)


def test_dedup_clusters_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, base),
        (1, base + " extra"),               # near-dup of 0
        (2, base.replace("quick", "slow")),  # near-dup of 0
        (3, "completely different text about spark shuffles and joins"),
        (4, "another unrelated document mentioning ducks on a pond"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["cluster_id"] for r in
           graph.dedup_clusters(df, "doc_id", "text", threshold=0.3).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == 3 and out[4] == 4
    # canonical-doc policy: keep id == cluster_id
    keep = {i for i, c in out.items() if i == c}
    assert keep == {0, 3, 4}


def test_dedup_clusters_no_broadcast_hint_on_endpoints(spark):
    """The pair-endpoint set is unbounded (at web-scale dup rates it is a
    large fraction of the corpus), so the singleton anti-join must carry
    no broadcast hint — AQE may still *choose* broadcast at runtime when
    the set is genuinely small, which is exactly the desired split of
    responsibility."""
    docs = [(i, f"doc number {i} with shared filler words") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = graph.dedup_clusters(
        df, "doc_id", "text", threshold=0.3, strategy="distributed"
    )
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed


def test_dedup_clusters_onetask_matches_distributed(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base + f" tail {i % 3}") for i in range(20)]
    docs += [(100 + i, f"unique text island number {i} " * 2) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    one = {
        (r["doc_id"], r["cluster_id"])
        for r in graph.dedup_clusters(
            df, "doc_id", "text", threshold=0.4, strategy="onetask"
        ).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in graph.dedup_clusters(
            df, "doc_id", "text", threshold=0.4, strategy="distributed"
        ).collect()
    }
    assert one == dist
    assert len(one) == 25


def test_driver_and_distributed_paths_agree(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)]
    fast = _cc(spark, edges)  # under threshold -> driver union-find
    dist = _cc(spark, edges, driver_threshold=0)  # forced distributed
    assert fast == dist == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
    }
