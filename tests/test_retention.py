"""Cache-retention regression: repeated operator calls must not pin
executor storage without bound (the round-3 leak: DataFrame.persist
registers in the CacheManager and is held until an explicit unpersist —
the context cleaner never reclaims it — and abandoned per-round
localCheckpoints accumulated for the session lifetime)."""

from __future__ import annotations

from pyspark.sql import functions as F

from evm_indexer_spark.operators import dedup, graph, order


def _cached_plans(spark) -> int:
    """Entries pinned in the SQL CacheManager (persist without
    unpersist). localCheckpoint blocks do NOT register here."""
    return (
        spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    )


def _persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog "),
            (F.col("id") % 7).cast("string"),
            F.lit(" payload words repeated here for shingling"),
        ).alias("text"),
    )


def test_repeated_calls_leave_cache_manager_empty(spark):
    base = _cached_plans(spark)
    for _ in range(2):
        df = spark.range(0, 2000).select(F.col("id").alias("k"))
        order.global_row_number(df, ["k"], num_partitions=4).count()
    for _ in range(2):
        graph.dedup_clusters(_docs(spark), "doc_id", "text", 0.5).count()
    dedup.jaccard_prefix_join(
        _docs(spark), "doc_id", "text", strategy="prefix"
    ).count()
    dedup.simhash_near_duplicates(_docs(spark), "doc_id", "text").count()
    dedup.minhash_near_duplicates(_docs(spark), "doc_id", "text").count()
    assert _cached_plans(spark) == base


def test_checkpoint_storage_bounded_and_releasable(spark):
    """Each dedup_clusters call may leave exactly its final label table
    (intermediate rounds are released in-loop); release_cached frees
    that too, returning storage to baseline — deterministically, with
    no reliance on GC or the context cleaner."""
    base = _persistent_rdds(spark)

    r1 = graph.dedup_clusters(_docs(spark), "doc_id", "text", 0.5)
    assert r1.count() == 60
    r2 = graph.dedup_clusters(_docs(spark), "doc_id", "text", 0.5)
    assert r2.count() == 60
    # bounded: at most one lingering checkpoint (the final labels) per
    # call, never the per-round intermediates
    assert _persistent_rdds(spark) <= base + 2

    graph.release_cached(r1)
    graph.release_cached(r2)
    assert _persistent_rdds(spark) == base


def test_global_row_number_pins_nothing(spark):
    base = _persistent_rdds(spark)
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    out = order.global_row_number(df, ["k"], num_partitions=8)
    assert out.count() == 5000
    # lazy result, recomputable, zero persisted/checkpointed state
    assert _persistent_rdds(spark) == base
