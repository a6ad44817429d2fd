"""Bucketed-table helpers: co-located joins without shuffle.

Spark's ``bucketBy`` pre-hash-partitions a table on disk; two tables
bucketed on the same key with the same bucket count join with ZERO
exchanges — the physical design that replaces the reference's FK
B-trees for repeated fact-to-fact joins (transactions ⋈ events on
blockhash, or any dimension co-location) at 100 TB, where an on-the-fly
shuffle of either side would dominate the query.

Bucketed writes go through the session catalog (``saveAsTable``) —
that's where Spark records bucketing metadata; a bare parquet path
write silently drops it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist *df* as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally enables shuffle-free AND
    sort-free sort-merge joins. Pass *path* for an external table
    location (the warehouse dir is a static config and cannot be moved
    at runtime).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucketing, Catalyst plans this without any Exchange —
    verify with ``.explain``; tests assert the absence.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
