"""Global ordering utilities: dense row numbers over a total order.

``ROW_NUMBER() OVER (ORDER BY ...)`` with an empty PARTITION BY is the
classic Spark scale trap: Catalyst plans a single-partition Exchange and
one task sorts the entire table. This module provides the scalable
two-phase formulation:

1. ``repartitionByRange`` on the sort key (sampled range boundaries →
   each partition holds a contiguous key range) + ``sortWithinPartitions``;
2. one cheap pass counts rows per partition; the cumulative counts give
   each partition's global offset (a handful of numbers, driver-side);
3. an Arrow-batched ``mapInPandas`` walks each sorted partition once,
   adding offset + local position — no second shuffle, no global sort.

Total cost: one range shuffle + two scans of the shuffled data. The
result is identical to the single-partition window whenever the sort
key is a total order (unique); ties would make both formulations
nondeterministic, so require uniqueness.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Assign consecutive global row ids (``start``, ``start``+1, ...)
    following the total order of *order_by*. The caller guarantees the
    key is unique — duplicates make any global numbering arbitrary.

    Output: input columns + ``id_col`` (bigint)."""
    import pandas as pd

    cols = list(order_by)
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, *cols).sortWithinPartitions(*cols)
    ranged = ranged.persist()

    # pass 1: rows per physical partition, in partition order
    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets = {}
    acc = start
    for pid in range(max(sizes) + 1 if sizes else 0):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)

    from pyspark.sql.types import LongType, StructField, StructType

    # list concat, not .add() — StructType.add mutates shared schemas
    out_schema = StructType(list(df.schema.fields) + [StructField(id_col, LongType())])
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    def number(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = b_offsets.value.get(pid, start)
        for batch in iterator:
            n = len(batch)
            batch = batch.copy()
            batch[id_col] = range(pos, pos + n)
            pos += n
            yield batch

    out = ranged.mapInPandas(number, schema=out_schema)
    # Note: `ranged` stays persisted while `out` is consumed; callers
    # running many actions over the result should persist `out` itself.
    return out
