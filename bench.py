#!/usr/bin/env python
"""Benchmark harness: runs the driver query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as plan-build + execution to completion
(count-materialized, results not shipped to the driver beyond the
aggregate). A warmup pass on sf's smallest table absorbs JVM/codegen
startup so numbers reflect steady-state engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

from evm_indexer_spark import driver_queries
from evm_indexer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("evm-indexer-spark-bench")
    try:
        sf_label = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
        try:
            sf = float(sf_label)
        except ValueError:
            sf = sf_label

        # warmup: touch the IO + codegen paths once
        spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

        timings: dict[str, float] = {}
        total = 0.0
        for name, fn in sorted(driver_queries.queries().items()):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # force full execution without driver-side result transfer
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 4)
            total += dt
            print(f"  {name}: {dt:.3f}s", file=sys.stderr)

        print(
            json.dumps(
                {
                    "metric": "catalog_total_runtime",
                    "value": round(total, 4),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
