"""Interleaved per-entry noop-sink timings — the A/B instrument.

Usage::

    python tools/ab_entries.py q83 q69 [--rounds 5] [--sf /root/testdata/sf0.1]

Runs the named catalog entries ROUND-ROBIN (one full cycle per round,
so ambient drift hits every entry equally), timing plan-build +
noop-write execution exactly like bench.py's timed region, and prints
per-entry all-runs + median. First cycle is labeled warmup and excluded
from the median (codegen/Arrow-pool startup).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    rounds = 5
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from evm_indexer_spark import driver_queries
    from evm_indexer_spark.session import get_spark

    qs = driver_queries.queries()
    full = {n.split("_", 1)[0]: n for n in qs}
    picked = [full.get(n, n) for n in names]
    for n in picked:
        if n not in qs:
            raise SystemExit(f"unknown entry {n}")

    spark = get_spark(
        "ab-entries", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    try:
        j0 = None
        try:
            with open("/proc/stat") as f:
                j0 = [int(x) for x in f.readline().split()[1:]]
        except OSError:
            pass
        spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
        times: dict[str, list[float]] = {n: [] for n in picked}
        for r in range(rounds + 1):  # +1 warmup cycle
            for n in picked:
                spark.sparkContext.setJobDescription(f"ab:{n}:r{r}")
                t0 = time.perf_counter()
                df = qs[n](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if r > 0:
                    times[n].append(dt)
                spark.catalog.clearCache()
        steal = None
        try:
            with open("/proc/stat") as f:
                j1 = [int(x) for x in f.readline().split()[1:]]
            d = [y - x for x, y in zip(j0, j1)]
            dem = sum(d) - d[3] - d[4]
            steal = round(100.0 * d[7] / dem, 2) if dem >= 500 else None
        except (OSError, TypeError):
            pass
        print(f"# sf={SF_DIR} rounds={rounds} steal={steal}%")
        for n in picked:
            xs = times[n]
            print(
                f"{n}: median={statistics.median(xs):.3f}s "
                f"runs={[round(x, 3) for x in xs]}"
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
