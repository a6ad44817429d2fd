#!/usr/bin/env python
"""Aggregate a bench window's runs into ONE self-diagnosing artifact.

The committed ``BENCH_local_sf01_r<N>.json`` used to be the median
run's SINGLE numbers, so a per-query delta (r12's q77 +0.54s) could not
be triaged from the repo: was it the query or that one run's ambient
noise? This tool folds the window's full per-run artifacts
(``bench_out.json`` copies made by ``tools/bench_window.sh``) into one
object carrying, for every query, the MEDIAN across runs of its warm
and DuckDB-oracle seconds — plus each run's start loadavg, totals and
ratio, so a contaminated run is visible in the committed JSON itself.

Usage:
    python tools/bench_median.py [run1.json run2.json ...]

Defaults to /tmp/bench_full_run{1,2,3}.json. Prints the aggregate JSON
to stdout (commit it as BENCH_local_sf01_r<N>.json).

Ratio definition: ``sum(per-query warm medians over the oracle-covered
subset) / sum(per-query duck medians)`` — per-query medians first, so
one run's localized spike on one query cannot move the headline, which
a median-of-run-totals does not give.
"""

from __future__ import annotations

import json
import statistics
import sys


def aggregate(runs: list[dict]) -> dict:
    if not runs:
        raise SystemExit("no run artifacts found")
    warm_names = sorted(
        set().union(*(r.get("queries_warm", {}) for r in runs))
    )
    duck_names = sorted(
        set().union(*(r.get("queries_duckdb", {}) for r in runs))
    )

    def med(names, key):
        out = {}
        for n in names:
            vals = [r[key][n] for r in runs if n in r.get(key, {})]
            if vals:
                out[n] = round(statistics.median(vals), 4)
        return out

    warm_med = med(warm_names, "queries_warm")
    duck_med = med(duck_names, "queries_duckdb")
    cold_med = med(sorted(set().union(*(r.get("queries", {}) for r in runs))),
                   "queries")
    warm_oracle_subset = sum(
        v for k, v in warm_med.items() if k in duck_med
    )
    duck_total = sum(duck_med.values())
    per_run = [
        {
            "warm_total_sec": r.get("warm_total_sec"),
            "duckdb_oracle_total_sec": r.get("duckdb_oracle_total_sec"),
            "warm_vs_duckdb_ratio": r.get("warm_vs_duckdb_ratio"),
            "loadavg_start": r.get("loadavg_start"),
            "loadavg_end": r.get("loadavg"),
            "cpu_steal_pct": r.get("cpu_steal_pct"),
            "contaminated": r.get("contaminated"),
            "ingest_blocks_per_sec": r.get("ingest_blocks_per_sec"),
        }
        for r in runs
    ]
    # symmetric cross-run outlier flags (round-13 ADVICE: the window's
    # duck-only retry band filtered one side of the measurement; here
    # BOTH engine totals are checked against the window median, so a
    # run whose contention hit mainly the Spark half is flagged too).
    # Flag-only: the committer re-runs a flagged slot, the fold itself
    # stays a pure function of its inputs.
    for key, flag in (
        ("warm_total_sec", "warm_outlier"),
        ("duckdb_oracle_total_sec", "duck_outlier"),
    ):
        vals = [r[key] for r in per_run if r[key] is not None]
        if len(vals) >= 2:
            m = statistics.median(vals)
            for r in per_run:
                if r[key] is not None and m and abs(r[key] - m) / m > 0.20:
                    r[flag] = True
    return {
        "metric": "catalog_window_medians",
        "unit": "sec",
        "sf": runs[0].get("sf"),
        "n_runs": len(runs),
        "queries_warm_median": warm_med,
        "queries_cold_median": cold_med,
        "queries_duckdb_median": duck_med,
        "warm_oracle_subset_median_sec": round(warm_oracle_subset, 4),
        "duckdb_oracle_total_median_sec": round(duck_total, 4),
        "warm_vs_duckdb_ratio_of_medians": round(
            warm_oracle_subset / duck_total, 2
        )
        if duck_total
        else None,
        "per_run": per_run,
        "ratio_median_of_runs": round(
            statistics.median(
                [
                    r["warm_vs_duckdb_ratio"]
                    for r in per_run
                    if r["warm_vs_duckdb_ratio"] is not None
                ]
            ),
            2,
        )
        if any(r["warm_vs_duckdb_ratio"] is not None for r in per_run)
        else None,
        "ingest_blocks_per_sec_median": round(
            statistics.median(
                [
                    r["ingest_blocks_per_sec"]
                    for r in per_run
                    if r["ingest_blocks_per_sec"] is not None
                ]
            ),
            1,
        )
        if any(r["ingest_blocks_per_sec"] is not None for r in per_run)
        else None,
    }


def main() -> None:
    paths = sys.argv[1:] or [f"/tmp/bench_full_run{i}.json" for i in (1, 2, 3)]
    runs, payloads = [], []
    for p in paths:
        # a missing or unparseable artifact is a HARD error (round-13
        # ADVICE medium): silently skipping let a crashed slot shrink
        # the window — or, before bench_window.sh deleted stale copies,
        # fold a previous run's artifact in as a duplicate
        try:
            with open(p) as fh:
                text = fh.read().strip()
        except OSError as e:
            raise SystemExit(f"run artifact {p} missing: {e}")
        try:
            runs.append(json.loads(text))
        except json.JSONDecodeError as e:
            raise SystemExit(f"run artifact {p} unparseable: {e}")
        if text in payloads:
            raise SystemExit(
                f"run artifact {p} is byte-identical to an earlier run — "
                "a stale bench_out.json was copied for a crashed slot; "
                "re-run the window"
            )
        payloads.append(text)
    print(json.dumps(aggregate(runs), indent=1))


if __name__ == "__main__":
    main()
