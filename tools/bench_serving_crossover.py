#!/usr/bin/env python
"""Fold two ``bench.py --serving`` runs (20k and 200k vectors) into one
exact-vs-PQ crossover artifact (round-13 verdict #6: BENCH_serving
documented topk_pq ~2x the exact path at 20k and CLAIMED ADC pays off
past the pruned-exact crossover — this commits the crossover itself).

Usage:
    python tools/bench_serving_crossover.py > BENCH_serving_r<N>.json

Runs serially (each run builds + queries its own index); respect the
bench quiet-window protocol before invoking.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
POINTS = [
    ("/root/repo/testdata_sf1", "20k"),
    ("/root/repo/testdata_sf10", "200k"),
    # round 15: the LLM-pipeline dim regime (200k x 256-dim, generated
    # by tools/gen_dim256_fixture.py) — 8-byte PQ codes vs 1 KiB
    # vectors is where ADC's bandwidth trade actually plays
    ("/root/repo/testdata_dim256", "200k_d256"),
]


def main() -> None:
    points = []
    for sf_dir, label in POINTS:
        if not os.path.isdir(sf_dir):
            print(f"skipping {label}: {sf_dir} absent", file=sys.stderr)
            continue
        env = dict(os.environ, SPARK_GRAFT_SERVING_SF_DIR=sf_dir)
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "..", "bench.py"),
             "--serving"],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if p.returncode != 0:
            raise SystemExit(
                f"serving bench failed at {label}:\n{p.stderr[-2000:]}"
            )
        line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
        obj = json.loads(line)
        obj["label"] = label
        points.append(obj)
        print(f"{label}: exact p50 {obj['topk_p50_sec']}s, "
              f"pq p50 {obj['topk_pq_p50_sec']}s", file=sys.stderr)
    crossover = None
    if len(points) >= 2:
        crossover = {
            "exact_p50_by_size": {
                p["label"]: p["topk_p50_sec"] for p in points
            },
            "pq_p50_by_size": {
                p["label"]: p["topk_pq_p50_sec"] for p in points
            },
            "pq_wins_by_size": {
                p["label"]: p["topk_pq_p50_sec"] < p["topk_p50_sec"]
                for p in points
            },
        }
        for p in points:
            if p["label"] == "200k":
                crossover["pq_wins_at_200k"] = (
                    p["topk_pq_p50_sec"] < p["topk_p50_sec"]
                )
    print(json.dumps(
        {"metric": "ann_serving_crossover", "points": points,
         "crossover": crossover},
        indent=1,
    ))


if __name__ == "__main__":
    main()
