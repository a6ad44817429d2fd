#!/usr/bin/env python
"""Quantify the merge-on-read commit-mode trade on the atomic store.

Steady ingest = many small commits into the same (head) bucket. COW
rewrites the whole bucket per commit, so bytes written per commit grow
with the bucket fill; delta mode writes O(batch) per commit and pays a
bounded merge at read (folded away by compaction). This tool measures
both on the SAME workload: *n_commits* sequential micro-batches of
*batch_blocks* blocks each, all landing in one bucket (the steady-state
head-bucket shape), then a full-table read, a compaction, and a
post-compaction read.

Reported per mode: total commit wall-clock, total bytes written under
objects/ (the write-amplification number), read time with live delta
chains, and read time after compact(). Writes MOR_BENCH.json.

Usage: python tools/mor_bench.py [--commits 20] [--batch 50]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run_mode(spark, mode: str, n_commits: int, batch_blocks: int) -> dict:
    from evm_indexer_spark.sources.normalize import RAW_BLOCK_SCHEMA
    from evm_indexer_spark.sources.rawgen import raw_block_doc
    from evm_indexer_spark.streaming.ingest import process_raw_batch
    from evm_indexer_spark.streaming.txstore import AtomicBlockStore

    root = tempfile.mkdtemp(prefix=f"mor_bench_{mode}_")
    try:
        store = AtomicBlockStore(
            spark, os.path.join(root, "s"), commit_mode=mode,
            max_deltas=10**9,  # measure pure delta appends; compact below
        )
        t0 = time.time()
        for c in range(n_commits):
            docs = [
                raw_block_doc(n)
                for n in range(c * batch_blocks, (c + 1) * batch_blocks)
            ]
            process_raw_batch(
                store, spark.createDataFrame(docs, RAW_BLOCK_SCHEMA)
            )
        commit_s = time.time() - t0
        objects = os.path.join(root, "s", "objects")
        written = dir_bytes(objects)

        t0 = time.time()
        n_rows = store.blocks().count()
        read_s = time.time() - t0
        assert n_rows == n_commits * batch_blocks, n_rows

        t0 = time.time()
        store.compact()
        compact_s = time.time() - t0
        t0 = time.time()
        assert store.blocks().count() == n_rows
        read_after_s = time.time() - t0
        return {
            "commit_total_sec": round(commit_s, 2),
            "sec_per_commit": round(commit_s / n_commits, 3),
            "bytes_written": written,
            "read_sec_live": round(read_s, 2),
            "compact_sec": round(compact_s, 2),
            "read_sec_after_compact": round(read_after_s, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=20)
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--out", default="/root/repo/MOR_BENCH.json")
    args = ap.parse_args()

    from evm_indexer_spark.session import get_spark

    spark = get_spark("mor-bench")
    out = {
        "n_commits": args.commits,
        "batch_blocks": args.batch,
        "modes": {},
    }
    for mode in ("cow", "delta"):
        out["modes"][mode] = run_mode(spark, mode, args.commits, args.batch)
        print(mode, out["modes"][mode], file=sys.stderr)
    cow_b = out["modes"]["cow"]["bytes_written"]
    delta_b = out["modes"]["delta"]["bytes_written"]
    out["write_amplification_ratio"] = round(cow_b / max(delta_b, 1), 2)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
