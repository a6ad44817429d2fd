"""Deterministic 200k x dim-256 embeddings fixture for the ANN-serving
crossover bench (round-15 directive #5).

The committed crossover points (20k and 200k vectors at dim 64) showed
exact search winning at both sizes — but the LLM-pipeline shape is
256-1024-dim embeddings, where PQ's 8-byte codes against 1 KiB vectors
are the actual memory/bandwidth trade. This fixture adds that regime:
200k vectors, 256 dims, 64 well-separated Gaussian clusters (so IVF
lists are meaningful), fixed seed — byte-reproducible regeneration.

Usage: python tools/gen_dim256_fixture.py
       → /root/repo/testdata_dim256/embeddings.parquet
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_VECTORS = 200_000
DIM = 256
N_CLUSTERS = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_dim256")
    ap.add_argument("--n", type=int, default=N_VECTORS)
    ap.add_argument("--dim", type=int, default=DIM)
    args = ap.parse_args()
    rng = np.random.default_rng(256)
    centers = rng.normal(0, 1.0, (N_CLUSTERS, args.dim))
    labels = rng.integers(0, N_CLUSTERS, args.n)
    vecs = centers[labels] + rng.normal(0, 0.15, (args.n, args.dim))
    vecs = vecs.astype(np.float32)
    os.makedirs(args.out, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(args.n, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs), pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(args.out, "embeddings.parquet"))
    print(
        f"dim-{args.dim} fixture: {args.n} vectors -> {args.out} "
        f"({os.path.getsize(os.path.join(args.out, 'embeddings.parquet')) >> 20} MiB)"
    )


if __name__ == "__main__":
    main()
