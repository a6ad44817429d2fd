#!/usr/bin/env python
"""Scale the driver's sf0.1 test tables by an integer factor (default
10x -> "sf1") with FK-consistent key remapping, for scale-proof runs.

The driver generates sf{0.001,0.01,0.1} read-only; proving that plans
hold at 10x the bench scale needs an sf1 dataset we build ourselves —
derived purely from the driver's own sf0.1 parquet, with the same
schema (pyarrow roundtrip preserves physical/logical types) and the
same distributions per copy:

- dimension tables (region, nation) are shared, copied verbatim;
- every surrogate key k becomes ``copy * stride + k`` where stride =
  max(key)+1 of the source table, and every FK is remapped with its
  parent's stride, so join fan-outs are preserved exactly;
- document text gets a per-copy suffix token (and n_chars recomputed),
  which turns each source document into a 10-way near-duplicate
  cluster — deliberate stress for the dedup family at scale;
- embeddings get a tiny deterministic per-copy offset on dim 0 so ANN
  top-k has no cross-copy ties.

Usage: python tools/scale_testdata.py [--factor 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_SRC_DIR", "/root/testdata/sf0.1")

# (table, key columns owned by the table) — strides derive from these
OWNED_KEYS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": None,  # composite PK (l_orderkey, l_linenumber): no own key
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# column -> owning table whose stride remaps it
FK = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",  # standalone id space; scale its cardinality too
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def _strides() -> dict[str, int]:
    strides: dict[str, int] = {}
    for t, key in OWNED_KEYS.items():
        probe = key or ("event_id" if t == "events" else None)
        if t == "lineitem":
            continue
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"), columns=[probe])
        strides[t] = int(pc.max(tbl[probe]).as_py()) + 1
    # user_id shares the events copy stride but its own max
    ev = pq.read_table(os.path.join(SRC, "events.parquet"), columns=["user_id"])
    strides["__user"] = int(pc.max(ev["user_id"]).as_py()) + 1
    return strides


def _remap(tbl: pa.Table, copy: int, strides: dict[str, int]) -> pa.Table:
    cols = []
    for name in tbl.column_names:
        col = tbl[name]
        if name in FK:
            stride = strides["__user"] if name == "user_id" else strides[FK[name]]
            shifted = pc.add(col, pa.scalar(copy * stride, type=col.type))
            cols.append(shifted)
        else:
            cols.append(col)
    return pa.table(cols, names=tbl.column_names)


def _perturb_documents(tbl: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return tbl
    suffix = f" v{copy}"
    text = pc.binary_join_element_wise(tbl["text"], pa.scalar(suffix), "")
    n_chars = pc.add(tbl["n_chars"], pa.scalar(len(suffix), type=pa.int64()))
    out = tbl.set_column(tbl.column_names.index("text"), "text", text)
    return out.set_column(out.column_names.index("n_chars"), "n_chars", n_chars)


def _perturb_embeddings(tbl: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return tbl
    emb = tbl["embedding"].combine_chunks()
    values = emb.values.to_numpy(zero_copy_only=False).copy()
    offsets = emb.offsets.to_numpy(zero_copy_only=False)
    # nudge dim 0 of every vector, deterministic per copy
    values[offsets[:-1]] += np.float32(copy * 1e-3)
    new = pa.ListArray.from_arrays(emb.offsets, pa.array(values, type=pa.float32()))
    return tbl.set_column(
        tbl.column_names.index("embedding"),
        pa.field("embedding", tbl.schema.field("embedding").type),
        new.cast(tbl.schema.field("embedding").type),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="scale only these fact tables (dims always copied) — "
        "spot-proof runs at big factors need only a family's tables",
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    strides = _strides()
    print("strides:", strides)

    for t in ["region", "nation"]:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(src, os.path.join(args.out, f"{t}.parquet"))
        print(t, "copied", src.num_rows)

    for t in args.tables if args.tables is not None else [
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    ]:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        copies = []
        for c in range(args.factor):
            out = _remap(src, c, strides)
            if t == "documents":
                out = _perturb_documents(out, c)
            elif t == "embeddings":
                out = _perturb_embeddings(out, c)
            copies.append(out)
        merged = pa.concat_tables(copies).combine_chunks()
        pq.write_table(
            merged,
            os.path.join(args.out, f"{t}.parquet"),
            row_group_size=256 * 1024,
        )
        print(t, "scaled", src.num_rows, "->", merged.num_rows)


if __name__ == "__main__":
    main()
