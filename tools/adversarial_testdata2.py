#!/usr/bin/env python
"""Adversarial twin #2: hostile EMBEDDINGS and EVENTS (round-14 —
extends the round-13 text twin's method to the other two driver-owned
table families; the text classes live in adversarial_testdata.py).

Embedding classes (vec_id 0 — the ANN entries' query vector — is kept
verbatim so every entry still has a well-defined probe):

- zero-norm vector (cosine divides by zero: the engines must agree on
  the NaN/NULL outcome)
- NaN / +Inf / -Inf planted in one dimension
- denormal magnitudes (1e-42: float32 subnormal territory)
- exact duplicate of the query vector under a distinct id
- exact duplicate PAIR under distinct ids
- all-dimensions-equal (constant vector)
- huge (1e18) and tiny (1e-30) magnitudes (double products stay finite)
- exact negation of the query vector (cosine exactly -1)
- one-hot vector

Event classes (ts kept within 1900-2200 so pandas in the COMPARE
harness never overflows — the fixture attacks the engines, not the
referee):

- props: empty string, invalid JSON, nested objects, unicode keys,
  escaped quotes, duplicate keys, int64-edge numbers, exponent floats,
  JSON null, deep arrays
- value: NaN, +/-Inf, -0.0, 1e308, 5e-324 (double edges)
- ts: exact window-boundary instants (tumbling/session assignment
  conventions), duplicate timestamps across rows (as-of/interval join
  tie-breaking), microsecond-adjacent pairs
- event_type: empty string, case pairs, embedded whitespace/unicode,
  256-char type
- user_id: negative ids, int32 extremes, one HOT user (skew)
- duplicate event_ids (PK assumption probe)

All rewrites are deterministic functions of the row's original id, so
regeneration is stable across sessions. Usage:

    python tools/adversarial_testdata2.py [--src DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def adversarial_embedding(vec_id: int, vec: list[float],
                          qvec: list[float]) -> list[float]:
    """Deterministic hostile rewrite of one embedding (vec_id > 0)."""
    d = len(vec)
    cls = vec_id % 12
    if cls == 1:
        return [0.0] * d                      # zero norm
    if cls == 2:
        return [float("nan")] + vec[1:]       # NaN dimension
    if cls == 3:
        return [float("inf")] + vec[1:]       # +Inf dimension
    if cls == 4:
        return [float("-inf")] + vec[1:]      # -Inf dimension
    if cls == 5:
        return [1e-42 * (i + 1) for i in range(d)]  # denormals
    if cls == 6:
        return list(qvec)                     # duplicate of the query
    if cls == 7:
        # duplicate PAIR: all class-7 vectors identical to each other
        return [math.sin(i) for i in range(d)]
    if cls == 8:
        return [0.5] * d                      # constant vector
    if cls == 9:
        return [x * 1e18 for x in qvec]       # huge magnitude
    if cls == 10:
        return [x * 1e-30 for x in vec]       # tiny magnitude
    if cls == 11:
        return [-x for x in qvec]             # exact negation
    # cls == 0 (and vec_id % 12 == 0): one-hot
    return [1.0 if i == vec_id % d else 0.0 for i in range(d)]


_PROPS = [
    "",                                        # empty string (not JSON)
    "not json at all {",                       # invalid JSON
    '{"k": {"nested": {"deep": [1, 2, {"x": "y"}]}}}',
    '{"ключ": "значение", "键": "值"}',          # unicode keys
    '{"quote": "he said \\"hi\\" loudly"}',
    '{"dup": 1, "dup": 2}',                    # duplicate keys
    '{"big": 9223372036854775807, "neg": -9223372036854775808}',
    '{"f": 1.7976931348623157e308, "tiny": 5e-324}',
    "null",                                    # JSON null literal
    '{"a": [[[[1],[2]],[[3]]]], "b": []}',
    '{"k": "v"}',                              # plain control
    '{"amount": 12.5, "region": "eu"}',        # shaped like the original
]


def adversarial_event(i: int, row: dict) -> dict:
    """Deterministic hostile rewrite of one event row (dict of column
    -> value). ``ts`` is microseconds since epoch (int)."""
    out = dict(row)
    cls = i % 16
    hour = 3_600_000_000  # us
    base_ts = 1_700_000_000_000_000  # 2023-11-14, well inside pandas range
    out["props"] = _PROPS[i % len(_PROPS)]
    if cls == 0:
        out["ts"] = base_ts + (i // 16) * hour  # EXACT hour boundary
    elif cls == 1:
        out["ts"] = base_ts + (i // 16) * hour  # duplicate instant (ties)
    elif cls == 2:
        out["ts"] = base_ts + (i // 16) * hour + 1  # boundary + 1 us
    elif cls == 3:
        out["value"] = float("nan")
    elif cls == 4:
        out["value"] = float("inf")
    elif cls == 5:
        out["value"] = float("-inf")
    elif cls == 6:
        out["value"] = -0.0
    elif cls == 7:
        out["value"] = 1e308
    elif cls == 8:
        out["value"] = 5e-324
    elif cls == 9:
        out["event_type"] = ""                  # empty type
    elif cls == 10:
        out["event_type"] = "Click"             # case pair vs 'click'
    elif cls == 11:
        out["event_type"] = "type with spaces\tand\ttabs"
    elif cls == 12:
        out["event_type"] = "x" * 256
    elif cls == 13:
        out["user_id"] = -(i % 97) - 1          # negative ids
    elif cls == 14:
        out["user_id"] = 7                      # ONE hot user (skew)
    else:
        out["user_id"] = 2_147_483_647 if i % 2 else -2_147_483_648
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/root/repo/testdata_adv2")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(args.out, f"{t}.parquet")
        if t == "embeddings":
            tbl = pq.read_table(src)
            ids = tbl.column("vec_id").to_pylist()
            vecs = tbl.column("embedding").to_pylist()
            qvec = vecs[ids.index(0)]
            new = [
                v if i == 0 else adversarial_embedding(i, v, qvec)
                for i, v in zip(ids, vecs)
            ]
            arrays = {}
            for f in tbl.schema:
                if f.name == "embedding":
                    arrays[f.name] = pa.array(new, f.type)
                else:
                    arrays[f.name] = tbl.column(f.name).combine_chunks()
            pq.write_table(pa.table(arrays), dst)
        elif t == "events":
            tbl = pq.read_table(src)
            cols = {f.name: tbl.column(f.name).to_pylist() for f in tbl.schema}
            # read the arrow timestamp column's integer representation
            # directly: datetime.timestamp() interprets naive values in
            # the BOX's local timezone (and the float multiply can be
            # off by a microsecond), which would make "deterministic
            # regeneration" TZ-dependent (round-15 ADVICE)
            ts_us = (
                tbl.column("ts")
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_pylist()
            )
            n = len(ts_us)
            rows = []
            for i in range(n):
                row = {k: cols[k][i] for k in cols}
                row["ts"] = ts_us[i]
                rows.append(adversarial_event(i, row))
            # duplicate event_id probe: the last 10 rows reuse the
            # first 10 ids (distinct content under a repeated PK)
            for j in range(10):
                rows[n - 10 + j]["event_id"] = rows[j]["event_id"]
            arrays = {}
            for f in tbl.schema:
                vals = [r[f.name] for r in rows]
                if f.name == "ts":
                    arrays[f.name] = pa.array(vals, pa.timestamp("us"))
                else:
                    arrays[f.name] = pa.array(vals, f.type)
            pq.write_table(pa.table(arrays), dst)
        else:
            shutil.copyfile(src, dst)
    print(f"adversarial twin #2 written to {args.out}")


if __name__ == "__main__":
    main()
