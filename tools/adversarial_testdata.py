#!/usr/bin/env python
"""Adversarial twin of the gate fixtures: same tables, hostile TEXT.

The round-11 ``'g'``-flag oracle bug survived every green gate because
the generated documents are single-space ASCII — an oracle can be
wrong in exactly the ways the fixture never exercises. This tool
derives a twin of the sf0.01 fixture dir where ``documents.text`` is
rewritten into deterministic adversarial classes (tabs, runs of
spaces, leading/trailing whitespace, empty and whitespace-only docs,
window-boundary token counts, CJK with no separators, Cyrillic/Greek
case pairs, NBSP and zero-width characters INSIDE tokens, emoji,
uppercase twins, planted near-duplicate clusters) while every other
table is copied verbatim — so the text-family entries can run through
``gate_replica.py`` against it, Spark vs DuckDB, each round
(``GATE_SF_DIR=<out> python tools/gate_replica.py <text entries>``).

Non-ASCII whitespace (NBSP U+00A0, ideographic space U+3000) is
deliberately placed INSIDE tokens: both Java regex and RE2 treat
``\\s`` as ASCII-only, so the engines must agree that these do NOT
split — precisely the class of silent assumption this fixture exists
to check. doc_id / lang / source survive unchanged (q78's budgets and
the %10 eval split keep their shape); n_chars is recomputed.

Usage: python tools/adversarial_testdata.py [--src DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def adversarial_text(doc_id: int, base: str) -> str:
    """Deterministic hostile rewrite of one document's text."""
    words = base.split()[:40]
    cls = doc_id % 16
    if cls == 0:
        # tabs replace every 3rd separator
        out = []
        for i, w in enumerate(words):
            out.append(w)
            out.append("\t" if i % 3 == 2 else " ")
        return "".join(out[:-1])
    if cls == 1:
        # runs of spaces + leading/trailing whitespace
        return "   " + "  ".join(words[:20]) + " \t "
    if cls == 2:
        return ""  # empty doc
    if cls == 3:
        return " \t  "  # whitespace-only
    if cls == 4:
        return words[0] if words else "solo"  # single token
    if cls == 5:
        return " ".join((words + ["pad"] * 7)[:7])  # below 8-gram window
    if cls == 6:
        return " ".join((words + ["pad"] * 8)[:8])  # exactly one window
    if cls == 7:
        # CJK, no separators: the whole doc is ONE token
        return "漢字文書" * 6 + "。これは区切りのない文です"
    if cls == 8:
        # Cyrillic with case variation (lower() must agree)
        return "Съешь ЕЩЁ этих МЯГКИХ французских БУЛОК да выпей же чаю"
    if cls == 9:
        # Greek with case variation — but NO word-final uppercase
        # sigma: Java (Spark) applies the contextual final-sigma rule
        # (word-final Σ→ς) while DuckDB's utf8proc lowercases Σ→σ
        # unconditionally, a documented oracle-comparability boundary
        # (PARITY.md); Spark's behavior matches Python str.lower and
        # is pinned in tests/test_adversarial_text.py
        return "ΣΟΦΗ ΓΛΩΣΣΑ λόγος σοφίας ὁδός ΕΣΤΙΝ καλή"
    if cls == 10:
        # NBSP inside tokens: must NOT split under ASCII \s
        return " ".join(f"a {w}" for w in words[:10])
    if cls == 11:
        # zero-width space + joiner inside tokens
        return " ".join(f"z​{w}‍" for w in words[:10])
    if cls == 12:
        return "🚀 " + " ".join(words[:10]) + " ✨🎉 emoji🧵tail"
    if cls == 13:
        # planted near-duplicate cluster: all class-13 docs share the
        # 13-token body and differ only in the cluster-number token
        return f"duplicate cluster {doc_id - (doc_id % 2)} body " + " ".join(
            ["token%d" % i for i in range(12)]
        )
    if cls == 14:
        return " ".join(words[:20]).upper()  # case folding path
    # punctuation-heavy + ideographic space inside a token
    return "!!!" + ",,".join(words[:8]) + "。end　token"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/root/repo/testdata_adv")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(args.out, f"{t}.parquet")
        if t != "documents":
            shutil.copyfile(src, dst)
            continue
        tbl = pq.read_table(src)
        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        new_text = [adversarial_text(i, s or "") for i, s in zip(ids, texts)]
        arrays, names = [], []
        for field in tbl.schema:
            names.append(field.name)
            if field.name == "text":
                arrays.append(pa.array(new_text, pa.string()))
            elif field.name == "n_chars":
                arrays.append(
                    pa.array([len(s) for s in new_text], field.type)
                )
            else:
                arrays.append(tbl.column(field.name).combine_chunks())
        pq.write_table(pa.table(dict(zip(names, arrays))), dst)
    print(f"adversarial twin written to {args.out}")


if __name__ == "__main__":
    main()
