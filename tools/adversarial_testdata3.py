"""Adversarial twin #3 — hostile MEDIA (round-15 directive #3).

Derives a fixture from the sf0.01 tables with a rewritten ``documents``
table that attacks the multimodal entries (q37-q39, q68, q69, q72) the
way hostile real-world media corpora would:

- ``doc_id`` classes the synthesis/metadata FORMULAS must survive on
  BOTH engines: zero, NEGATIVE ids (where sign-preserving ``%`` and
  floor-mod diverge — they crashed ``element_at`` index 0 and made
  numpy-vs-SQL modulo disagree on first run), and large-but-overflow-
  safe ids. Ids stay UNIQUE (the media oracles group by doc_id).
- ``text`` classes that become the OPAQUE PAYLOAD bytes of q37-q39:
  empty payloads (zero chunks — ``sequence(0,-1)`` descends in Spark
  where ``generate_series`` is empty, found on first run), one-byte,
  multi-byte UTF-8 (CJK/emoji/combining — octet_length vs char length
  parity), an embedded NUL, long same-byte runs (degenerate byte
  histograms), control characters, and a 64 KiB body (frame slicing on
  a payload much larger than its peers).

The rewritten values are all derived from row index with fixed
constants — deterministic regeneration, no timestamps, no RNG.

Corrupt-STREAM classes (truncated/bit-flipped/CRC-broken JPEG, FLAC,
H.264, PNG, WAV) cannot ride a parquet fixture — q68/q69/q72
synthesize their payloads from doc_id in-plan — so the per-row decode
refusal contract is pinned in pytest instead
(tests/test_multimodal.py::TestPerRowRefusal), where the hostile bytes
are injected directly into the decode operators.

Usage: python tools/adversarial_testdata3.py
       GATE_SF_DIR=/root/repo/testdata_adv3 python tools/gate_replica.py \
           q37_media_metadata q38_media_byte_histogram q39_media_chunks \
           q68_jpeg_pixel_stats q69_flac_sample_stats q72_h264_frame_stats
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def adversarial_doc(i: int, doc_id: int, text: str) -> tuple[int, str]:
    """(doc_id, text) for row *i* — hostile classes over a stable,
    UNIQUE id space: rows 0-59 get rewritten ids/texts, the rest keep
    their originals (so the fixture still carries a realistic bulk)."""
    base = (text or "")[:200]
    if i < 20:
        # NEGATIVE ids, covering every residue of %3/%16 used by the
        # media formulas (media_type arm, n_frames 0 and negative,
        # audio split) — ids -1..-20
        return -(i + 1), base or "negative id doc"
    if i == 20:
        return 10**9, base            # large, overflow-safe in formulas
    if i == 21:
        return 10**9 + 1, base
    if i == 22:
        return doc_id, ""             # EMPTY payload (0 bytes)
    if i == 23:
        return doc_id, "x"            # 1-byte payload
    if i == 24:
        return doc_id, "漢字" * 40     # multi-byte CJK (3-byte chars)
    if i == 25:
        return doc_id, "🚀🎉" * 30     # 4-byte emoji
    if i == 26:
        return doc_id, "é" * 50  # combining accents
    if i == 27:
        return doc_id, "a\x00b"       # embedded NUL byte
    if i == 28:
        return doc_id, "\t\r\n\x0b " * 20  # control/whitespace bytes
    if i == 29:
        return doc_id, "a" * 4096     # one-byte-value histogram spike
    if i == 30:
        return doc_id, "b" * 65536    # 64 KiB body (frame slicing)
    if 31 <= i < 60:
        # dense small ids around zero including 0 itself stay put but
        # with short bodies, so every (id mod k) arm is populated
        return doc_id, base or f"doc {doc_id}"
    return doc_id, text


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/root/repo/testdata_adv3")
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
        new_ids, new_texts = [], []
        for i, (d, x) in enumerate(zip(ids, texts)):
            nd, nx = adversarial_doc(i, d, x)
            new_ids.append(nd)
            new_texts.append(nx)
        assert len(set(new_ids)) == len(new_ids), "doc_ids must stay unique"
        arrays = {}
        for f in tbl.schema:
            if f.name == "doc_id":
                arrays[f.name] = pa.array(new_ids, f.type)
            elif f.name == "text":
                arrays[f.name] = pa.array(new_texts, f.type)
            elif f.name == "n_chars":
                arrays[f.name] = pa.array(
                    [len(x) for x in new_texts], f.type
                )
            else:
                arrays[f.name] = tbl.column(f.name).combine_chunks()
        pq.write_table(pa.table(arrays), dst)
    print(f"adversarial twin #3 (hostile media) written to {args.out}")


if __name__ == "__main__":
    main()
