"""Adversarial-text pins for the two documented oracle-comparability
boundaries (PARITY.md) and the operator-truth checks that replace the
DuckDB oracle where its Unicode semantics diverge from the engine's.

Found by the round-13 adversarial fixture (tools/adversarial_testdata.py):

1. **Edit distance**: DuckDB ``levenshtein`` counts UTF-8 BYTES
   (``levenshtein('漢','a') = 3``); Spark's counts codepoints — the
   standard definition. The q63 operator is therefore pinned here
   against a pure-Python codepoint DP over the adversarial corpus
   instead of the SQL oracle (which stays authoritative on ASCII,
   where byte = codepoint — the sf fixtures).

2. **Greek final sigma**: Java/Spark ``lower()`` applies the
   contextual final-sigma rule (word-final Σ→ς, matching Python
   ``str.lower``); DuckDB lowercases Σ→σ unconditionally. The
   adversarial fixture avoids word-final uppercase sigma so the text
   replica stays oracle-checkable; the Spark-vs-Python agreement is
   pinned here so the engine's behavior is still test-anchored.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import dedup
from tools.adversarial_testdata import adversarial_text

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "mix a potion of zesty lemon and dark cobalt ink under the old "
    "stone bridge at midnight counting forty two silver coins"
)


def _pure_dp(a: str, b: str) -> int:
    """Textbook codepoint Levenshtein — the semantics ground truth."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def adv_docs():
    return [(i, adversarial_text(i, BASE)) for i in range(64)]


def test_editdist_operator_matches_codepoint_dp_on_adversarial(
    spark, adv_docs
):
    """q63's operator vs the pure-DP truth on multibyte/hostile text —
    the check the byte-based DuckDB oracle cannot express."""
    df = spark.createDataFrame(adv_docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dedup.editdist_near_duplicates(
            df, "doc_id", "text", max_dist=40, bucket_width=50,
            strategy="bucket",
        ).collect()
    }
    want = {}
    docs = dict(adv_docs)
    for a in sorted(docs):
        for b in sorted(docs):
            if a >= b:
                continue
            # same blocking rule as the operator: |len bucket delta|<=1
            if abs(len(docs[a]) // 50 - len(docs[b]) // 50) > 1:
                continue
            d = _pure_dp(docs[a], docs[b])
            if d <= 40:
                want[(a, b)] = d
    assert got == want


def test_spark_lower_matches_python_on_greek_sigma(spark):
    """Both apply the contextual final-sigma rule; DuckDB does not —
    the PARITY.md boundary this pin anchors."""
    samples = ["ΣΟΦΟΣ", "ΓΛΩΣΣΑΣ", "ΟΔΥΣΣΕΥΣ ΕΣΤΙΝ", "Σ", "ΣΣ"]
    rows = spark.createDataFrame(
        [(s,) for s in samples], "s string"
    ).select(F.lower("s").alias("l")).collect()
    assert [r["l"] for r in rows] == [s.lower() for s in samples]


def test_contentless_docs_make_no_dedup_claims(spark):
    """The round-13 semantics fix: docs that are empty after
    normalization (whitespace-only, punctuation-only, non-latin under
    the a-z0-9 filter) contribute NO shingles, so they pair with
    nothing — previously every such doc shared the '' shingle and all
    of them reported mutual jaccard 1.0 (and would form one quadratic
    LSH bucket at corpus scale)."""
    df = spark.createDataFrame(
        [
            (0, ""),
            (1, " \t  "),
            (2, "!!!,,,;;;"),
            (3, "普通のテキスト"),
            (4, "real content tokens here repeated real content tokens"),
            (5, "real content tokens here repeated real content tokens"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.shingle_rows(df, "doc_id", "text", 3).collect()
    assert {r["id"] for r in rows} == {4, 5}
    pairs = dedup.jaccard_all_pairs(
        df, "doc_id", "text", threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(4, 5)}
    near = dedup.minhash_near_duplicates(
        df, "doc_id", "text", jaccard_threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in near} == {(4, 5)}
