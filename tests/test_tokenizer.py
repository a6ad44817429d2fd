"""BPE training/application (operators/tokenizer.py) vs the pure-Python
reference twin, plus the merge-semantics edge cases the oracle relies
on."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import tokenizer
from evm_indexer_spark.operators.tokenizer import MARK
from evm_indexer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _ref_token_count(text: str, merges) -> tuple[int, int]:
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    if norm == "":
        return 0, 0
    n_words = len(norm.split(" "))
    rep = MARK + MARK.join(norm) + MARK
    for left, right, _ in merges:
        rep = rep.replace(
            MARK + left + MARK + right + MARK, MARK + left + right + MARK
        )
    n_sym = len(rep.split(MARK)) - 2
    return n_words, n_sym - (n_words - 1)


def test_both_tiers_match_reference_on_fixture_corpus(spark):
    doc = load_table(spark, SF_DIR, "documents").limit(120)
    texts = [r["text"] for r in doc.select("text").collect()]
    ref = tokenizer.bpe_train_reference(texts, num_merges=10)
    # driver tier (the default at this vocab size)
    assert tokenizer.bpe_train(doc, "text", num_merges=10) == ref
    # distributed tier, forced — must be bit-identical (same pair
    # weighting, same tie-break, same single-pass merge semantics)
    assert (
        tokenizer.bpe_train(doc, "text", num_merges=10, driver_below=0)
        == ref
    )
    # merges must be real merges: counts positive, non-increasing is NOT
    # required (a merge can create a more frequent pair), but each
    # winner must be reachable from the corpus alphabet
    assert all(c > 0 for _, _, c in ref)


def test_token_counts_match_reference(spark):
    doc = load_table(spark, SF_DIR, "documents").limit(60)
    rows = doc.select("doc_id", "text").collect()
    merges = tokenizer.bpe_train(doc, "text", num_merges=6)
    got = {
        r["doc_id"]: r
        for r in tokenizer.bpe_token_counts(
            doc, "doc_id", "text", merges
        ).collect()
    }
    for r in rows:
        n_words, n_bpe = _ref_token_count(r["text"], merges)
        assert got[r["doc_id"]]["n_words"] == n_words
        assert got[r["doc_id"]]["n_bpe_tokens"] == n_bpe
        # merges only ever shrink the symbol count, never below n_words
        assert n_words <= n_bpe <= len(re.sub(r"\s+", "", r["text"]))


def test_exotic_line_separators_tier_identical(spark):
    """U+0085/U+2028/U+2029 survive Java's \\s+ split (unlike \\n), so a
    "word" can carry them; a non-DOTALL ``(.)`` skipped them in the
    distributed rep while the driver tier delimited every char —
    tier-dependent merges. Both tiers must now be bit-identical, with
    the separator treated as an ordinary in-word symbol."""
    weird = "ab ab abab ab ab cd cd cd"
    df = spark.createDataFrame(
        [(0, weird), (1, "ab ab cd cd")], "doc_id long, text string"
    )
    driver = tokenizer.bpe_train(df, "text", num_merges=4)
    distributed = tokenizer.bpe_train(
        df, "text", num_merges=4, driver_below=0
    )
    assert driver == distributed
    # the separator-bearing words are the most frequent, so their
    # symbols must appear inside learned merges - proving the rep
    # delimited every char. (bpe_train_reference is NOT the yardstick
    # here: Python's str.split treats these code points as whitespace,
    # a tokenization difference by design; both Spark tiers share
    # word_counts' Java \s+ tokenization.)
    seps = {"\u2028", "\u0085", "\u2029"}
    merged_syms = {s for left, right, _ in driver for s in (left, right)}
    assert any(any(c in sym for c in seps) for sym in merged_syms)


def test_overlapping_merge_is_single_pass_leftmost(spark):
    # 'aaa' + merge (a,a) -> ('aa','a'), the classic BPE edge the
    # marker-replace formulation must preserve
    df = spark.createDataFrame([(0, "aaa aaa bb")], "doc_id long, text string")
    merges = tokenizer.bpe_train(df, "text", num_merges=1)
    assert merges[0][:2] == ("a", "a")
    out = tokenizer.bpe_token_counts(df, "doc_id", "text", merges).collect()[0]
    # each 'aaa' -> ['aa','a'] (2), 'bb' -> ['b','b'] (2) = 6 tokens
    assert out["n_words"] == 3 and out["n_bpe_tokens"] == 6


def test_merges_learn_frequent_pairs_first(spark):
    df = spark.createDataFrame(
        [(0, "the the the cat"), (1, "the cat")], "doc_id long, text string"
    )
    merges = tokenizer.bpe_train(df, "text", num_merges=2)
    # (t,h) and (h,e) tie at 4 ('the' x4); lexicographic -> (h,e) wins
    # round 1, then (t,'he') wins round 2
    assert merges[0][:2] == ("h", "e") and merges[0][2] == 4
    assert merges[1][:2] == ("t", "he") and merges[1][2] == 4


def test_tie_break_is_lexicographic(spark):
    df = spark.createDataFrame([(0, "ab cd ab cd")], "doc_id long, text string")
    merges = tokenizer.bpe_train(df, "text", num_merges=1)
    # (a,b) and (c,d) both count 2 — lexicographic minimum wins
    assert merges[0][:2] == ("a", "b")


def test_marker_byte_in_text_raises(spark):
    df = spark.createDataFrame([(0, "bad \x01 text")], "doc_id long, text string")
    with pytest.raises(Exception, match="marker"):
        tokenizer.word_counts(df, "text").collect()


def test_min_freq_prunes_vocab_tail(spark):
    df = spark.createDataFrame(
        [(0, "zz zz zz qqq")], "doc_id long, text string"
    )
    merges = tokenizer.bpe_train(df, "text", num_merges=1, min_freq=2)
    # 'qqq' (freq 1) is pruned; only 'zz' pairs remain
    assert merges[0][:2] == ("z", "z")


def test_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "   ")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in tokenizer.bpe_token_counts(df, "doc_id", "text", []).collect()
    }
    assert got[0]["n_words"] == 2 and got[0]["n_bpe_tokens"] == 2
    assert got[1]["n_words"] == 0 and got[1]["n_bpe_tokens"] == 0


def test_apply_plan_evaluates_normalizer_once(spark):
    """The \\s+ normalizer must stay a single aliased projection:
    inlining it into every count reference compiled SIX regex Patterns
    per row (CASE branches defeat physical subexpression elimination)
    and cost ~27% of the apply pass at sf0.1 (round 16)."""
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    out = tokenizer.bpe_token_counts(
        df, "doc_id", "text", [("a", "b", 1)]
    )
    optimized = str(
        out._jdf.queryExecution().optimizedPlan()
    )
    assert optimized.count("regexp_replace(lower(") == 1
    # and the counts are pure length arithmetic - no per-row arrays
    assert "split(" not in optimized
