"""BM25 / tf-idf scoring and RAG chunking vs hand-computed oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import corpus, ranking

DOCS = [
    (0, "spark shuffles data fast"),
    (1, "data data data everywhere"),
    (2, "ducks fly south"),
    (3, "fast data pipelines move fast"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _bm25_oracle(query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in query}
    out = {}
    for i, t in toks.items():
        s = 0.0
        for q in query:
            tf = t.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_formula(spark, docs):
    query = ["data", "fast"]
    got = {r["id"]: r["score"] for r in
           ranking.bm25_scores(docs, "doc_id", "text", query).collect()}
    assert got == _bm25_oracle(query)


def test_bm25_topk_deterministic(spark, docs):
    top = ranking.bm25_scores(docs, "doc_id", "text", ["data"], top_k=2).collect()
    oracle = _bm25_oracle(["data"])
    want = sorted(oracle.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["id"], r["score"]) for r in top] == want


def test_tfidf_scores(spark, docs):
    got = {r["id"]: r["score"] for r in
           ranking.tfidf_scores(docs, "doc_id", "text", ["data"]).collect()}
    idf = math.log(4 / 3)  # 'data' in 3 of 4 docs
    assert got == {
        0: round(1 * idf, 4), 1: round(3 * idf, 4), 3: round(1 * idf, 4)
    }


def test_bm25_no_python_udfs(spark, docs):
    plan = (
        ranking.bm25_scores(docs, "doc_id", "text", ["data"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_tokens_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in corpus.chunk_tokens(df, "doc_id", "text", 4, 3).collect()
    )
    # windows: [0:4) [3:7) [6:10) — ceil((10-4)/3)+1 = 3 chunks
    assert rows == [
        (0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9"),
    ]


def test_chunk_tokens_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = corpus.chunk_tokens(df, "doc_id", "text", 4, 3).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b" and rows[0]["n_chunks"] == 1


def test_chunk_tokens_exact_boundary(spark):
    # 7 tokens, size 4, stride 3: ceil(3/3)+1 = 2 chunks, second is full
    df = spark.createDataFrame(
        [(1, " ".join("abcdefg"))], "doc_id long, text string"
    )
    rows = sorted(
        r["chunk_text"]
        for r in corpus.chunk_tokens(df, "doc_id", "text", 4, 3).collect()
    )
    assert rows == ["a b c d", "d e f g"]


def test_chunk_tokens_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpus.chunk_tokens(df, "doc_id", "text", 0, 3)
    with pytest.raises(ValueError):
        corpus.chunk_tokens(df, "doc_id", "text", 4, -1)


def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["id"]: r
        for r in ranking.unigram_logprob(df, "doc_id", "text").collect()
    }
    # corpus counts over DOCS: 15 tokens total
    toks = [t for _, s in DOCS for t in s.lower().split()]
    n = len(toks)
    cnt = {t: toks.count(t) for t in set(toks)}
    for did, s in DOCS:
        expect = sum(math.log(cnt[t] / n) for t in s.lower().split())
        assert got[did]["n_tokens"] == len(s.split())
        assert got[did]["logprob"] == pytest.approx(round(expect, 4))
    # boilerplate (common tokens) must outscore rare-token documents
    assert got[1]["logprob"] / got[1]["n_tokens"] > got[2]["logprob"] / got[2]["n_tokens"]


def test_unigram_logprob_skips_empty_tokens(spark):
    df = spark.createDataFrame(
        [(1, "  a   a  "), (2, "")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in ranking.unigram_logprob(df, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 2
    assert rows[1]["logprob"] == pytest.approx(0.0)  # ln(2/2)*2
    assert 2 not in rows  # all-whitespace doc contributes no tokens


def test_dsir_scores_hand_computed(spark):
    rows = [
        (0, "spark shuffles data fast", "en"),
        (1, "data data data everywhere", "en"),
        (2, "ducks fly south", "de"),
        (3, "fast data pipelines move fast", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["id"]: r
        for r in ranking.dsir_scores(
            df, "doc_id", "text", F.col("lang") == "en"
        ).collect()
    }
    toks = [(t, lang) for _, s, lang in rows for t in s.lower().split()]
    cs = {t: sum(1 for x, _ in toks if x == t) for t, _ in toks}
    ct = {t: sum(1 for x, g in toks if x == t and g == "en") for t, _ in toks}
    ns, nt, v = len(toks), sum(1 for _, g in toks if g == "en"), len(cs)
    for did, s, _ in rows:
        expect = sum(
            math.log((ct[t] + 1) / (nt + v)) - math.log((cs[t] + 1) / (ns + v))
            for t in s.lower().split()
        )
        assert got[did]["n_tokens"] == len(s.split())
        assert got[did]["dsir_score"] == pytest.approx(round(expect, 4))
    # a document made of target-slice tokens must outrank one that
    # shares nothing with the target slice (per-token affinity)
    assert (
        got[1]["dsir_score"] / got[1]["n_tokens"]
        > got[2]["dsir_score"] / got[2]["n_tokens"]
    )


def test_dsir_scores_empty_target_slice(spark):
    # no row matches the target: every token's target count is 0 and the
    # score is finite (add-one smoothing), never NaN/-inf
    df = spark.createDataFrame(
        [(0, "a b", "x"), (1, "b c", "y")], "doc_id long, text string, lang string"
    )
    rows = ranking.dsir_scores(df, "doc_id", "text", F.col("lang") == "zz").collect()
    assert len(rows) == 2
    assert all(math.isfinite(r["dsir_score"]) for r in rows)
