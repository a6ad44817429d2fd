"""Vocab-on-arrival: the merge list reported at each epoch must equal
batch BPE training over every prefix of landed documents; epoch
re-delivery must converge; compaction must bound the store without
changing summed counts."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from evm_indexer_spark.operators.tokenizer import bpe_train
from evm_indexer_spark.streaming.vocab_stream import (
    WordCountStore,
    start_vocab_stream,
)

DOCS = [
    (0, "the quick brown fox"),
    (1, "the quick red fox"),
    (2, "lazy dogs sleep all day"),
    (3, "the brown dogs run"),
    (4, "zebras graze the plain"),
]


def _land(path, rows, name):
    with open(os.path.join(path, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _batch_merges(spark, rows, k=6):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return bpe_train(df, "text", num_merges=k)


def _run(spark, landing, store, ckpt, sink, k=6):
    q = start_vocab_stream(
        spark, landing, store, ckpt,
        on_merges=lambda m, e: sink.append((m, e)), num_merges=k,
    )
    q.awaitTermination(120)


def test_merges_equal_batch_training_per_prefix(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = WordCountStore(spark, str(tmp_path / "vocab"))
    sink: list = []

    legs = [DOCS[:2], DOCS[2:4], DOCS[4:]]
    landed: list = []
    for i, leg in enumerate(legs):
        landed.extend(leg)
        _land(str(landing), leg, f"b{i}.json")
        sink.clear()
        _run(spark, str(landing), store, ckpt, sink)
        assert len(sink) == 1
        assert sink[0][0] == _batch_merges(spark, landed), f"prefix {i}"

    # restart with no new files: silent
    sink.clear()
    _run(spark, str(landing), store, ckpt, sink)
    assert sink == []


def test_compaction_preserves_counts_and_training(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = WordCountStore(spark, str(tmp_path / "vocab"))
    sink: list = []
    for i, leg in enumerate([DOCS[:2], DOCS[2:4], DOCS[4:]]):
        _land(str(landing), leg, f"b{i}.json")
        _run(spark, str(landing), store, ckpt, sink)
    before = sorted(map(tuple, store.counts().collect()))
    # newest epoch dir withheld (crashed-epoch redelivery safety)
    assert store.compact() == 2
    assert sorted(map(tuple, store.counts().collect())) == before
    assert store.compact() == 0
    assert store.train(6) == _batch_merges(spark, DOCS)


def test_word_counts_match_plain_tokenization(spark, tmp_path):
    store = WordCountStore(spark, str(tmp_path / "vocab"))
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    store.append(df, "text", batch_id=0)
    got = {r["word"]: r["freq"] for r in store.counts().collect()}
    toks = [t for _, s in DOCS for t in s.lower().split()]
    assert got == {t: toks.count(t) for t in set(toks)}


def test_vocab_store_retract_cancels_exactly(spark, tmp_path):
    from evm_indexer_spark.streaming.vocab_stream import word_counts

    docs = spark.createDataFrame(
        [
            (0, "low lower lowest low low"),
            (1, "newer newest new newer"),
            (2, "low lowest newer low"),
        ],
        "doc_id long, text string",
    )
    store = WordCountStore(spark, str(tmp_path / "vocab"))
    for i in range(3):
        store.append(docs.filter(F.col("doc_id") == i), "text", batch_id=i)
    store.retract(docs.filter(F.col("doc_id") == 1), "text")
    keep = docs.filter(F.col("doc_id") != 1)
    want = {
        (r["word"], r["freq"])
        for r in word_counts(keep, "text").collect()
    }
    got = {
        (r["word"], r["freq"])
        for r in store.counts().filter(F.col("freq") != 0).collect()
    }
    assert got == want
    # BPE training over the store equals batch training on the
    # remaining corpus — the vocab loop stays retraction-consistent
    assert store.train(4, 1) == bpe_train(keep, "text", num_merges=4)
    assert store.compact() >= 1
    assert {
        (r["word"], r["freq"]) for r in store.counts().collect()
    } == want


def test_vocab_double_retract_raises(spark, tmp_path):
    import pytest

    from evm_indexer_spark.streaming.vocab_stream import word_counts

    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "newer newest new")],
        "doc_id long, text string",
    )
    store = WordCountStore(spark, str(tmp_path / "vocab"))
    for i in range(2):
        store.append(docs.filter(F.col("doc_id") == i), "text", batch_id=i)
    gone = docs.filter(F.col("doc_id") == 1)
    store.retract(gone, "text")
    with pytest.raises(ValueError, match="already retracted"):
        store.retract(gone, "text")
    # single retraction still cancels exactly; compaction stays legal
    want = {(r["word"], r["freq"]) for r in word_counts(
        docs.filter(F.col("doc_id") == 0), "text").collect()}
    got = {(r["word"], r["freq"]) for r in store.counts()
           .filter(F.col("freq") != 0).collect()}
    assert got == want
    assert store.compact() >= 1
