"""Embedding-dedup-on-arrival: incremental pairs + the streaming index.

Oracle model (mirrors test_dedup_stream): the incremental pass over
(indexed old half, arriving new half) must report EXACTLY the batch
near-dup truth restricted to pairs touching the new half — verified
against the full batch operator, which is itself DuckDB-oracled by
q35/q67 in the driver gate.
"""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import similarity
from evm_indexer_spark.streaming.embed_stream import (
    EmbeddingBucketIndex,
    start_embedding_dedup_stream,
)

DIM = 8


def _unit(seed: int) -> list[float]:
    """Deterministic unit vector from a seed (no RNG in tests)."""
    vals = [math.sin(seed * 13.7 + k * 2.1) for k in range(DIM)]
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def _perturb(vec: list[float], eps: float = 0.01) -> list[float]:
    out = [vec[0] + eps] + vec[1:]
    return out


def _vectors(spark):
    """12 originals + 6 planted near-dups of the first 6 (ids 100+i)."""
    rows = [(i, _unit(i)) for i in range(12)]
    rows += [(100 + i, _perturb(_unit(i))) for i in range(6)]
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def _batch_pairs(spark, df, min_cosine=0.99):
    return {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in similarity.embedding_near_duplicates(
            df, "vec_id", "vec", min_cosine=min_cosine, n_tables=6, dim=DIM
        ).collect()
    }


def test_incremental_equals_batch_restricted(spark):
    df = _vectors(spark)
    split = 100  # originals indexed, planted copies arrive
    old = df.filter(F.col("vec_id") < split)
    new = df.filter(F.col("vec_id") >= split)
    index = similarity.embedding_buckets(
        old, "vec_id", "vec", n_tables=6, dim=DIM
    )
    inc = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in similarity.incremental_embedding_pairs(
            new, index, df, "vec_id", "vec",
            min_cosine=0.99, n_tables=6, dim=DIM,
        ).collect()
    }
    truth = {p for p in _batch_pairs(spark, df) if p[1] >= split}
    assert inc == truth
    # every planted pair recovered (the deterministic corpus also
    # contains one genuine near-dup among the sin-wave vectors)
    assert {(p[0], p[1]) for p in inc} >= {(i, 100 + i) for i in range(6)}


def test_index_parameter_mismatch_rejected(spark, tmp_path):
    path = str(tmp_path / "ix")
    EmbeddingBucketIndex(spark, path, dim=DIM, n_planes=12, n_tables=6)
    with pytest.raises(ValueError, match="parameters"):
        EmbeddingBucketIndex(spark, path, dim=DIM, n_planes=10, n_tables=6)
    with pytest.raises(ValueError, match="parameters"):
        EmbeddingBucketIndex(spark, path, dim=16, n_planes=12, n_tables=6)


def test_index_append_idempotent(spark, tmp_path):
    ix = EmbeddingBucketIndex(spark, str(tmp_path / "ix"), dim=DIM)
    docs = _vectors(spark).limit(5)
    ix.append(docs, "vec_id", "vec", batch_id=7)
    first = ix.buckets().count()
    ix.append(docs, "vec_id", "vec", batch_id=7)  # epoch re-delivery
    assert ix.buckets().count() == first == 5 * ix.n_tables


def test_index_compaction_folds_dirs_and_keeps_rows(spark, tmp_path):
    ix = EmbeddingBucketIndex(spark, str(tmp_path / "ix"), dim=DIM)
    df = _vectors(spark)
    for b in range(3):
        ix.append(df.filter(F.col("vec_id") % 3 == b), "vec_id", "vec", b)
    before = {(r["id"], r["bucket"]) for r in ix.buckets().collect()}
    assert ix.compact() == 3
    after = {(r["id"], r["bucket"]) for r in ix.buckets().collect()}
    assert after == before
    # folded into one base generation
    dirs = [
        d for d in os.listdir(tmp_path / "ix") if d.startswith("batch=")
    ]
    assert dirs == ["batch=base0"]
    assert ix.compact() == 0  # single base: nothing to fold


def _land(landing: str, rows, fname: str) -> None:
    with open(os.path.join(landing, fname), "w") as fh:
        for vec_id, vec in rows:
            fh.write(json.dumps({"vec_id": vec_id, "vec": vec}) + "\n")


def test_stream_reports_cross_batch_pairs(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ix = EmbeddingBucketIndex(spark, str(tmp_path / "ix"), dim=DIM)
    seen: list[tuple[list, int]] = []

    def run():
        q = start_embedding_dedup_stream(
            spark, str(landing), ix, ckpt,
            on_pairs=lambda pairs, epoch: seen.append((pairs, epoch)),
            min_cosine=0.99,
        )
        q.awaitTermination(120)

    # epoch 1: originals — no pairs
    _land(str(landing), [(i, _unit(i)) for i in range(6)], "b1.json")
    run()
    assert all(not pairs for pairs, _ in seen)
    # epoch 2: perturbed copies arrive — every cross-batch pair reported
    _land(
        str(landing),
        [(100 + i, _perturb(_unit(i))) for i in range(6)],
        "b2.json",
    )
    run()
    flat = {(p["id_a"], p["id_b"]) for pairs, _ in seen for p in pairs}
    assert flat == {(i, 100 + i) for i in range(6)}


def test_ann_index_stream_appends_and_guards(spark, tmp_path):
    """ANN-serving-on-arrival: landing vectors append into a built
    IvfServingIndex exactly once — epoch re-delivery converges, a
    mutated cross-epoch re-arrival is dropped, and topk sees arrivals
    without any rebuild (checkpoint resume between legs)."""
    from evm_indexer_spark.streaming.embed_stream import start_ann_index_stream

    base = _vectors(spark).filter(F.col("vec_id") < 6)
    path = str(tmp_path / "ivf")
    idx = similarity.IvfServingIndex.build(
        base.withColumnRenamed("vec", "embedding"), "vec_id", "embedding",
        path, n_lists=4, pq_subspaces=4,
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = start_ann_index_stream(spark, str(landing), idx, ckpt)
        q.awaitTermination(120)

    _land(str(landing), [(100, _perturb(_unit(0))), (101, _unit(20))], "b1.json")
    run()
    assert idx.vectors().count() == 8
    # leg 2: id 100 re-arrives MUTATED (must be dropped) + one new id
    _land(str(landing), [(100, _unit(7)), (102, _unit(21))], "b2.json")
    run()
    assert idx.vectors().count() == 9
    ids = {r["id"] for r in idx.vectors().select("id").collect()}
    assert ids == {0, 1, 2, 3, 4, 5, 100, 101, 102}
    # the first-arrival vector for 100 was kept: it stays vec 0's twin
    got = [r["id"] for r in idx.topk(_unit(0), k=2, nprobe=4).collect()]
    assert set(got) == {0, 100}
    # and the PQ path serves the arrivals too (codes were appended)
    got_pq = [
        r["id"] for r in idx.topk_pq(_unit(0), k=2, nprobe=4, n_candidates=9).collect()
    ]
    assert set(got_pq) == {0, 100}


def test_stream_rearrived_id_is_dropped(spark, tmp_path):
    # an id landing again in a LATER file must not re-index (its bucket
    # rows would double and verification would see two vector versions)
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ix = EmbeddingBucketIndex(spark, str(tmp_path / "ix"), dim=DIM)
    seen: list = []

    def run():
        q = start_embedding_dedup_stream(
            spark, str(landing), ix, ckpt,
            on_pairs=lambda pairs, epoch: seen.append((pairs, epoch)),
            min_cosine=0.99,
        )
        q.awaitTermination(120)

    _land(str(landing), [(0, _unit(0)), (1, _unit(1))], "b1.json")
    run()
    rows_before = ix.buckets().count()
    # id 0 re-arrives with a MUTATED vector in a later file
    _land(str(landing), [(0, _perturb(_unit(0))), (2, _unit(2))], "b2.json")
    run()
    assert ix.buckets().count() == rows_before + ix.n_tables  # only id 2
    ids = {r["id"] for r in ix.buckets().collect()}
    assert ids == {0, 1, 2}
