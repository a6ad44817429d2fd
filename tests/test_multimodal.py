"""Multimodal binary-column plumbing: Arrow batch shapes, payload slicing,
decode stub contract (operators/multimodal.py)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import multimodal
from evm_indexer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 120)
    return multimodal.synthesize_media(docs).cache()


def test_media_schema_and_counts(media):
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in multimodal.MEDIA_SCHEMA
    ]
    rows = media.select("media_type").groupBy("media_type").count().collect()
    kinds = {r["media_type"] for r in rows}
    assert kinds == {"image", "audio", "video"}


def test_payload_is_utf8_text(spark, media):
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 120)
    joined = media.join(docs, "doc_id").select(
        "doc_id", F.decode("payload", "UTF-8").alias("roundtrip"), "text"
    )
    assert joined.filter(F.col("roundtrip") != F.col("text")).count() == 0


def test_byte_histogram_batches(media):
    feats = multimodal.extract_byte_histogram(media).collect()
    assert len(feats) == media.count()
    for r in feats:
        assert len(r["features"]) == multimodal.N_HIST_BINS
        if r["n_bytes"] > 0:
            assert math.isclose(sum(r["features"]), 1.0, rel_tol=1e-4)


def test_frame_offsets_tile_payload(media):
    offs = multimodal.frame_offsets(media)
    # per video: n_frames rows, contiguous non-overlapping ranges from 0
    agg = (
        offs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("frame_off").alias("first"),
            F.max(F.col("frame_off") + F.col("frame_len")).alias("end"),
            F.sum("frame_len").alias("covered"),
        )
        .join(media.filter(F.col("media_type") == "video"), "doc_id")
    )
    bad = agg.filter(
        (F.col("n") != F.col("n_frames"))
        | (F.col("first") != 0)
        | (F.col("end") > F.col("n_bytes"))
        | (F.col("covered") != F.col("end"))  # contiguous, non-overlapping
    )
    assert bad.count() == 0


def test_sample_frames_slices_match(media):
    frames = multimodal.sample_frames(media)
    # re-concatenate the slices per doc: must be a prefix of the payload
    rebuilt = (
        frames.orderBy("doc_id", "frame_idx")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("frame_idx", "frame"))
            ).alias("parts")
        )
        .select(
            "doc_id",
            F.aggregate(
                "parts",
                F.lit(b""),
                lambda acc, p: F.concat(acc, p["frame"]),
            ).alias("joined"),
        )
        .join(media.select("doc_id", "payload"), "doc_id")
    )
    mismatched = rebuilt.filter(
        F.col("joined") != F.substring(
            F.col("payload"), 1, F.length(F.col("joined")).cast("int")
        )
    )
    assert mismatched.count() == 0


def test_decode_stub_contract():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_batch(pd.Series([b"\x00"]))
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(None, 32, 32)
