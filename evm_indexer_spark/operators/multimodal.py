"""Multimodal binary-column operators for training-data pipelines.

The reference engine has no media path; this extends the engine the way a
100 TB pretraining pipeline needs it: image/audio/video travel as opaque
``binary`` columns with typed metadata, and the per-item compute
(decode, feature-extract, resize, frame-sample) runs as Arrow-batched
``mapInPandas`` stages so each executor core streams record batches
without ever collecting to the driver.

Real codec libraries (PIL / torchaudio / av) are NOT in this container,
so the *decode* step is stubbed behind an import-try that raises a
clearly-marked ``NotImplementedError`` — but everything Spark-side is
real and tested: the schema, the bucket-friendly partitioning, the UDF
signatures, and the Arrow batch shapes. The byte-histogram feature
extractor is genuine vectorized numpy work, a stand-in with the same
data movement profile as a real embedding model.

Scale notes: feature extraction is a narrow map (no shuffle); frame
sampling explodes rows but stays partition-local; only a downstream
groupBy/join would shuffle. Payloads stay in the executor — the driver
only ever sees aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    pass

N_HIST_BINS = 32  # 256 byte values / 8 per bin

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from ``documents``.

    The payload is the UTF-8 bytes of the text; metadata is arithmetic on
    ``doc_id`` so a SQL oracle can reproduce it exactly. In production
    this stage is replaced by a parquet/lance scan of real blobs — the
    downstream operators only see the MEDIA_SCHEMA contract.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        (F.lit(64) + (F.col("doc_id") * 3) % 448).cast("long").alias("width"),
        (F.lit(64) + (F.col("doc_id") * 7) % 448).cast("long").alias("height"),
        (F.lit(1) + F.col("doc_id") % 16).cast("long").alias("n_frames"),
        F.when(F.col("doc_id") % 3 == 1, F.lit(16000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("sample_rate"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Metadata projection of the media table (payload pruned).

    Catalyst column pruning means the binary column is never read when
    only metadata is selected — on a real blob table this is the
    difference between a metadata-only scan and 100 TB of IO.
    """
    return synthesize_media(documents).drop("payload")


# -- decode (stubbed: codec libs not in this container) ---------------------


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:  # pragma: no cover
    """STUB — real implementation requires PIL, absent here.

    Contract: payload bytes → DataFrame[width int, height int,
    pixels array<float>] per batch, to be used inside ``mapInPandas``.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL, which is not installed in this "
            "container; the mapInPandas plumbing around it is tested with "
            "the byte-histogram extractor instead"
        ) from exc
    raise NotImplementedError("PIL decode path not wired in this build")


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """STUB — resize needs a decoder (see ``decode_image_batch``)."""
    raise NotImplementedError(
        "resize requires an image codec, absent in this container"
    )


# -- feature extraction (real, vectorized) ----------------------------------


def extract_byte_histogram(media: DataFrame, n_bins: int = N_HIST_BINS) -> DataFrame:
    """L1-normalized byte histogram per payload via Arrow-batched
    ``mapInPandas`` — the same executor-side batch shape as a real
    featurizer (decode → ndarray → fixed-width vector).
    """
    shift = 8 - (n_bins - 1).bit_length()  # bytes >> shift lands in [0, n_bins)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                if b.size == 0:
                    feats.append(np.zeros(n_bins, dtype=np.float32))
                    continue
                hist = np.bincount(b >> shift, minlength=n_bins).astype(np.float32)
                feats.append(hist / b.size)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "n_bytes", "payload").mapInPandas(
        featurize, schema=FEATURES_SCHEMA
    )


def byte_histogram_bins(media: DataFrame, n_bins: int = N_HIST_BINS) -> DataFrame:
    """Exact-count byte histogram, one row per (doc, bin).

    Same Arrow ``mapInPandas`` batch shape as ``extract_byte_histogram``
    but emits integer counts (zero bins included) instead of normalized
    float features — an exactly-reproducible form any engine can verify,
    and the scan-friendly layout a feature store would ingest. Narrow
    map + partition-local posexplode; no shuffle.
    """
    shift = 8 - (n_bins - 1).bit_length()

    def count_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = [
                np.bincount(
                    np.frombuffer(bytes(buf), dtype=np.uint8) >> shift,
                    minlength=n_bins,
                ).astype(np.int64)
                for buf in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "counts": counts})

    counted = media.select("doc_id", "payload").mapInPandas(
        count_fn, schema="doc_id long, counts array<long>"
    )
    return counted.select(
        "doc_id", F.posexplode("counts").alias("bin", "bin_count")
    ).withColumn("bin", F.col("bin").cast("long"))


# -- frame sampling (real, native expressions) ------------------------------


def frame_offsets(media: DataFrame) -> DataFrame:
    """One row per sampled frame of each video: contiguous byte ranges
    ``[frame_off, frame_off + frame_len)`` over the payload.

    Pure narrow explode — no shuffle; a real pipeline feeds the offsets
    to a range-read decoder so only sampled frames are fetched.
    """
    v = media.filter(F.col("media_type") == "video")
    frame_len = F.floor(F.col("n_bytes") / F.col("n_frames")).cast("long")
    return (
        v.select(
            "doc_id",
            "n_bytes",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), (F.col("n_frames") - 1).cast("int"))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * frame_len).alias("frame_off"),
            frame_len.alias("frame_len"),
        )
    )


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame offsets joined back to actual payload slices (binary out).

    ``substring`` on binary stays JVM-side; the slice never crosses to
    Python.
    """
    offs = frame_offsets(media)
    return (
        offs.join(media.select("doc_id", "payload"), "doc_id")
        .select(
            "doc_id",
            "frame_idx",
            F.expr("substring(payload, cast(frame_off + 1 as int), cast(frame_len as int))").alias(
                "frame"
            ),
        )
    )


def audio_chunk_offsets(media: DataFrame, chunk_seconds: float = 1.0) -> DataFrame:
    """One row per fixed-duration chunk of each audio payload: byte
    ranges assuming 16-bit mono PCM at the row's ``sample_rate``.

    Same narrow-explode shape as ``frame_offsets``; a real pipeline
    range-reads only the sampled chunks. The final partial chunk is
    included (short ``chunk_len``).
    """
    a = media.filter(F.col("media_type") == "audio")
    bytes_per_chunk = (
        (F.col("sample_rate") * F.lit(2) * F.lit(chunk_seconds)).cast("long")
    )
    n_chunks = F.ceil(F.col("n_bytes") / bytes_per_chunk).cast("int")
    return (
        a.filter(F.col("sample_rate") > 0)
        .select(
            "doc_id",
            "n_bytes",
            bytes_per_chunk.alias("_bpc"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * F.col("_bpc")).alias("chunk_off"),
            F.least(
                F.col("_bpc"), F.col("n_bytes") - F.col("chunk_idx") * F.col("_bpc")
            ).alias("chunk_len"),
        )
    )
