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

    # unknown container magic (e.g. an H.264 Annex B start code) still
    # hits the honest stub; BMP/PNG/JPEG are decoded for real
    # (TestRealCodecs, test_jpeg.py)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_batch(pd.Series([b"\x00\x00\x00\x01\x67"]))
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_payload(b"\x00\x01\x02")
    # truncated-but-sniffable JPEG is a decode ERROR, not a stub hit
    with pytest.raises(ValueError):
        multimodal.decode_image_payload(b"\xff\xd8\xff\xe0jpg")


class TestRealCodecs:
    """WAV and BMP paths are genuine decode (stdlib wave / manual BMP
    header parse) — expectations recomputed independently from the
    synthesis formulas."""

    def test_wav_roundtrip_features(self, spark):
        import numpy as np

        docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
        media = multimodal.synthesize_wav(docs, n_samples=160, sample_rate=16_000)
        rows = {r["doc_id"]: r for r in
                multimodal.wav_features(media).collect()}
        assert set(rows) == set(range(8))
        i = np.arange(160)
        for did, r in rows.items():
            samples = ((did * 31 + i * 7) % 2048 - 1024).astype(np.float64)
            assert r["sample_rate"] == 16_000
            assert r["n_samples"] == 160
            assert r["peak"] == int(np.abs(samples).max())
            assert abs(r["rms"] - float(np.sqrt((samples ** 2).mean()))) < 1e-9

    def test_bmp_roundtrip_stats(self, spark):
        import numpy as np

        docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        media = multimodal.synthesize_bmp(docs, width=8, height=6)
        rows = {r["doc_id"]: r for r in
                multimodal.image_pixel_stats(media).collect()}
        xs, ys = np.arange(8), np.arange(6)[:, None]
        for did, r in rows.items():
            assert (r["width"], r["height"]) == (8, 6)
            exp_r = float(np.broadcast_to((did + xs) % 256, (6, 8)).mean())
            exp_g = float(np.broadcast_to((did * 2 + ys) % 256, (6, 8)).mean())
            exp_b = float(((xs * ys + did) % 256).mean())
            assert abs(r["mean_r"] - exp_r) < 1e-9
            assert abs(r["mean_g"] - exp_g) < 1e-9
            assert abs(r["mean_b"] - exp_b) < 1e-9

    def test_bmp_resize_nearest_neighbor(self, spark):
        docs = spark.createDataFrame([(3,)], "doc_id long")
        media = multimodal.synthesize_bmp(docs, width=8, height=6)
        resized = multimodal.resize_bmp(media, width=4, height=3)
        stats = multimodal.image_pixel_stats(resized).collect()[0]
        assert (stats["width"], stats["height"]) == (4, 3)
        # nearest-neighbor keeps exact source values: resized pixel (0,0)
        # must equal source pixel (0,0)
        from evm_indexer_spark.operators.multimodal import _bmp_decode

        src = _bmp_decode(bytes(media.collect()[0]["payload"]))
        out = _bmp_decode(bytes(resized.collect()[0]["payload"]))
        assert (out[0, 0] == src[0, 0]).all()

    def test_wav_is_a_real_riff_container(self, spark):
        docs = spark.createDataFrame([(1,)], "doc_id long")
        payload = bytes(
            multimodal.synthesize_wav(docs).collect()[0]["payload"]
        )
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"

    def test_bmp_decode_rejects_non_bmp(self):
        import pytest as _pytest

        from evm_indexer_spark.operators.multimodal import _bmp_decode

        with _pytest.raises(ValueError, match="not a BMP"):
            _bmp_decode(b"JUNKJUNKJUNK")


class TestPngCodec:
    """PNG implemented from the public W3C spec on stdlib zlib — all
    five scanline filters on decode, filter-0 encode, 8-bit
    gray/RGB/RGBA, non-interlaced."""

    def test_roundtrip_identity_rgb_rgba_gray(self):
        import numpy as np

        from evm_indexer_spark.operators.multimodal import (
            _png_decode, _png_encode,
        )

        rng = np.random.RandomState(42)
        for shape in [(6, 8, 3), (5, 7, 4), (4, 9)]:
            px = rng.randint(0, 256, size=shape).astype(np.uint8)
            back = _png_decode(_png_encode(px))
            assert back.shape == px.shape
            assert (back == px).all()

    def test_decode_all_filter_types(self):
        """Hand-build an image whose rows are filtered with types
        1,2,3,4 and check the decode reverses each (our encoder only
        emits type 0, so this exercises the spec paths a foreign
        encoder would produce)."""
        import struct
        import zlib

        import numpy as np

        from evm_indexer_spark.operators.multimodal import (
            _PNG_SIG, _png_chunk, _png_decode,
        )

        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
        bpp = 3
        raw = bytearray()
        prev = np.zeros(px.shape[1] * bpp, dtype=np.int32)
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            row = px[y].ravel().astype(np.int32)
            filt = np.empty_like(row)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (row[i] - pred) & 0xFF
            raw.append(ftype)
            raw += filt.astype(np.uint8).tobytes()
            prev = row
        ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
        data = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        assert (_png_decode(data) == px).all()

    def test_png_pixel_stats_spark(self, spark):
        import numpy as np

        docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        media = multimodal.synthesize_png(docs, width=8, height=6)
        rows = {r["doc_id"]: r for r in
                multimodal.image_pixel_stats(media).collect()}
        xs = np.arange(8)
        ys = np.arange(6)[:, None]
        for did, r in rows.items():
            d = int(did)
            assert (r["width"], r["height"]) == (8, 6)
            exp_r = np.broadcast_to((d + xs) % 256, (6, 8)).mean()
            exp_g = np.broadcast_to((d * 2 + ys) % 256, (6, 8)).mean()
            exp_b = ((xs * ys + d) % 256).mean()
            assert abs(r["mean_r"] - exp_r) < 1e-9
            assert abs(r["mean_g"] - exp_g) < 1e-9
            assert abs(r["mean_b"] - exp_b) < 1e-9

    def test_png_resize_keeps_format(self, spark):
        from evm_indexer_spark.operators.multimodal import (
            _PNG_SIG, _png_decode,
        )

        docs = spark.createDataFrame([(3,)], "doc_id long")
        media = multimodal.synthesize_png(docs, width=8, height=6)
        resized = multimodal.resize_image_payloads(media, 4, 3)
        buf = bytes(resized.collect()[0]["payload"])
        assert buf.startswith(_PNG_SIG)
        src = _png_decode(bytes(media.collect()[0]["payload"]))
        out = _png_decode(buf)
        assert out.shape == (3, 4, 3)
        assert (out == src[::2, ::2]).all()

    def test_rgba_stats_ignore_alpha(self, spark):
        docs = spark.createDataFrame([(1,)], "doc_id long")
        media = multimodal.synthesize_png(docs, width=4, height=4, rgba=True)
        r = multimodal.image_pixel_stats(media).collect()[0]
        assert r["width"] == 4 and r["height"] == 4

    def test_decode_image_batch_real_for_png(self):
        import pandas as pd

        from evm_indexer_spark.operators.multimodal import _png_encode
        import numpy as np

        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        out = multimodal.decode_image_batch(pd.Series([_png_encode(px)]))
        assert out.loc[0, "width"] == 4 and out.loc[0, "height"] == 4
        assert (out.loc[0, "pixels"] == px.astype(np.float32).ravel()).all()

    def test_mixed_format_batch(self, spark):
        """One media table carrying BMP and PNG payloads side by side —
        the sniffing decode handles both in a single Arrow batch."""
        docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
        bmp = multimodal.synthesize_bmp(docs.filter("doc_id < 2"), 8, 6)
        png = multimodal.synthesize_png(docs.filter("doc_id >= 2"), 8, 6)
        stats = multimodal.image_pixel_stats(bmp.unionByName(png)).collect()
        assert len(stats) == 4
        by_id = {r["doc_id"]: r for r in stats}
        # same pixel formula -> same stats regardless of container
        ref = {r["doc_id"]: r for r in multimodal.image_pixel_stats(
            multimodal.synthesize_bmp(docs, 8, 6)).collect()}
        for did in range(4):
            for ch in ("mean_r", "mean_g", "mean_b"):
                assert abs(by_id[did][ch] - ref[did][ch]) < 1e-9


class TestPerRowRefusal:
    """Round-15 adversarial-media rule: one corrupt payload in a corpus
    must degrade to a NULL-feature row, never fail the job — for every
    decode-side operator, across the hostile classes (truncation,
    bit-flip, zero-length, wrong magic, header-dims >> data, CRC
    mismatch, NULL payload)."""

    def _mix(self, spark, good_df, hostile: dict):
        """good rows from *good_df* (doc_id < 100) + hostile payloads
        keyed by doc_id (>= 900)."""
        import pandas as pd

        rows = good_df.select("doc_id", "payload").toPandas()
        add = pd.DataFrame(
            {"doc_id": list(hostile), "payload": list(hostile.values())}
        )
        return spark.createDataFrame(
            pd.concat([rows, add], ignore_index=True),
            schema="doc_id long, payload binary",
        )

    def test_flac_features_degrade_per_row(self, spark):
        docs = spark.range(0, 3).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_flac(docs, n_samples=64)
        ok = bytes(media.collect()[0]["payload"])
        # CRC mismatch: flip one bit deep in the frame body
        crc_bad = bytearray(ok)
        crc_bad[-3] ^= 0x40
        hostile = {
            900: b"",                          # zero-length
            901: b"RIFF" + ok[4:],             # wrong magic
            902: ok[: len(ok) // 2],           # truncated
            903: bytes(crc_bad),               # CRC mismatch
            904: None,                         # NULL payload
        }
        out = multimodal.flac_features(
            self._mix(spark, media, hostile)
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert len(by_id) == 8
        for did in (0, 1, 2):
            assert by_id[did]["n_samples"] == 64
        for did in hostile:
            r = by_id[did]
            assert r["sample_rate"] is None and r["n_samples"] is None
            assert r["peak"] is None and r["s_sum"] is None

    def test_h264_features_degrade_per_row(self, spark):
        docs = spark.range(0, 2).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_h264(docs, width=16, height=16, n_frames=1)
        ok = bytes(media.collect()[0]["payload"])
        hostile = {
            900: b"\x00\x00\x00\x01",          # bare start code
            901: ok[:20],                      # truncated inside SPS
            902: b"",                          # zero-length
            903: bytes(b ^ 0xFF for b in ok[:64]) + ok[64:],  # bit-flipped
        }
        out = multimodal.h264_frame_features(
            self._mix(spark, media, hostile)
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[0]["n_frames"] == 1 and by_id[0]["width"] == 16
        for did in hostile:
            assert by_id[did]["y_sum"] is None and by_id[did]["width"] is None
        # budgeted mode labels refusals decoded=false
        outb = multimodal.h264_frame_features(
            self._mix(spark, media, hostile), decode_budget_bytes=10**6
        ).collect()
        bb = {r["doc_id"]: r for r in outb}
        assert bb[0]["decoded"] is True
        for did in hostile:
            assert bb[did]["decoded"] is False

    def test_wav_features_degrade_per_row(self, spark):
        docs = spark.range(0, 2).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_wav(docs, n_samples=80)
        ok = bytes(media.collect()[0]["payload"])
        # header-dims >> data: RIFF size field says 2^30, body truncated
        big_hdr = bytearray(ok[:64])
        big_hdr[4:8] = (2**30).to_bytes(4, "little")
        hostile = {
            900: b"",
            901: b"JUNK" + ok[4:],
            902: bytes(big_hdr),
            903: None,
        }
        out = multimodal.wav_features(
            self._mix(spark, media, hostile)
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[0]["n_samples"] == 80
        for did in hostile:
            assert by_id[did]["sample_rate"] is None

    def test_image_ops_degrade_per_row(self, spark):
        docs = spark.range(0, 2).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_png(docs, width=8, height=6)
        ok = bytes(media.collect()[0]["payload"])
        # CRC mismatch: corrupt one byte inside IDAT (after the 8-byte
        # signature + IHDR); header-dims >> data: IHDR claims 2^24 px
        crc_bad = bytearray(ok)
        crc_bad[len(ok) // 2] ^= 0x01
        huge = bytearray(ok)
        huge[16:20] = (2**24).to_bytes(4, "big")  # IHDR width
        hostile = {
            900: b"",
            901: b"\x89PNG\r\n\x1a\n",         # signature only
            902: ok[:30],                       # truncated
            903: bytes(crc_bad),                # CRC mismatch
            904: bytes(huge),                   # header dims >> data
            905: b"GIF89a" + ok[6:],            # wrong magic
        }
        mixed = self._mix(spark, media, hostile)
        stats = {r["doc_id"]: r for r in multimodal.image_pixel_stats(mixed).collect()}
        assert stats[0]["width"] == 8
        for did in hostile:
            assert stats[did]["mean_r"] is None and stats[did]["width"] is None
        ext = {r["doc_id"]: r for r in multimodal.image_pixel_extremes(mixed).collect()}
        assert ext[0]["px_sum"] is not None
        for did in hostile:
            assert ext[did]["px_sum"] is None
        rz = {
            r["doc_id"]: r["payload"]
            for r in multimodal.resize_image_payloads(mixed, 4, 3).collect()
        }
        assert rz[0] is not None
        for did in hostile:
            assert rz[did] is None


class TestHostileMediaIds:
    """Round-15 hostile-media fixture finds, pinned: negative/zero
    doc_ids must flow through the media formula surface on BOTH the
    classification and the slicing paths."""

    def _docs(self, spark):
        rows = [(-4, "negative video"), (-3, "negative image"),
                (-2, "neg"), (-1, "zero frames video"), (0, "zero id"),
                (22, ""), (7, "plain audio doc body")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_media_type_total_on_negative_ids(self, spark):
        # sign-preserving % drove element_at to index 0 (a runtime
        # error) before the pmod fix; every id must classify
        out = {r["doc_id"]: r["media_type"]
               for r in multimodal.media_metadata(self._docs(spark)).collect()}
        assert out[-4] == "video" and out[-3] == "image"
        assert out[-1] == "video" and out[0] == "image"
        assert out[7] == "audio"

    def test_negative_or_zero_n_frames_yield_no_rows(self, spark):
        # sequence(0, k<0) DESCENDS in Spark where generate_series is
        # empty — phantom negative frame indices must not appear
        media = multimodal.synthesize_media(self._docs(spark))
        offs = multimodal.frame_offsets(media).collect()
        by_id = {}
        for r in offs:
            by_id.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert -1 not in by_id  # n_frames = 0
        assert -4 not in by_id  # n_frames = -3
        assert all(i >= 0 for v in by_id.values() for i in v)

    def test_empty_audio_payload_yields_no_chunks(self, spark):
        media = multimodal.synthesize_media(self._docs(spark))
        chunks = multimodal.audio_chunk_offsets(media).collect()
        assert all(r["doc_id"] != 22 for r in chunks)  # empty payload
        assert any(r["doc_id"] == 7 for r in chunks)   # real audio doc


class TestFusedRoundtrips:
    """The fused synth+decode kernels must be ROW-IDENTICAL to the
    two-stage composition they replace (round-15 optimization: the
    q68/q69/q72 entries now run one Arrow task instead of two)."""

    def _docs(self, spark):
        # include ids past the per-formula periods (256 for jpeg/h264)
        # so the content memo's hit path is exercised, not just misses
        return spark.range(0, 300).select(F.col("id").alias("doc_id"))

    def _sorted(self, df):
        return [tuple(r) for r in df.orderBy("doc_id").collect()]

    def test_flac_roundtrip_matches_composition(self, spark):
        docs = self._docs(spark)
        fused = multimodal.flac_roundtrip_stats(docs, n_samples=256)
        staged = multimodal.flac_features(
            multimodal.synthesize_flac(docs, n_samples=256)
        )
        assert fused.schema == staged.schema
        assert self._sorted(fused) == self._sorted(staged)

    def test_jpeg_roundtrip_matches_composition(self, spark):
        docs = self._docs(spark)
        fused = multimodal.jpeg_roundtrip_stats(
            docs, width=32, height=24, quality=100
        )
        staged = multimodal.image_pixel_extremes(
            multimodal.synthesize_jpeg(docs, width=32, height=24, quality=100)
        )
        assert fused.schema == staged.schema
        assert self._sorted(fused) == self._sorted(staged)

    def test_h264_roundtrip_matches_composition(self, spark):
        docs = self._docs(spark)
        fused = multimodal.h264_roundtrip_stats(
            docs, width=32, height=16, n_frames=2
        )
        staged = multimodal.h264_frame_features(
            multimodal.synthesize_h264(docs, width=32, height=16, n_frames=2)
        )
        assert fused.schema == staged.schema
        assert self._sorted(fused) == self._sorted(staged)


def test_class_partition_guard_reverts_to_round_robin(spark):
    """Round-15 ADVICE: hashing a small congruence-class domain into a
    pool that is not well below it leaves partitions empty/skewed - the
    router must fall back to round-robin there, and keep the class
    hash when the pool is comfortably narrower than the domain."""
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    wide = multimodal._class_partitioned_ids(df, 8)  # 8 classes << pool
    assert "RoundRobinPartitioning" in wide._jdf.queryExecution().toString()
    narrow = multimodal._class_partitioned_ids(df, 2048)
    s = narrow._jdf.queryExecution().toString()
    assert "pmod" in s and "RoundRobinPartitioning" not in s
