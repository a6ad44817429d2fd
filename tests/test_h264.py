"""H.264 I_PCM subset codec (functions/h264codec.py) and its Spark
plumbing (multimodal.synthesize_h264 / h264_frame_features).

I_PCM is lossless, so the spine is unconditional bit-exactness:
decode(encode(y, cb, cr)) == (y, cb, cr) for every uint8 clip whose
dimensions are multiples of 16. Around it: Annex B framing variants
(3- vs 4-byte start codes, trailing zeros), emulation prevention on
real zero runs, hand-built spec streams exercising decoder breadth the
encoder never emits (poc_type 0, frame cropping, multi-slice
pictures), and honest subset guardrails (CABAC / P slices /
entropy-coded macroblocks raise, never mis-decode)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from evm_indexer_spark.functions.h264codec import (
    _BitReader,
    _BitWriter,
    _ebsp_to_rbsp,
    _nal,
    _pps_rbsp,
    _rbsp_to_ebsp,
    _sps_rbsp,
    h264_decode,
    h264_encode,
)
from evm_indexer_spark.operators import multimodal
from evm_indexer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# -- bit IO / Exp-Golomb ----------------------------------------------------


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    values = [0, 1, 2, 3, 7, 25, 255, 1000]
    for v in values:
        w.ue(v)
    svalues = [0, 1, -1, 3, -7, 100, -255]
    for v in svalues:
        w.se(v)
    w.trailing_bits()
    r = _BitReader(w.getvalue())
    assert [r.ue() for _ in values] == values
    assert [r.se() for _ in svalues] == svalues


def test_emulation_prevention_exact_patterns():
    # the spec patterns: 00 00 00 / 00 00 01 / 00 00 02 / 00 00 03
    for tail in range(4):
        rbsp = bytes([0, 0, tail])
        ebsp = _rbsp_to_ebsp(rbsp)
        assert ebsp == bytes([0, 0, 3, tail])
        assert _ebsp_to_rbsp(ebsp) == rbsp
    # 00 00 04 needs no escape
    assert _rbsp_to_ebsp(b"\x00\x00\x04") == b"\x00\x00\x04"
    # long zero runs: an escape every second zero, lossless both ways
    run = bytes(8) + b"\x01"
    assert _ebsp_to_rbsp(_rbsp_to_ebsp(run)) == run
    assert b"\x00\x00\x00" not in _rbsp_to_ebsp(run)


# -- round-trips ------------------------------------------------------------


def test_random_clip_roundtrip_exact():
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (4, 48, 32), dtype=np.uint8)
    cb = rng.integers(0, 256, (4, 24, 16), dtype=np.uint8)
    cr = rng.integers(0, 256, (4, 24, 16), dtype=np.uint8)
    dy, dcb, dcr = h264_decode(h264_encode(y, cb, cr))
    assert (dy == y).all() and (dcb == cb).all() and (dcr == cr).all()


def test_zero_planes_roundtrip_through_emulation_prevention():
    # all-zero planes produce maximal 00-runs in the PCM payload — the
    # EP path runs on real data, and the stream still parses cleanly
    y = np.zeros((2, 16, 16), dtype=np.uint8)
    cb = np.zeros((2, 8, 8), dtype=np.uint8)
    buf = h264_encode(y, cb, cb)
    dy, dcb, dcr = h264_decode(buf)
    assert (dy == 0).all() and (dcb == 0).all() and (dcr == 0).all()


def test_single_frame_2d_input_and_default_chroma():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    dy, dcb, dcr = h264_decode(h264_encode(y))
    assert dy.shape == (1, 16, 32)
    assert (dy[0] == y).all()
    assert (dcb == 128).all() and (dcr == 128).all()


def test_annex_b_framing_variants():
    y = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    buf = h264_encode(y)
    assert buf.startswith(b"\x00\x00\x00\x01")
    # 3-byte start codes and trailing zeros are equally conforming
    parts = buf.split(b"\x00\x00\x00\x01")[1:]
    three = b"".join(b"\x00\x00\x01" + p for p in parts) + b"\x00\x00"
    dy, _, _ = h264_decode(three)
    assert (dy[0] == y[0]).all()


# -- hand-built streams: decoder breadth beyond the encoder ------------------


def _sps_custom(mbs_w, mbs_h, poc_type=2, crop=None) -> bytes:
    w = _BitWriter()
    w.u(66, 8)
    w.u(0x80, 8)
    w.u(10, 8)
    w.ue(0)
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4 -> 4 bits
    w.ue(0)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(mbs_w - 1)
    w.ue(mbs_h - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)
    if crop:
        w.u(1, 1)
        for v in crop:
            w.ue(v)
    else:
        w.u(0, 1)
    w.u(0, 1)  # no VUI
    w.trailing_bits()
    return w.getvalue()


def _slice_rbsp(first_mb, n_mbs, mbs_w, fill, poc_type=2, idr=True) -> bytes:
    w = _BitWriter()
    w.ue(first_mb)
    w.ue(7)  # I slice, all-I picture
    w.ue(0)  # pps id
    w.u(0, 4)  # frame_num
    if idr:
        w.ue(0)  # idr_pic_id
    if poc_type == 0:
        w.u(0, 4)  # pic_order_cnt_lsb
    if idr:
        # dec_ref_pic_marking, IDR form (nal_ref_idc != 0)
        w.u(0, 1)  # no_output_of_prior_pics_flag
        w.u(0, 1)  # long_term_reference_flag
    w.se(0)  # slice_qp_delta
    for mb in range(first_mb, first_mb + n_mbs):
        w.ue(25)
        w.align()
        w.bytes_aligned(bytes([fill + mb]) * 256)
        w.bytes_aligned(bytes([64 + mb]) * 64)
        w.bytes_aligned(bytes([65 + mb]) * 64)
    w.trailing_bits()
    return w.getvalue()


def test_multi_slice_picture_decodes():
    # 2x1-MB picture split across two slices — the encoder always emits
    # one slice per picture, so this pins the first_mb_in_slice path
    buf = (
        _nal(7, 3, _sps_custom(2, 1))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, _slice_rbsp(0, 1, 2, fill=10))
        + _nal(5, 3, _slice_rbsp(1, 1, 2, fill=10))
    )
    y, cb, cr = h264_decode(buf)
    assert y.shape == (1, 16, 32)
    assert (y[0, :, :16] == 10).all() and (y[0, :, 16:] == 11).all()
    assert (cb[0, :, :8] == 64).all() and (cb[0, :, 8:] == 65).all()
    assert (cr[0, :, :8] == 65).all() and (cr[0, :, 8:] == 66).all()


def test_poc_type0_slice_header():
    buf = (
        _nal(7, 3, _sps_custom(1, 1, poc_type=0))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, _slice_rbsp(0, 1, 1, fill=42, poc_type=0))
    )
    y, _, _ = h264_decode(buf)
    assert (y == 42).all()


def test_frame_cropping_applies_in_420_units():
    # crop 2 luma columns left, 4 right, 2 rows top, 0 bottom
    buf = (
        _nal(7, 3, _sps_custom(1, 1, crop=(1, 2, 1, 0)))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, _slice_rbsp(0, 1, 1, fill=9))
    )
    y, cb, cr = h264_decode(buf)
    assert y.shape == (1, 14, 10)  # 16-2 rows, 16-2-4 cols
    assert cb.shape == (1, 7, 5) and cr.shape == (1, 7, 5)


def _pps_custom(deblocking=0, redundant=0) -> bytes:
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)  # CAVLC
    w.u(0, 1)  # bottom_field_poc
    w.ue(0)  # one slice group
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(deblocking, 1)
    w.u(0, 1)
    w.u(redundant, 1)
    w.trailing_bits()
    return w.getvalue()


def test_pps_gated_slice_header_fields_decode():
    # a conforming encoder commonly sets deblocking_filter_control_
    # present_flag (adding 3 slice-header fields) and may set
    # redundant_pic_cnt_present_flag — both must parse, or every real
    # stream bit-misaligns at the first macroblock
    w = _BitWriter()
    w.ue(0)  # first_mb
    w.ue(7)  # I
    w.ue(0)  # pps id
    w.u(0, 4)  # frame_num
    w.ue(0)  # idr_pic_id
    w.ue(0)  # redundant_pic_cnt (flag set in PPS)
    w.u(0, 1)  # no_output_of_prior_pics_flag
    w.u(0, 1)  # long_term_reference_flag
    w.se(0)  # slice_qp_delta
    w.ue(0)  # disable_deblocking_filter_idc = 0 -> offsets follow
    w.se(1)  # slice_alpha_c0_offset_div2
    w.se(-1)  # slice_beta_offset_div2
    w.ue(25)
    w.align()
    w.bytes_aligned(bytes([7]) * 256)
    w.bytes_aligned(bytes([8]) * 64)
    w.bytes_aligned(bytes([9]) * 64)
    w.trailing_bits()
    buf = (
        _nal(7, 3, _sps_custom(1, 1))
        + _nal(8, 3, _pps_custom(deblocking=1, redundant=1))
        + _nal(5, 3, w.getvalue())
    )
    y, cb, cr = h264_decode(buf)
    # (deblocking never alters all-I_PCM output: qP is 0 for PCM
    # macroblocks and the alpha/beta thresholds vanish at qP 0)
    assert (y == 7).all() and (cb == 8).all() and (cr == 9).all()


def _non_idr_mmco_slice(ops, fill=33) -> bytes:
    """Hand-built non-IDR I slice with an adaptive dec_ref_pic_marking
    (MMCO) sequence followed by one I_PCM macroblock. *ops* is a list
    of (op, args...) tuples WITHOUT the terminating op 0."""
    w = _BitWriter()
    w.ue(0)  # first_mb
    w.ue(7)  # I slice, all-I picture
    w.ue(0)  # pps id
    w.u(1, 4)  # frame_num 1 (non-IDR)
    w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag
    for op, *args in ops:
        w.ue(op)
        for a in args:
            w.ue(a)
    w.ue(0)  # MMCO terminator
    w.se(0)  # slice_qp_delta
    w.ue(25)  # I_PCM
    w.align()
    w.bytes_aligned(bytes([fill]) * 256)
    w.bytes_aligned(bytes([fill + 1]) * 64)
    w.bytes_aligned(bytes([fill + 2]) * 64)
    w.trailing_bits()
    return w.getvalue()


def test_non_idr_mmco_parses_and_decodes():
    """Conformance: every MMCO op shape from table 7-9 — sliding-window
    marks (1), long-term ops (2/3/4/6), and the reset op (5, no
    payload) — must parse so the bit position reaches the macroblock
    data exactly; in an intra-only stream the ops' DPB effects are
    vacuous, so the decoded planes must equal the IDR picture's."""
    ops = [
        (1, 0),   # mark short-term unused: difference_of_pic_nums_minus1
        (2, 3),   # mark long-term pic unused: long_term_pic_num
        (3, 1, 0),  # short->long: diff_minus1 + long_term_frame_idx
        (4, 2),   # max_long_term_frame_idx_plus1
        (5,),     # reset: no payload
        (6, 1),   # current->long: long_term_frame_idx
    ]
    buf = (
        _nal(7, 3, _sps_custom(1, 1))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, _slice_rbsp(0, 1, 1, fill=33))
        + _nal(1, 3, _non_idr_mmco_slice(ops, fill=33))
    )
    y, cb, cr = h264_decode(buf)
    assert y.shape == (2, 16, 16)
    assert (y[0] == y[1]).all() and (y == 33).all()
    # the MMCO slice's own payload decodes bit-exactly (chroma fills
    # differ per helper: _slice_rbsp writes 64/65, this slice 34/35)
    assert (cb[1] == 34).all() and (cr[1] == 35).all()
    assert (cb[0] == 64).all() and (cr[0] == 65).all()


def test_non_idr_mmco_invalid_op_is_corrupt_not_skipped():
    buf = (
        _nal(7, 3, _sps_custom(1, 1))
        + _nal(8, 3, _pps_rbsp())
        + _nal(1, 3, _non_idr_mmco_slice([(7,)]))
    )
    with pytest.raises(ValueError, match="memory_management_control"):
        h264_decode(buf)


# -- honest guardrails ------------------------------------------------------


def test_non_multiple_of_16_raises():
    with pytest.raises(ValueError, match="multiples of 16"):
        h264_encode(np.zeros((1, 17, 16), dtype=np.uint8))


def test_cabac_pps_raises_not_implemented():
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode_flag = CABAC
    w.u(0, 1)
    w.trailing_bits()
    buf = (
        _nal(7, 3, _sps_custom(1, 1))
        + _nal(8, 3, w.getvalue())
        + _nal(5, 3, _slice_rbsp(0, 1, 1, fill=1))
    )
    with pytest.raises(NotImplementedError, match="CABAC"):
        h264_decode(buf)


def test_p_slice_raises_not_implemented():
    w = _BitWriter()
    w.ue(0)
    w.ue(5)  # slice_type P (all-P picture)
    w.ue(0)
    w.u(0, 4)
    w.trailing_bits()
    buf = _nal(7, 3, _sps_custom(1, 1)) + _nal(1, 2, w.getvalue())
    with pytest.raises(NotImplementedError, match="I slices"):
        h264_decode(buf)


def test_entropy_coded_macroblock_raises_not_implemented():
    w = _BitWriter()
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)  # no_output_of_prior_pics_flag
    w.u(0, 1)  # long_term_reference_flag
    w.se(0)
    w.ue(0)  # mb_type 0 = I_4x4: needs CAVLC residuals
    w.trailing_bits()
    buf = _nal(7, 3, _sps_custom(1, 1)) + _nal(5, 3, w.getvalue())
    with pytest.raises(NotImplementedError, match="I_PCM"):
        h264_decode(buf)


def test_truncated_and_corrupt_streams_fail_loudly():
    y = np.zeros((1, 16, 16), dtype=np.uint8)
    buf = h264_encode(y)
    with pytest.raises(ValueError):
        h264_decode(buf[: len(buf) // 2])
    with pytest.raises(ValueError):
        h264_decode(b"\x12\x34\x56\x78")  # no start codes
    bad = bytearray(buf)
    bad[4] |= 0x80  # forbidden_zero_bit on the SPS NAL
    with pytest.raises(ValueError, match="forbidden"):
        h264_decode(bytes(bad))


# -- Spark plumbing (q72 shape) ----------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(24)


def test_synthesize_h264_decodes_to_formula(spark, docs):
    media = multimodal.synthesize_h264(docs, width=32, height=16, n_frames=2)
    rows = media.collect()
    assert len(rows) == 24
    for r in rows:
        y, cb, cr = h264_decode(bytes(r["payload"]))
        did = r["doc_id"]
        f = np.arange(2)[:, None, None]
        rr = np.arange(16)[None, :, None]
        cc = np.arange(32)[None, None, :]
        exp = ((did * 13 + f * 97 + rr * 5 + cc * 3) % 256).astype(np.uint8)
        assert (y == exp).all()
        for i in range(2):
            assert (cb[i] == (did * 5 + i * 11) % 256).all()
            assert (cr[i] == (did * 9 + i * 7) % 256).all()


def test_h264_frame_features_matches_formula(spark, docs):
    media = multimodal.synthesize_h264(docs, width=32, height=16, n_frames=2)
    feats = {r["doc_id"]: r for r in multimodal.h264_frame_features(media).collect()}
    f = np.arange(2)[:, None, None]
    rr = np.arange(16)[None, :, None]
    cc = np.arange(32)[None, None, :]
    for did, r in feats.items():
        exp = (did * 13 + f * 97 + rr * 5 + cc * 3) % 256
        assert r["n_frames"] == 2 and r["width"] == 32 and r["height"] == 16
        assert r["y_min"] == int(exp.min())
        assert r["y_max"] == int(exp.max())
        assert r["y_sum"] == int(exp.sum())


def test_hypothesis_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 3),
        mw=st.integers(1, 3),
        mh=st.integers(1, 2),
        data=st.data(),
    )
    def prop(n, mw, mh, data):
        shape_y = (n, mh * 16, mw * 16)
        shape_c = (n, mh * 8, mw * 8)
        y = data.draw(arrays(np.uint8, shape_y))
        cb = data.draw(arrays(np.uint8, shape_c))
        cr = data.draw(arrays(np.uint8, shape_c))
        dy, dcb, dcr = h264_decode(h264_encode(y, cb, cr))
        assert (dy == y).all() and (dcb == cb).all() and (dcr == cr).all()

    prop()


def test_h264_header_dims_sps_only():
    """SPS-only dims: matches decode shapes (incl. frame cropping), and
    parses streams whose SLICES the I_PCM subset refuses — the metadata
    path stays available where full decode is out of scope."""
    from evm_indexer_spark.functions.h264codec import h264_header_dims

    buf = (
        _nal(7, 3, _sps_rbsp(2, 1))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, _slice_rbsp(0, 2, 1, fill=9))
    )
    y, _, _ = h264_decode(buf)
    assert h264_header_dims(buf) == (y.shape[1], y.shape[2]) == (16, 32)
    cropped = (
        _nal(7, 3, _sps_custom(1, 1, crop=(1, 2, 1, 0)))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, _slice_rbsp(0, 1, 1, fill=9))
    )
    yc, _, _ = h264_decode(cropped)
    assert h264_header_dims(cropped) == (yc.shape[1], yc.shape[2]) == (14, 10)
    # SPS+PPS only, no slices: full decode refuses, header dims answer
    hdr_only = _nal(7, 3, _sps_rbsp(2, 1)) + _nal(8, 3, _pps_rbsp())
    with pytest.raises(ValueError):
        h264_decode(hdr_only)
    assert h264_header_dims(hdr_only) == (16, 32)
    with pytest.raises(ValueError):
        h264_header_dims(_nal(8, 3, _pps_rbsp()))  # no SPS at all


def test_h264_features_decode_budget_cap_route(spark, docs):
    from pyspark.sql import functions as F

    eight = docs.filter(F.col("doc_id") < 4)
    media = multimodal.synthesize_h264(eight, width=32, height=16, n_frames=2)
    base = {r["doc_id"]: r for r in multimodal.h264_frame_features(media).collect()}
    full = {
        r["doc_id"]: r
        for r in multimodal.h264_frame_features(
            media, decode_budget_bytes=10**7
        ).collect()
    }
    for did, r in full.items():
        b = base[did]
        assert r["decoded"] is True
        assert tuple(r)[:7] == tuple(b)[:7]
    capped = {
        r["doc_id"]: r
        for r in multimodal.h264_frame_features(
            media, decode_budget_bytes=64
        ).collect()
    }
    for did, r in capped.items():
        assert r["decoded"] is False
        assert (r["height"], r["width"]) == (16, 32)
        assert r["n_frames"] is None and r["y_sum"] is None
