"""MPEG-1 I/P/B/D codec (functions/mpeg1.py): spec-table spot checks,
roundtrip SNR across quantizer scales, DC prediction, escape coding,
forward and bidirectional motion compensation (half-pel search, skip
election, f_code residuals, full-pel mode, reorder buffer), DC-only D
pictures, honest gates, and the mutation-fuzz ValueError-only
contract."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.mpeg1 import (
    INTRA_QUANT,
    decode_m1v,
    encode_m1v,
)


def _frame(i, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(2 * np.pi * (xx / w + i * 0.13)) + 40 * np.cos(
        2 * np.pi * yy / h
    )
    return np.stack(
        [np.clip(base, 0, 255), np.clip(base[::-1], 0, 255),
         np.clip(255 - base, 0, 255)],
        axis=-1,
    ).astype(np.uint8)


def _snr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(
        (a.astype(np.float64) ** 2).sum() / max((err**2).sum(), 1e-9)
    )


def test_intra_quant_matrix_is_the_spec_table():
    # corners + diagonal of ISO 11172-2 §2.4.4.2's default matrix
    assert INTRA_QUANT[0, 0] == 8 and INTRA_QUANT[0, 7] == 34
    assert INTRA_QUANT[7, 0] == 27 and INTRA_QUANT[7, 7] == 83
    assert list(np.diag(INTRA_QUANT)) == [8, 16, 26, 27, 32, 40, 56, 83]
    assert INTRA_QUANT.sum() == int(INTRA_QUANT.sum())  # int table


def test_roundtrip_quality_by_qscale():
    frames = [_frame(i) for i in range(3)]
    prev_bytes = None
    # the ceiling is the witness's 4:2:0 chroma subsample (~27.5 dB on
    # these saturated-color gradients), not the quantizer
    for qscale, floor in ((2, 26.0), (4, 25.0), (8, 22.0)):
        es = encode_m1v(frames, qscale=qscale)
        meta, dec = decode_m1v(es)
        assert meta == {"width": 48, "height": 32, "fps": 30.0,
                        "n_frames": 3, "n_i": 3, "n_p": 0, "n_b": 0, "n_d": 0}
        for a, b in zip(frames, dec):
            assert _snr(a, b) > floor
        if prev_bytes is not None:
            assert len(es) < prev_bytes  # coarser quant -> smaller stream
        prev_bytes = len(es)


def test_fps_codes():
    es = encode_m1v([_frame(0)], fps_code=3)
    assert decode_m1v(es)[0]["fps"] == 25.0
    with pytest.raises(ValueError, match="picture_rate"):
        encode_m1v([_frame(0)], fps_code=0)


def test_dc_prediction_spans_macroblocks():
    """A constant-color frame leans entirely on DC prediction (every
    AC level is 0, every DC diff after the first is 0) — decode must
    reproduce it almost exactly."""
    flat = np.full((32, 64, 3), 153, dtype=np.uint8)
    meta, dec = decode_m1v(encode_m1v([flat], qscale=8))
    assert np.abs(dec[0].astype(int) - 153).max() <= 2


def test_escape_levels_roundtrip():
    """Hard edges at qscale 1 force large AC levels through both
    escape forms (8-bit and 16-bit)."""
    f = np.zeros((16, 16, 3), dtype=np.uint8)
    f[:, 8:] = 255  # maximal step inside a single macroblock
    meta, dec = decode_m1v(encode_m1v([f], qscale=1))
    assert _snr(f, dec[0]) > 20.0


def test_gates():
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_m1v([np.zeros((30, 32, 3), dtype=np.uint8)])
    with pytest.raises(ValueError, match="at least one"):
        encode_m1v([])
    with pytest.raises(ValueError, match="quantizer_scale"):
        encode_m1v([_frame(0)], qscale=0)
    es = bytearray(encode_m1v([_frame(0)]))
    # flip picture_coding_type I -> reserved (3 bits after the 10-bit
    # temporal ref in the picture header): find the picture start code
    at = bytes(es).find(b"\x00\x00\x01\x00") + 4
    es[at + 1] = (es[at + 1] & ~0x38) | 0x28  # type bits 101 = reserved
    with pytest.raises(ValueError, match="forbidden MPEG-1 picture"):
        decode_m1v(bytes(es))
    # ... while I -> P/B are DECODED now, but either without its
    # reference frame(s) before it is a hard error
    es[at + 1] = (es[at + 1] & ~0x38) | 0x10  # type bits 010 = P
    with pytest.raises(ValueError, match="P picture before any I"):
        decode_m1v(bytes(es))
    es[at + 1] = (es[at + 1] & ~0x38) | 0x18  # type bits 011 = B
    with pytest.raises(ValueError, match="B picture without two"):
        decode_m1v(bytes(es))
    with pytest.raises(ValueError):
        decode_m1v(b"\x00\x00\x01\xb3" + b"\x00" * 3)  # truncated header
    with pytest.raises(ValueError):
        decode_m1v(b"not mpeg at all")


def test_custom_quantizer_matrices_roundtrip():
    """Stream-loaded quantizer matrices (r12 — the gate is gone): the
    64 values ride in the sequence header, reconstruction uses them,
    and an all-16 intra matrix demonstrably changes the coded bits vs
    the default Table §2.4.4.2 matrix."""
    im = np.full((8, 8), 16, dtype=np.int64)
    im[0, 0] = 8
    nim = np.full((8, 8), 24, dtype=np.int64)
    fs = [_frame(i) for i in range(3)]
    es = encode_m1v(fs, qscale=4, p_frames=True,
                    intra_matrix=im, non_intra_matrix=nim)
    meta, dec = decode_m1v(es)
    assert meta["n_p"] == 2
    for a, b in zip(fs, dec):
        assert _snr(a, b) > 20.0
    assert es != encode_m1v(fs, qscale=4, p_frames=True)
    # malformed in-stream matrices are loud: a zero entry and a bad
    # intra anchor both reject
    with pytest.raises(ValueError, match="1..255"):
        encode_m1v(fs[:1], intra_matrix=np.zeros((8, 8), dtype=int))
    bad = np.full((8, 8), 16, dtype=np.int64)  # [0,0] != 8
    with pytest.raises(ValueError, match="start at 8"):
        encode_m1v(fs[:1], intra_matrix=bad)
    # decoder side: flipping the load bit makes the decoder read
    # picture bytes as a matrix -> loud ValueError, never a misparse
    esb = bytearray(encode_m1v([_frame(0)]))
    esb[4 + 7] |= 0x02  # load_intra_quantizer_matrix
    with pytest.raises(ValueError):
        decode_m1v(bytes(esb))


def test_fuzz_mpeg1_contract():
    from tests.test_fuzz_contracts import _assert_contract

    es = encode_m1v([_frame(0, 32, 32), _frame(1, 32, 32)], qscale=4)
    _assert_contract("m1v", es, decode_m1v)


def test_split_m1v_frames_byte_exact():
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_frames,
        split_m1v_header,
    )

    es = encode_m1v([_frame(i) for i in range(4)], qscale=4)
    parts = split_m1v_frames(es)
    assert len(parts) == 4
    assert b"".join(parts) == es
    # later parts each start at a picture start code
    for p in parts[1:]:
        assert p.startswith(b"\x00\x00\x01\x00")
    private, pics = split_m1v_header(es)
    assert private + b"".join(pics) == es
    assert private.startswith(b"\x00\x00\x01\xb3")
    assert len(pics) == 4
    with pytest.raises(ValueError):
        split_m1v_frames(b"\x00\x00\x01\xb3" + bytes(8))


def test_mpeg1_in_avi_container():
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        decode_avi_frames,
        parse_avi,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_frames,
    )

    frames_in = [_frame(i) for i in range(3)]
    es = encode_m1v(frames_in, fps_code=3, qscale=4)
    avi = build_avi(split_m1v_frames(es), 48, 32, "MPG1", fps_rate=25)
    meta = parse_avi(avi)
    assert meta["codec"] == "MPG1"
    assert (meta["width"], meta["height"]) == (48, 32)
    _meta, dec = decode_avi_frames(avi)
    direct = decode_m1v(es)[1]
    assert len(dec) == 3
    for a, b in zip(dec, direct):
        assert (a == b).all()  # container decode == direct decode
    for fr, ref in zip(dec, frames_in):
        assert _snr(np.stack([ref]), np.stack([fr])) > 18.0


def test_mpeg1_in_matroska_container():
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_frames,
        parse_ebml,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_header,
    )

    es = encode_m1v([_frame(i) for i in range(5)], qscale=2)
    private, pics = split_m1v_header(es)
    mkv = build_mkv_mjpeg(
        [(i * 40, p) for i, p in enumerate(pics)],
        48, 32,
        codec_id="V_MPEG1",
        codec_private=private,
        frames_per_cluster=2,
    )
    meta = parse_ebml(mkv)
    assert meta["tracks"][0]["codec_id"] == "V_MPEG1"
    assert meta["tracks"][0]["codec_private"] == private
    _meta, decoded = decode_mkv_frames(mkv)
    direct = decode_m1v(es)[1]
    assert [ts for _t, ts, _f in decoded] == [0, 40, 80, 120, 160]
    for (_t, _ts, fr), d in zip(decoded, direct):
        assert (fr == d).all()


def test_mpeg1_matroska_without_codec_private_raises():
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_frames,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_header,
    )

    es = encode_m1v([_frame(0)], qscale=4)
    _private, pics = split_m1v_header(es)
    mkv = build_mkv_mjpeg(
        [(0, pics[0])], 48, 32, codec_id="V_MPEG1"
    )
    with pytest.raises(ValueError, match="CodecPrivate"):
        decode_mkv_frames(mkv)


def test_mpeg1_in_mp4_container():
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        decode_mp4_frames,
        mp4_samples,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_header,
    )

    es = encode_m1v([_frame(i) for i in range(3)], fps_code=3, qscale=4)
    private, pics = split_m1v_header(es)
    mp4 = build_mp4_mjpeg(
        [(3600, p) for p in pics], 48, 32,
        codec="mp4v", decoder_config=private,
    )
    meta, _samples = mp4_samples(mp4)
    assert meta["codec"] == "mp4v"
    assert meta["oti"] == 0x6A
    assert meta["decoder_config"] == private
    assert (meta["width"], meta["height"]) == (48, 32)
    _m, decoded = decode_mp4_frames(mp4)
    direct = decode_m1v(es)[1]
    assert [ts for ts, _f in decoded] == [0, 40, 80]
    for (_ts, fr), d in zip(decoded, direct):
        assert (fr == d).all()


def test_mp4_mpeg1_gates():
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_esds,
        build_mp4_mjpeg,
        decode_mp4_frames,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_header,
    )

    es = encode_m1v([_frame(0)], qscale=4)
    private, pics = split_m1v_header(es)
    # a non-MPEG-1 OTI (0x20 = MPEG-4 Visual) must gate, not misread
    mp4 = build_mp4_mjpeg(
        [(3600, pics[0])], 48, 32, codec="mp4v", decoder_config=private
    )
    bad = mp4.replace(build_esds(0x6A, private), build_esds(0x20, private))
    assert bad != mp4
    with pytest.raises(NotImplementedError, match="objectTypeIndication"):
        decode_mp4_frames(bad)
    # a missing DecoderSpecificInfo is malformed, not a gate
    empty = build_mp4_mjpeg(
        [(3600, pics[0])], 48, 32, codec="mp4v", decoder_config=b""
    )
    with pytest.raises(ValueError, match="DecoderSpecificInfo"):
        decode_mp4_frames(empty)


# ---------------------------------------------------------------------------
# P frames (forward motion compensation)
# ---------------------------------------------------------------------------


def _moving(t, h=32, w=64):
    """Static background with a textured square translating 2 pel per
    frame — forces nonzero motion vectors and skip elections."""
    img = np.full((h, w, 3), 90, dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    sq = (120 + 6 * xx + 4 * yy).clip(0, 255).astype(np.uint8)
    x0 = 3 + 2 * t
    img[8:24, x0 : x0 + 16, 0] = sq
    img[8:24, x0 : x0 + 16, 1] = 255 - sq
    img[8:24, x0 : x0 + 16, 2] = sq[::-1]
    return img


def test_p_frames_roundtrip_and_compress():
    mf = [_moving(t) for t in range(4)]
    es_p = encode_m1v(mf, qscale=3, p_frames=True)
    es_i = encode_m1v(mf, qscale=3)
    meta, dec = decode_m1v(es_p)
    assert (meta["n_i"], meta["n_p"], meta["n_frames"]) == (1, 3, 4)
    for a, b in zip(mf, dec):
        assert _snr(a, b) > 18.0
    # motion compensation must beat intra coding on a translating scene
    assert len(es_p) < 0.75 * len(es_i)


def test_p_frames_skip_static_scene():
    """A fully static scene: every P macroblock is either skipped or a
    tiny refinement; later P frames converge bit-exactly."""
    img = (np.indices((32, 64)).sum(0) * 3 % 200 + 20).astype(np.uint8)
    st = np.stack([img, img[::-1], 255 - img], axis=-1)
    frames = [st.copy() for _ in range(6)]
    es = encode_m1v(frames, qscale=4, p_frames=True)
    es_one_i = encode_m1v(frames[:1], qscale=4)
    meta, dec = decode_m1v(es)
    assert meta["n_p"] == 5
    # 5 P frames together cost far less than one more I frame
    assert len(es) - len(es_one_i) < 0.6 * len(es_one_i)
    # refinement converges: the encoder only codes a residual block
    # when reconstruction strictly improves it, so frame-to-frame
    # churn must shrink and quality must never degrade
    churn = [(a != b).sum() for a, b in zip(dec[1:], dec[:-1])]
    assert churn[-1] < 0.25 * churn[0]
    snrs = [_snr(a, b) for a, b in zip(frames, dec)]
    assert min(snrs[1:]) >= snrs[0] - 1e-9  # P refines, never degrades


def test_p_frames_halfpel_translation():
    """Pure 1-pel horizontal translation of a vertically-constant
    pattern: MC predicts P frames near-exactly (the I frame is exact
    for this DCT-friendly content)."""
    wide = (np.arange(128) * 2 % 256).astype(np.uint8)

    def shifted(t):
        row = np.roll(wide, t)[:64]
        img = np.tile(row, (32, 1))
        return np.stack([img, img, img], axis=-1)

    mf = [shifted(t) for t in range(3)]
    meta, dec = decode_m1v(encode_m1v(mf, qscale=2, p_frames=True))
    assert meta["n_p"] == 2
    for a, b in zip(mf, dec):
        assert _snr(a, b) > 40.0


def test_p_frames_f_code_and_full_pel_variants():
    """forward_f_code > 1 re-codes the same vectors with residual bits
    (bit-identical reconstruction); full-pel mode stays close."""
    mf = [_moving(t) for t in range(4)]
    base = decode_m1v(encode_m1v(mf, qscale=3, p_frames=True))[1]
    alt = decode_m1v(
        encode_m1v(mf, qscale=3, p_frames=True, f_code=2)
    )[1]
    assert all(np.array_equal(a, b) for a, b in zip(base, alt))
    meta_fp, dec_fp = decode_m1v(
        encode_m1v(mf, qscale=3, p_frames=True, full_pel=True)
    )
    assert meta_fp["n_p"] == 3
    for a, b in zip(mf, dec_fp):
        assert _snr(a, b) > 18.0
    with pytest.raises(ValueError, match="forward_f_code"):
        encode_m1v(mf, p_frames=True, f_code=8)


def test_p_frame_vlc_tables_are_consistent():
    """Prefix-freeness + near-complete Kraft sums for the new Annex B
    tables, the published anchor rows, and the spec's Table B.1/B.4
    correspondence (increment 2n = mag(n)+'1', 2n+1 = mag(n)+'0')."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _ADDR_ESCAPE,
        _ADDR_INC,
        _ADDR_STUFFING,
        _CBP_CODES,
        _MOTION_MAG,
        _P_MB_TYPE,
    )

    def check(codes):
        assert len(set(codes)) == len(codes)
        for a in codes:
            for b in codes:
                assert a == b or not b.startswith(a), (a, b)
        return sum(2.0 ** -len(c) for c in codes)

    assert check(_MOTION_MAG.values()) > 0.98
    assert check(list(_ADDR_INC.values())
                 + [_ADDR_ESCAPE, _ADDR_STUFFING]) > 0.98
    assert check(_CBP_CODES.values()) > 0.99
    assert check(_P_MB_TYPE.keys()) > 0.98
    # anchors straight from the published tables
    assert _MOTION_MAG[0] == "1" and _MOTION_MAG[1] == "01"
    assert _MOTION_MAG[16] == "0000001100"
    assert _CBP_CODES[60] == "111" and _CBP_CODES[63] == "001100"
    assert _ADDR_INC[1] == "1" and _ADDR_INC[2] == "011"
    assert _ADDR_INC[33] == "00000011000"  # spec: '0000 0011 000'
    assert sorted(_CBP_CODES) == list(range(1, 64))
    assert sorted(_ADDR_INC) == list(range(1, 34))


def test_fuzz_mpeg1_p_frame_contract():
    from tests.test_fuzz_contracts import _assert_contract

    es = encode_m1v(
        [_moving(t, 32, 32) for t in range(3)], qscale=4, p_frames=True
    )
    _assert_contract("m1v-p", es, decode_m1v)


# ---------------------------------------------------------------------------
# B frames (bidirectional motion compensation)
# ---------------------------------------------------------------------------


def test_b_frames_roundtrip_and_reorder():
    """IPB schedule: anchors every 3 display frames, B pictures
    transmitted AFTER their future anchor. decode_m1v must reorder
    back to display order — per-frame SNR against the DISPLAY-order
    source is the witness (a reorder bug pairs a B with the wrong
    source frame and craters its SNR)."""
    mf = [_moving(t) for t in range(7)]
    es = encode_m1v(mf, qscale=3, p_frames=True, b_frames=2)
    meta, dec = decode_m1v(es)
    assert (meta["n_i"], meta["n_p"], meta["n_b"]) == (1, 2, 4)
    assert meta["n_frames"] == 7
    for a, b in zip(mf, dec):
        assert _snr(a, b) > 18.0
    # transmit order differs from display order: the 2nd picture in
    # the stream is an anchor (P of display frame 3), and the stream
    # still beats all-intra coding
    es_i = encode_m1v(mf, qscale=3)
    assert len(es) < 0.7 * len(es_i)


def test_b_frames_static_scene_skips():
    """A static scene makes every B macroblock an exact interpolation
    repeat — skip elections keep B pictures tiny."""
    img = (np.indices((32, 64)).sum(0) * 5 % 190 + 30).astype(np.uint8)
    st = np.stack([img, 255 - img, img[::-1]], axis=-1)
    frames = [st.copy() for _ in range(7)]
    es_b = encode_m1v(frames, qscale=4, p_frames=True, b_frames=2)
    meta, dec = decode_m1v(es_b)
    assert meta["n_b"] == 4
    snr0 = _snr(frames[0], dec[0])
    for a, b in zip(frames[1:], dec[1:]):
        assert _snr(a, b) >= snr0 - 1.0
    # the 4 B pictures together cost less than one anchor
    es_p = encode_m1v(frames, qscale=4, p_frames=True, b_frames=0)
    assert len(es_b) < len(es_p) + 400


def test_b_mb_type_table_is_consistent():
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _B_MB_TYPE,
    )

    codes = list(_B_MB_TYPE)
    assert len(set(codes)) == len(codes)
    for a in codes:
        for b in codes:
            assert a == b or not b.startswith(a), (a, b)
    assert sum(2.0 ** -len(c) for c in codes) > 0.98
    # anchor rows from Table B.2c
    assert _B_MB_TYPE["10"] == (0, 1, 1, 0, 0)   # interpolated
    assert _B_MB_TYPE["11"] == (0, 1, 1, 1, 0)   # interpolated + coded
    assert _B_MB_TYPE["00011"] == (0, 0, 0, 0, 1)  # intra


def test_b_frames_gates():
    mf = [_moving(t) for t in range(4)]
    with pytest.raises(ValueError, match="requires p_frames"):
        encode_m1v(mf, b_frames=2)
    with pytest.raises(ValueError, match="half-pel only"):
        encode_m1v(mf, p_frames=True, b_frames=1, full_pel=True)


def test_fuzz_mpeg1_b_frame_contract():
    from tests.test_fuzz_contracts import _assert_contract

    es = encode_m1v(
        [_moving(t, 32, 32) for t in range(5)],
        qscale=4, p_frames=True, b_frames=1,
    )
    _assert_contract("m1v-b", es, decode_m1v)


# ---------------------------------------------------------------------------
# D pictures (DC-only fast-forward preview type)
# ---------------------------------------------------------------------------


def test_d_pictures_roundtrip():
    """D pictures carry only DC coefficients: every decoded 8x8 block
    is flat at its source block's rounded mean, and a whole frame
    costs a few dozen bytes."""
    yy, xx = np.mgrid[0:32, 0:64]
    frames = []
    for t in range(3):
        base = (80 + xx * 2 + yy + 8 * t).clip(0, 255).astype(np.uint8)
        frames.append(np.stack(
            [base, (base * 0.9 + 10).astype(np.uint8),
             (200 - base * 0.5).astype(np.uint8)], axis=-1))
    es = encode_m1v(frames, qscale=4, d_pictures=True)
    meta, dec = decode_m1v(es)
    assert (meta["n_d"], meta["n_i"], meta["n_frames"]) == (3, 0, 3)
    assert len(es) < 100 * len(frames)  # DC-only: tiny
    for a, b in zip(frames, dec):
        assert _snr(a, b) > 20.0
    # flat-block invariant + exact DC: each luma 8x8 equals the
    # rounded mean of the source block's luma
    from articulation_vector_db_api_spark.functions.jpeg import (
        _rgb_to_ycbcr,
    )

    src_y = _rgb_to_ycbcr(frames[0])[:, :, 0]
    got = dec[0]
    ycc_got = _rgb_to_ycbcr(got)[:, :, 0]
    for by in range(0, 32, 8):
        for bx in range(0, 64, 8):
            blk = ycc_got[by : by + 8, bx : bx + 8]
            assert blk.std() < 2.0  # flat up to RGB roundtrip rounding
            assert abs(blk.mean()
                       - np.rint(src_y[by : by + 8, bx : bx + 8].mean())
                       ) < 2.0


def test_d_pictures_gates():
    f = [np.zeros((16, 16, 3), dtype=np.uint8)] * 2
    with pytest.raises(ValueError, match="either D pictures or I/P/B"):
        encode_m1v(f, p_frames=True, d_pictures=True)
    # end_of_macroblock must be 1: flipping it breaks decode loudly
    es = bytearray(encode_m1v(f[:1], d_pictures=True))
    with pytest.raises(ValueError):
        decode_m1v(bytes(es[:-2]))  # truncated mid-macroblock


def test_fuzz_mpeg1_d_picture_contract():
    from tests.test_fuzz_contracts import _assert_contract

    yy, xx = np.mgrid[0:32, 0:32]
    fr = np.stack([(60 + xx * 3).clip(0, 255)] * 3, -1).astype(np.uint8)
    es = encode_m1v([fr, fr], qscale=4, d_pictures=True)
    _assert_contract("m1v-d", es, decode_m1v, n=100)


def test_mc_displacements_full_pel_doubles_before_chroma_halving():
    """§2.4.4.2: full_pel doubles the RECONSTRUCTED vector first, and
    §2.4.4.3 halves the resulting luma displacement for chroma — so an
    odd coded vector under full_pel gives chroma exactly half the luma
    displacement (3 -> luma 6 half-pel, chroma 3), NOT trunc-half of
    the coded value scaled after (which would displace chroma by one
    half-pel: trunc_half(3)*2 = 2)."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _mc_displacements,
    )

    # (vx, vy, full_pel) -> (luma_hvy, luma_hvx, chroma_hvy, chroma_hvx)
    assert _mc_displacements(3, -3, 1) == (-6, 6, -3, 3)
    assert _mc_displacements(-1, 1, 1) == (2, -2, 1, -1)
    # even vectors and half-pel mode are unchanged by the ordering
    assert _mc_displacements(2, -4, 1) == (-8, 4, -4, 2)
    assert _mc_displacements(3, -3, 0) == (-3, 3, -1, 1)


def test_full_pel_odd_vector_roundtrip():
    """A textured colored square translating 3 pel per frame under
    full_pel codes an ODD vector — the case where chroma displacement
    ordering matters; colored content pins the chroma prediction end
    to end."""

    def moving3(t, h=32, w=64):
        img = np.full((h, w, 3), 90, dtype=np.uint8)
        yy, xx = np.mgrid[0:16, 0:16]
        sq = (120 + 6 * xx + 4 * yy).clip(0, 255).astype(np.uint8)
        x0 = 3 + 3 * t
        img[8:24, x0 : x0 + 16, 0] = sq
        img[8:24, x0 : x0 + 16, 1] = 255 - sq
        img[8:24, x0 : x0 + 16, 2] = sq[::-1]
        return img

    mf = [moving3(t) for t in range(3)]
    meta, dec = decode_m1v(
        encode_m1v(mf, qscale=2, p_frames=True, full_pel=True, search=8)
    )
    assert meta["n_p"] == 2
    for a, b in zip(mf, dec):
        assert _snr(a, b) > 16.0


def test_search_motion_full_pel_odd_search_stays_representable():
    """An odd ``search`` under full_pel must not evaluate half-pel
    candidates it can't code: every returned vector re-expands to a
    displacement that was actually scored (no encoder drift), so the
    odd-search result equals the aligned even-search result."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _search_motion,
    )

    yy, xx = np.mgrid[0:64, 0:64]
    ref = ((yy * 7 + xx * 13) % 256).astype(np.int64)
    cur = ref[16 + 2 : 16 + 18, 16 - 2 : 16 + 14]  # true shift (+2, -2) px
    v_odd = _search_motion(cur, ref, 16, 16, 5, 1)
    v_even = _search_motion(cur, ref, 16, 16, 4, 1)
    assert v_odd == v_even == (2, -2)
    # end-to-end: odd search with full_pel still roundtrips cleanly
    mf = [_moving(t) for t in range(3)]
    meta, dec = decode_m1v(
        encode_m1v(mf, qscale=3, p_frames=True, full_pel=True, search=5)
    )
    assert meta["n_p"] == 2
    for a, b in zip(mf, dec):
        assert _snr(a, b) > 15.0


def test_user_data_and_extension_start_codes_skipped():
    """Real archival .mpg streams carry encoder-signature user_data
    (0xB2) and extension (0xB5) payloads at sequence level and between
    picture header and first slice; the decoder skips them instead of
    raising (payloads contain no start-code emulation by spec)."""
    frames = [_frame(i) for i in range(2)]
    es = encode_m1v(frames, qscale=4)
    clean = decode_m1v(es)[1]

    user_data = b"\x00\x00\x01\xb2" + b"engine witness encoder v12"
    extension = b"\x00\x00\x01\xb5" + b"\x12\x34\x56"
    # sequence level: after the GOP header, before the first picture
    first_pic = es.index(b"\x00\x00\x01\x00")
    # between picture header and first slice of the SECOND picture
    second_pic = es.index(b"\x00\x00\x01\x00", first_pic + 4)
    first_slice_after = es.index(b"\x00\x00\x01\x01", second_pic)
    salted = (
        es[:first_pic] + user_data + es[first_pic:first_slice_after]
        + extension + es[first_slice_after:]
    )
    meta, dec = decode_m1v(salted)
    assert meta["n_frames"] == 2
    for a, b in zip(clean, dec):
        assert (a == b).all()


def test_full_b5c_table_structure_and_anchors():
    """The r12 full Table B.5c transcription: 111 rows, globally
    prefix-free alongside EOB/escape, one CONTIGUOUS codeword block
    per code length (the structural property the transcription is
    expressed through), exact agreement with the independently-
    verified short rows, and published anchor rows."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _AC_BLOCKS,
        _AC_INV,
        _AC_TABLE,
    )

    assert len(_AC_TABLE) == 111 and len(_AC_INV) == 111
    codes = list(_AC_TABLE) + ["10", "000001"]  # + EOB + escape
    for a in codes:  # prefix-freeness
        for b in codes:
            assert a == b or not b.startswith(a), (a, b)
    # dense blocks: per length, used codewords are one integer range
    for length, (first, rls) in _AC_BLOCKS.items():
        vals = sorted(
            int(c, 2) for c in _AC_TABLE if len(c) == length
        )
        assert vals == list(range(first, first + len(rls)))
    # every (run, level) unique; run<=31, level<=40 (spec bounds)
    assert max(r for r, _l in _AC_INV) == 31
    assert max(ll for _r, ll in _AC_INV) == 40
    # short rows (verified in r10/r11) unchanged
    assert _AC_TABLE["11"] == (0, 1) and _AC_TABLE["011"] == (1, 1)
    assert _AC_TABLE["0100"] == (0, 2) and _AC_TABLE["0000101"] == (9, 1)
    # published deep anchors (ISO 11172-2 Table B.5c continued)
    assert _AC_INV[(0, 5)] == "00100110"
    assert _AC_INV[(10, 1)] == "00100111"
    assert _AC_INV[(0, 7)] == "0000001010"
    assert _AC_INV[(1, 4)] == "0000001100"
    assert _AC_INV[(0, 8)] == "000000011101"
    assert _AC_INV[(17, 1)] == "000000011111"
    assert _AC_INV[(0, 12)] == "0000000011010"
    assert _AC_INV[(0, 16)] == "00000000011111"
    assert _AC_INV[(0, 31)] == "00000000010000"
    assert _AC_INV[(0, 40)] == "000000000010000"
    assert _AC_INV[(1, 8)] == "000000000011111"
    assert _AC_INV[(1, 18)] == "0000000000010000"
    assert _AC_INV[(31, 1)] == "0000000000011011"


def test_deep_b5c_rows_roundtrip():
    """The encoder now emits table rows before escaping, so a busy
    high-contrast scene exercises deep rows end to end; every coded
    (run, |level|<=40, run<=31) combination must roundtrip through
    its table code bit-exactly vs the escape-only equivalent."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _AC_INV,
        _BitReader,
        _BitWriter,
        _read_run_level,
        _write_run_level,
    )

    # unit: every table row + both signs decodes back to itself
    for (run, level), _code in sorted(_AC_INV.items()):
        for sgn in (1, -1):
            w = _BitWriter()
            _write_run_level(w, run, sgn * level)
            w.write_code("10")  # EOB terminator
            r = _BitReader(w.bytes())
            got = _read_run_level(r)
            assert got == (run, sgn * level), (run, level, sgn, got)
    # end to end: busy grayscale texture (chroma flat, so 4:2:0 does
    # not cap the SNR) must actually USE deep rows — counted through a
    # probe dict — and still decode at near-lossless qscale 1
    from articulation_vector_db_api_spark.functions import mpeg1 as m

    class _Probe(dict):
        hits = 0

        def get(self, key, default=None):
            code = dict.get(self, key, default)
            if code is not None and len(code) >= 10:
                _Probe.hits += 1
            return code

    yy, xx = np.mgrid[0:32, 0:48]
    fr = ((yy * 31 + xx * 57) % 256).astype(np.uint8)
    frames = [np.stack([fr, fr, fr], -1)] * 2
    orig = m._AC_INV
    m._AC_INV = _Probe(orig)
    try:
        es = encode_m1v(frames, qscale=1)
    finally:
        m._AC_INV = orig
    assert _Probe.hits > 0  # deep (10-16 bit) rows exercised
    meta, dec = decode_m1v(es)
    assert meta["n_frames"] == 2
    for a, b in zip(frames, dec):
        assert _snr(a, b) > 25.0


def test_sparse_dequant_matches_dense_twin():
    """r16 optimization: the decode loop's sparse integer dequant must
    be bit-identical to the dense numpy reference twin over random
    sparsity patterns, qscales, and stream-loaded matrices."""
    import random

    import numpy as np

    import articulation_vector_db_api_spark.functions.mpeg1 as m1

    rng = random.Random(13)
    for _ in range(400):
        n = rng.randrange(0, 20)
        idxs = sorted(rng.sample(range(1, 64), min(n, 63)))
        pairs = [(i, rng.randrange(-255, 256) or 1) for i in idxs]
        qscale = rng.randrange(1, 32)
        if rng.random() < 0.4:
            wq = np.asarray(
                [rng.randrange(1, 256) for _ in range(64)], dtype=np.int64
            )
            wq[0] = 8
            wql = m1._wq_list(wq)
        else:
            wq, wql = m1._WQ_ZZ, m1._WQ_ZZ_LIST
        qdc = rng.randrange(-300, 556)
        dense = np.zeros(64, dtype=np.int64)
        dense[0] = qdc
        for i, lv in pairs:
            dense[i] = lv
        assert np.array_equal(
            m1._dequant_intra(dense, qscale, wq),
            m1._dequant_intra_sparse(qdc, pairs, qscale, wql),
        )
        idxs2 = sorted(rng.sample(range(0, 64), min(n, 63)))
        pairs2 = [(i, rng.randrange(-255, 256)) for i in idxs2]
        wq_ni, wql_ni = (
            (wq, wql) if wq is not m1._WQ_ZZ
            else (m1._WQ_NI_FLAT, m1._WQ_NI_LIST)
        )
        dense2 = np.zeros(64, dtype=np.int64)
        for i, lv in pairs2:
            dense2[i] = lv
        assert np.array_equal(
            m1._dequant_nonintra(dense2, qscale, wq_ni),
            m1._dequant_nonintra_sparse(pairs2, qscale, wql_ni),
        )
