"""MPEG-2 I/P/B frame-picture codec (functions/mpeg2.py): extension
parsing, the Table 7-6 quantiser ladders, extended DC-size tables
(completeness-pinned), §7.4.4 mismatch control, the 6+12-bit escape,
roundtrip SNR over the q_scale_type × dc_precision grid, honest
interlaced/scalable gates, and the mutation-fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.mpeg2 import (
    decode_m2v,
    encode_m2v,
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


def _moving(t, h=32, w=64):
    img = np.full((h, w, 3), 90, dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    sq = (120 + 6 * xx + 4 * yy).clip(0, 255).astype(np.uint8)
    x0 = 3 + 2 * t
    img[8:24, x0 : x0 + 16, 0] = sq
    img[8:24, x0 : x0 + 16, 1] = 255 - sq
    img[8:24, x0 : x0 + 16, 2] = sq[::-1]
    return img


def _snr(a, b):
    a = np.stack(a).astype(np.float64)
    b = np.stack(b).astype(np.float64)
    return 10 * np.log10((a**2).sum() / max(((a - b) ** 2).sum(), 1e-9))


def test_dc_size_ladders_are_complete_prefix_codes():
    """Tables B-12/B-13: the three extended rows are DERIVED from the
    completeness requirement — Kraft sum must be exactly 1 for both
    ladders, which no wrong termination can satisfy."""
    from fractions import Fraction

    from articulation_vector_db_api_spark.functions.mpeg2 import (
        _DC_CHROMA2,
        _DC_LUMA2,
    )

    for tab in (_DC_LUMA2, _DC_CHROMA2):
        assert sorted(tab) == list(range(12))
        codes = list(tab.values())
        for a in codes:  # prefix-free
            for b in codes:
                assert a == b or not b.startswith(a)
        kraft = sum(Fraction(1, 2 ** len(c)) for c in codes)
        assert kraft == 1
        # the MPEG-1 rows are a strict subset
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _DC_CHROMA,
        _DC_LUMA,
    )

    assert all(_DC_LUMA2[k] == v for k, v in _DC_LUMA.items())
    assert all(_DC_CHROMA2[k] == v for k, v in _DC_CHROMA.items())


def test_quantiser_scale_ladders():
    """Table 7-6: linear column = 2·code; non-linear column is the
    published {1..8, +2 to 24, +4 to 56, +8 to 112} ladder."""
    from articulation_vector_db_api_spark.functions.mpeg2 import (
        _Q_NONLINEAR,
        _map_qscale,
    )

    assert _map_qscale(1, 0) == 2 and _map_qscale(31, 0) == 62
    assert _Q_NONLINEAR[1:9] == (1, 2, 3, 4, 5, 6, 7, 8)
    assert _Q_NONLINEAR[9:17] == (10, 12, 14, 16, 18, 20, 22, 24)
    assert _Q_NONLINEAR[17:25] == (28, 32, 36, 40, 44, 48, 52, 56)
    assert _Q_NONLINEAR[25:] == (64, 72, 80, 88, 96, 104, 112)
    assert _map_qscale(31, 1) == 112
    with pytest.raises(ValueError):
        _map_qscale(0, 0)


def test_mismatch_control_parity():
    """§7.4.4: F[7][7]'s LSB toggles exactly when the saturated sum is
    even — +1 for even values, −1 for odd (two's-complement XOR)."""
    from articulation_vector_db_api_spark.functions.mpeg2 import _mismatch

    m = np.zeros((8, 8), dtype=np.int64)
    _mismatch(m)  # sum 0 (even) -> toggle 0 -> +1
    assert m[7, 7] == 1
    _mismatch(m)  # sum 1 (odd) -> no toggle
    assert m[7, 7] == 1
    m[0, 0] = 3
    _mismatch(m)  # sum 4 (even), F77 odd -> -1
    assert m[7, 7] == 0
    m[:, :] = 0
    m[7, 7] = -4
    _mismatch(m)  # sum -4 even, F77 even negative -> -3
    assert m[7, 7] == -3


def test_escape_12bit_roundtrip():
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _BitReader,
        _BitWriter,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import (
        _read_run_level2,
        _write_run_level2,
    )

    for run, level in ((0, 2047), (63, -2047), (5, 41), (2, -100)):
        w = _BitWriter()
        _write_run_level2(w, run, level)
        w.write_code("10")
        assert _read_run_level2(_BitReader(w.bytes())) == (run, level)
    w = _BitWriter()
    with pytest.raises(ValueError, match="escape level"):
        from articulation_vector_db_api_spark.functions.mpeg2 import (
            _write_escape2,
        )

        _write_escape2(w, 0, 0)


def test_roundtrip_i_only_full_grid():
    fs = [_frame(i) for i in range(2)]
    sizes = []
    for qst in (0, 1):
        for prec in (8, 9, 10, 11):
            es = encode_m2v(
                fs, qscale_code=2, q_scale_type=qst, dc_precision=prec
            )
            meta, dec = decode_m2v(es)
            assert meta["n_i"] == 2 and meta["n_frames"] == 2
            assert meta["dc_precision"] == prec
            assert meta["progressive"] == 1
            assert _snr(fs, dec) > 22.0
            sizes.append(len(es))
    assert len(set(sizes)) > 1  # the grid actually changes the coding


def test_roundtrip_p_frames_and_mc_compresses():
    mf = [_moving(t) for t in range(4)]
    es = encode_m2v(
        mf, qscale_code=2, p_frames=True, f_code=2,
        q_scale_type=1, dc_precision=10,
    )
    meta, dec = decode_m2v(es)
    assert (meta["n_i"], meta["n_p"], meta["n_b"]) == (1, 3, 0)
    assert _snr(mf, dec) > 17.0
    es_intra = encode_m2v(mf, qscale_code=2, q_scale_type=1,
                          dc_precision=10)
    assert len(es) < len(es_intra)  # motion compensation predicts


def test_roundtrip_b_frames_display_order():
    mf = [_moving(t) for t in range(7)]
    es = encode_m2v(mf, qscale_code=3, p_frames=True, b_frames=2)
    meta, dec = decode_m2v(es)
    assert meta["n_frames"] == 7 and meta["n_b"] == 4
    assert _snr(mf, dec) > 16.0
    # display order: each decoded frame matches ITS source best
    for t, (a, b) in enumerate(zip(mf, dec)):
        others = [
            _snr([mf[u]], [b]) for u in range(7) if u != t
        ]
        assert _snr([a], [b]) >= max(others) - 1e-9, t


def test_mpeg1_cross_routing():
    """An MPEG-1 stream (no sequence_extension) is a loud ValueError
    here, and an MPEG-2 stream raises in decode_m1v — the container
    routers can dispatch on the error."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        decode_m1v,
        encode_m1v,
    )

    m1 = encode_m1v([_frame(0)], qscale=4)
    with pytest.raises(ValueError, match="use decode_m1v"):
        decode_m2v(m1)
    m2 = encode_m2v([_frame(0)], qscale_code=2)
    with pytest.raises(ValueError):
        decode_m1v(m2)


def test_interlaced_and_scalable_gates():
    es = bytearray(encode_m2v([_frame(0)], qscale_code=2))
    # picture_coding_extension: 4 (id) + 16 (f_codes) + 2 (precision)
    # = 22 bits, picture_structure at bits 22-23 of the payload
    at = bytes(es).find(b"\x00\x00\x01\xb5", 12)  # second 0xB5
    at = bytes(es).find(b"\x00\x00\x01\xb5", at + 4) or at
    # locate the PICTURE coding extension (id nibble 0x8)
    p = 0
    while True:
        p = bytes(es).find(b"\x00\x00\x01\xb5", p)
        if es[p + 4] >> 4 == 0x8:
            break
        p += 4
    base = (p + 4) * 8 + 4 + 16 + 2  # bit offset of picture_structure

    def with_bits(offset, width, value):
        out = bytearray(es)
        for k in range(width):
            bit = (value >> (width - 1 - k)) & 1
            i, j = divmod(offset + k, 8)
            if bit:
                out[i] |= 0x80 >> j
            else:
                out[i] &= ~(0x80 >> j) & 0xFF
        return bytes(out)

    with pytest.raises(NotImplementedError, match="field pictures"):
        decode_m2v(with_bits(base, 2, 1))  # top field
    # alternate_scan: structure(2)+tff(1)+fpfd(1)+conceal(1)+qst(1)
    # +ivlc(1) -> offset +7
    with pytest.raises(NotImplementedError, match="Table B-15"):
        decode_m2v(with_bits(base + 6, 1, 1))
    with pytest.raises(NotImplementedError, match="alternate scan"):
        decode_m2v(with_bits(base + 7, 1, 1))
    # chroma_format lives in the sequence_extension: id(4)+profile(8)
    # +progressive(1) -> bits 13-14 of ITS payload
    s = bytes(es).find(b"\x00\x00\x01\xb5")
    sbase = (s + 4) * 8 + 4 + 8 + 1
    with pytest.raises(NotImplementedError, match="chroma_format"):
        decode_m2v(with_bits(sbase, 2, 2))  # 4:2:2
    # D pictures are forbidden outright
    pic = bytes(es).find(b"\x00\x00\x01\x00") + 4
    bad = bytearray(es)
    bad[pic + 1] = (bad[pic + 1] & ~0x38) | 0x20  # type 100 = D
    with pytest.raises(ValueError, match="forbidden in MPEG-2|D pictures"):
        decode_m2v(bytes(bad))


def test_user_data_and_display_extensions_skipped():
    fs = [_frame(i) for i in range(2)]
    es = encode_m2v(fs, qscale_code=2)
    clean = decode_m2v(es)[1]
    user = b"\x00\x00\x01\xb2" + b"mpeg2 witness encoder"
    first_pic = es.index(b"\x00\x00\x01\x00")
    salted = es[:first_pic] + user + es[first_pic:]
    meta, dec = decode_m2v(salted)
    assert meta["n_frames"] == 2
    for a, b in zip(clean, dec):
        assert (a == b).all()


def test_encoder_arg_validation():
    f = [np.zeros((16, 16, 3), dtype=np.uint8)]
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_m2v([np.zeros((30, 32, 3), dtype=np.uint8)])
    with pytest.raises(ValueError, match="at least one"):
        encode_m2v([])
    with pytest.raises(ValueError, match="quantiser_scale_code"):
        encode_m2v(f, qscale_code=0)
    with pytest.raises(ValueError, match="intra_dc_precision"):
        encode_m2v(f, dc_precision=12)
    with pytest.raises(ValueError, match="f_code"):
        encode_m2v(f, p_frames=True, f_code=10)
    with pytest.raises(ValueError, match="b_frames requires"):
        encode_m2v(f, b_frames=1)


def test_fuzz_mpeg2_contract():
    from tests.test_fuzz_contracts import _assert_contract

    es = encode_m2v(
        [_frame(0, 32, 32), _frame(1, 32, 32)], qscale_code=3,
        q_scale_type=1, dc_precision=9,
    )
    _assert_contract("m2v", es, decode_m2v)


def test_mpeg2_in_all_three_containers():
    """Container routing (the r11 item-7 'container-routed' criterion):
    the same MPEG-2 elementary stream rides AVI (MPG2 fourcc),
    Matroska (V_MPEG2 + CodecPrivate) and MP4 (mp4v esds OTI 0x61),
    and each container decode equals the direct decode bit-for-bit."""
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        decode_avi_frames,
        parse_avi,
    )
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_frames,
    )
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        decode_mp4_frames,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_frames,
        split_m1v_header,
    )

    mf = [_moving(t) for t in range(4)]
    es = encode_m2v(mf, qscale_code=2, p_frames=True, fps_code=3)
    direct = decode_m2v(es)[1]

    avi = build_avi(split_m1v_frames(es), 64, 32, "MPG2", fps_rate=25)
    assert parse_avi(avi)["codec"] == "MPG2"
    _m, dec = decode_avi_frames(avi)
    assert len(dec) == 4
    for a, b in zip(dec, direct):
        assert (a == b).all()

    private, pics = split_m1v_header(es)
    mkv = build_mkv_mjpeg(
        [(i * 40, p) for i, p in enumerate(pics)], 64, 32,
        codec_id="V_MPEG2", codec_private=private,
        frames_per_cluster=2,
    )
    _m, decoded = decode_mkv_frames(mkv)
    assert len(decoded) == 4
    for (_t, _ts, fr), d in zip(decoded, direct):
        assert (fr == d).all()

    mp4 = build_mp4_mjpeg(
        [(3600, p) for p in pics], 64, 32,
        codec="mp4v", decoder_config=private, oti=0x61,
    )
    meta, frames = decode_mp4_frames(mp4)
    assert meta["oti"] == 0x61
    assert len(frames) == 4
    for (_ts, fr), d in zip(frames, direct):
        assert (fr == d).all()


def test_mp4_mpeg2_oti_gates():
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        decode_mp4_frames,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_header,
    )

    es = encode_m2v([_frame(0)], qscale_code=2)
    private, pics = split_m1v_header(es)
    mp4 = build_mp4_mjpeg(
        [(3600, p) for p in pics], 48, 32,
        codec="mp4v", decoder_config=private, oti=0x65,  # 4:2:2 profile
    )
    with pytest.raises(NotImplementedError, match="objectTypeIndication"):
        decode_mp4_frames(mp4)


def test_fpfd0_mode_bits_and_prediction_gates():
    """frame_pred_frame_dct = 0 macroblock_modes: frame_motion_type 2
    (frame-based) decodes; 0 is reserved (ValueError); field (1) and
    dual prime (3) gate honestly; dct_type reads only when a coded or
    intra macroblock follows."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _BitReader,
        _BitWriter,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import _M2Hooks

    hooks = _M2Hooks(0, 8, fpfd=0)

    def reader(bits):
        w = _BitWriter()
        for b in bits:
            w.write(int(b), 1)
        return _BitReader(w.bytes())

    assert hooks.read_mb_modes(reader("10" + "1"), True, False,
                               True, False) == (2, 1)
    assert hooks.read_mb_modes(reader("10"), True, False,
                               False, False) == (2, 0)
    assert hooks.read_mb_modes(reader("0"), False, False,
                               False, True) == (2, 0)
    # field-based prediction (fmt 1) now decodes; dual prime gates
    assert hooks.read_mb_modes(reader("01" + "1"), True, False,
                               True, False) == (1, 1)
    with pytest.raises(ValueError, match="reserved"):
        hooks.read_mb_modes(reader("00"), True, False, True, False)
    with pytest.raises(NotImplementedError, match="dual-prime"):
        hooks.read_mb_modes(reader("11"), False, True, True, False)
    # fpfd=1 reads nothing
    assert _M2Hooks(0, 8, fpfd=1).read_mb_modes(
        reader(""), True, True, True, False
    ) == (2, 0)


def _interlaced(t, h=32, w=64):
    """Two fields moving at DIFFERENT velocities — classic interlaced
    capture; rows couple within fields, not across them."""
    img = np.full((h, w, 3), 80, dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:16]
    sq = (110 + 7 * xx + 5 * yy).clip(0, 255).astype(np.uint8)
    x_top, x_bot = 2 + 3 * t, 40 - 3 * t
    img[8:24:2, x_top : x_top + 16, 0] = sq  # top field only
    img[9:24:2, x_bot : x_bot + 16, 0] = 255 - sq  # bottom field
    img[:, :, 1] = img[:, :, 0]
    img[:, :, 2] = img[:, :, 0]
    return img


def test_fpfd0_field_dct_roundtrip():
    """An interlaced scene under fpfd=0: the dct_type heuristic must
    actually ELECT field DCT somewhere (probed), the stream must
    roundtrip for I-only and IPPP, and field DCT must BEAT fpfd=1
    frame-DCT coding on interlaced content (the reason the tool
    exists)."""
    from articulation_vector_db_api_spark.functions import mpeg2 as m2

    mf = [_interlaced(t) for t in range(3)]
    elected = []
    orig = m2._M2Hooks.pick_dct_type

    def probe(self, res):
        d = orig(self, res)
        elected.append(d)
        return d

    m2._M2Hooks.pick_dct_type = probe
    try:
        es_i = encode_m2v(mf, qscale_code=2, fpfd=0)
        es_p = encode_m2v(mf, qscale_code=2, p_frames=True, fpfd=0)
    finally:
        m2._M2Hooks.pick_dct_type = orig
    assert 1 in elected  # field DCT actually used
    for es, want in ((es_i, (3, 0)), (es_p, (1, 2))):
        meta, dec = decode_m2v(es)
        assert (meta["n_i"], meta["n_p"]) == want
        assert meta["progressive"] == 0
        assert _snr(mf, dec) > 19.0, _snr(mf, dec)
    # the payoff: same scene, same quantizer, frame-DCT-only coding
    # (fpfd=1) costs more bits on interlaced content
    es_frame = encode_m2v(mf, qscale_code=2, fpfd=1)
    assert len(es_i) < len(es_frame)


def test_field_prediction_elected_and_roundtrips():
    """§7.6.4 field prediction in frame pictures: when the two fields
    move APART, per-field motion vectors with reference-field
    selection must (a) actually be elected by the witness encoder,
    (b) roundtrip through the decoder's §7.6.3 PMV discipline
    (vertical stored doubled), and (c) beat frame-only MC on the same
    scene at the same quantizer."""
    from articulation_vector_db_api_spark.functions import mpeg2 as m2

    mf = [_interlaced(t) for t in range(4)]
    fmts = []
    orig = m2._M2Hooks.write_mb_modes

    def probe(self, w, mfwd, mbwd, coded, intra, dct, fmt=2):
        if mfwd or mbwd:
            fmts.append(fmt)
        return orig(self, w, mfwd, mbwd, coded, intra, dct, fmt)

    m2._M2Hooks.write_mb_modes = probe
    try:
        es = encode_m2v(mf, qscale_code=2, p_frames=True, fpfd=0,
                        search=6)
    finally:
        m2._M2Hooks.write_mb_modes = orig
    assert 1 in fmts  # field MC actually elected somewhere
    meta, dec = decode_m2v(es)
    assert (meta["n_i"], meta["n_p"]) == (1, 3)
    s = _snr(mf, dec)
    assert s > 19.0, s
    # frame-only coding of the same scene must cost more bits: run the
    # frame-pred path (fpfd=1) at the same quantizer
    es_frame = encode_m2v(mf, qscale_code=2, p_frames=True, fpfd=1,
                          search=6)
    assert len(es) < len(es_frame), (len(es), len(es_frame))


def test_field_mv_pmv_discipline():
    """The decoder's field-vector reconstruction halves the stored
    PMV before prediction and stores the result doubled (§7.6.3.1) —
    pinned by reading back a two-MB hand sequence through read_mv."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _BitReader,
        _BitWriter,
        _write_motion,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import _M2Hooks

    hooks = _M2Hooks(0, 8, fpfd=0)
    w = _BitWriter()
    # MB1: field vectors (sel=1, vx=3, vy=-2) and (sel=0, vx=-1, vy=1)
    for sel, dx, dy in ((1, 3, -2), (0, -1, 1)):
        w.write(sel, 1)
        _write_motion(w, dx, 1)
        _write_motion(w, dy, 1)
    # MB2: deltas 0 — reconstructed vectors must equal MB1's exactly
    # (PMV vertical halves back to the field value)
    for sel in (1, 0):
        w.write(sel, 1)
        _write_motion(w, 0, 1)
        _write_motion(w, 0, 1)
    r = _BitReader(w.bytes())
    spec1, pmv = hooks.read_mv(r, [0, 0, 0, 0], 1, 1)
    assert spec1 == ("field", ((1, 3, -2), (0, -1, 1)))
    assert pmv == [3, -4, -1, 2]  # verticals stored doubled
    spec2, pmv2 = hooks.read_mv(r, pmv, 1, 1)
    assert spec2 == ("field", ((1, 3, -2), (0, -1, 1)))
    assert pmv2 == pmv


def test_repeated_sequence_header_and_quant_ext_gate():
    """A repeated sequence header mid-stream brings its own
    sequence_extension — it must SKIP, not misread as scalability;
    a quant_matrix_extension between picture extension and slices
    must GATE (it would change reconstruction)."""
    fs = [_frame(i) for i in range(2)]
    es = encode_m2v(fs, qscale_code=2)
    clean = decode_m2v(es)[1]
    # splice header + sequence_extension before the second picture
    first_pic = es.index(b"\x00\x00\x01\x00")
    second_pic = es.index(b"\x00\x00\x01\x00", first_pic + 4)
    header = es[:first_pic]
    salted = es[:second_pic] + header + es[second_pic:]
    meta, dec = decode_m2v(salted)
    assert meta["n_frames"] == 2
    for a, b in zip(clean, dec):
        assert (a == b).all()
    # a no-op quant_matrix_extension (id 0x3, all load flags 0)
    # before the first slice now LOADS (nothing) instead of gating
    # (r12) — output must be unchanged
    first_slice = es.index(b"\x00\x00\x01\x01")
    qext = b"\x00\x00\x01\xb5" + bytes([0x30]) + bytes(16)
    m3, dec3 = decode_m2v(es[:first_slice] + qext + es[first_slice:])
    assert m3["n_frames"] == 2
    for a, b in zip(clean, dec3):
        assert (a == b).all()


def test_fpfd0_b_frames_roundtrip():
    """B pictures under frame_pred_frame_dct = 0: mode bits flow
    through the shared B-slice writer (frame-based MC + per-MB
    dct_type) and the reorder buffer still lands display order."""
    mf = [_interlaced(t) for t in range(5)]
    es = encode_m2v(mf, qscale_code=2, p_frames=True, b_frames=1,
                    fpfd=0)
    meta, dec = decode_m2v(es)
    assert meta["n_frames"] == 5 and meta["n_b"] >= 1
    assert _snr(mf, dec) > 18.0, _snr(mf, dec)


def test_fuzz_mpeg2_fpfd0_contract():
    """Mutation fuzz over an interlaced fpfd=0 IPPP stream — the
    field-MV/field-DCT read paths honor the ValueError-only
    contract."""
    from tests.test_fuzz_contracts import _assert_contract

    mf = [_interlaced(t) for t in range(3)]
    es = encode_m2v(mf, qscale_code=2, p_frames=True, fpfd=0)
    _assert_contract("m2v-fpfd0", es, decode_m2v)


def test_per_axis_f_codes_decode():
    """Real encoders use different horizontal/vertical f_codes; the
    r12 symmetry gate is gone — read_mv honors an (fh, fv) pair for
    both frame and field formats."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _BitReader,
        _BitWriter,
        _write_motion,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import _M2Hooks

    hooks = _M2Hooks(0, 8, fpfd=0)
    # frame format: dx coded with f_code 1, dy with f_code 3
    w = _BitWriter()
    _write_motion(w, 2, 1)
    _write_motion(w, -9, 3)
    spec, pmv = hooks.read_mv(
        _BitReader(w.bytes()), [0, 0, 0, 0], (1, 3), 2
    )
    assert spec == (2, -9) and pmv == [2, -9, 2, -9]
    # field format with asymmetric codes
    w = _BitWriter()
    for sel, dx, dy in ((0, 1, -5), (1, -2, 6)):
        w.write(sel, 1)
        _write_motion(w, dx, 2)
        _write_motion(w, dy, 3)
    spec, pmv = hooks.read_mv(
        _BitReader(w.bytes()), [0, 0, 0, 0], (2, 3), 1
    )
    assert spec == ("field", ((0, 1, -5), (1, -2, 6)))
    assert pmv == [1, -10, -2, 12]


def test_custom_matrices_header_and_extension():
    """Stream-loaded quantizer matrices (r12): sequence-header loads
    apply from the start; a quant_matrix_extension spliced before a
    later picture's slices REBINDS reconstruction from that picture
    on; separate chroma matrices still gate (4:2:2 tool)."""
    im = np.full((8, 8), 16, dtype=np.int64)
    im[0, 0] = 8
    nim = np.full((8, 8), 24, dtype=np.int64)
    fs = [_frame(i) for i in range(3)]
    es = encode_m2v(fs, qscale_code=2, p_frames=True,
                    intra_matrix=im, non_intra_matrix=nim)
    meta, dec = decode_m2v(es)
    assert meta["n_p"] == 2 and _snr(fs, dec) > 22.0
    assert es != encode_m2v(fs, qscale_code=2, p_frames=True)

    # splice a quant_matrix_extension (intra reload = the DEFAULT
    # matrix) before the second picture: both matrices then match a
    # stream that was default-intra from the start for that picture
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        INTRA_QUANT,
        ZIGZAG,
        _BitWriter,
    )

    base = encode_m2v([_frame(0), _frame(1)], qscale_code=2)
    w = _BitWriter()
    w.write(0x3, 4)  # extension id: quant matrix
    w.write(1, 1)    # load_intra
    for v in INTRA_QUANT.reshape(64)[ZIGZAG]:
        w.write(int(v), 8)
    w.write(0, 1)    # no non-intra load
    w.write(0, 2)    # no chroma loads
    qext = b"\x00\x00\x01\xb5" + w.bytes()
    first_pic = base.index(b"\x00\x00\x01\x00")
    second_pic = base.index(b"\x00\x00\x01\x00", first_pic + 4)
    salted = base[:second_pic] + qext + base[second_pic:]
    m2, dec2 = decode_m2v(salted)
    clean = decode_m2v(base)[1]
    assert m2["n_frames"] == 2
    for a, b in zip(clean, dec2):
        assert (a == b).all()  # reload of the same matrix: identical

    # chroma matrix loads gate
    w = _BitWriter()
    w.write(0x3, 4)
    w.write(0, 1)
    w.write(0, 1)
    w.write(1, 1)  # load_chroma_intra
    qext_c = b"\x00\x00\x01\xb5" + w.bytes()
    with pytest.raises(NotImplementedError, match="chroma quantizer"):
        decode_m2v(base[:second_pic] + qext_c + base[second_pic:])


def test_b_skip_after_field_prediction_is_frame_based():
    """H.262 §7.6.6: a skipped macroblock in a B FRAME picture
    predicts FRAME-based from the PMVs even when the previous
    macroblock used field prediction. Replaying the field spec
    (motion_vertical_field_select included) decodes silently wrong
    pixels on conforming third-party fpfd=0 streams — the r12 ADVICE
    finding. Hand-built slice: field-predicted forward B macroblock
    (sel=1 both fields, zero vectors), one skipped macroblock, then a
    frame-predicted zero-vector macroblock."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _BitWriter,
        _decode_slice,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import _M2Hooks

    h, wpx, mbw = 16, 48, 3
    y = np.zeros((h, wpx), dtype=np.int64)
    y[0::2, :] = 100  # top field
    y[1::2, :] = 200  # bottom field
    cb = np.zeros((h // 2, wpx // 2), dtype=np.int64)
    cb[0::2, :] = 60
    cb[1::2, :] = 90
    cr = cb + 5
    fwd = (y, cb, cr)
    bwd = tuple(np.zeros_like(p) for p in fwd)

    w = _BitWriter()
    w.write(4, 5)         # quantiser_scale_code
    w.write(0, 1)         # extra_bit_slice
    # MB0: forward-only, not coded (Table B.4 '0010'), field motion
    w.write_code("1")     # macroblock_address_increment 1
    w.write_code("0010")
    w.write(1, 2)         # frame_motion_type = 1 (field-based)
    for _ in range(2):    # top-field set, bottom-field set
        w.write(1, 1)     # motion_vertical_field_select = bottom
        w.write_code("1")  # dx = 0
        w.write_code("1")  # dy = 0
    # MB2 (skipping MB1): forward-only, not coded, frame motion, 0 mv
    w.write_code("011")   # increment 2
    w.write_code("0010")
    w.write(2, 2)         # frame_motion_type = 2 (frame-based)
    w.write_code("1")     # dx = 0
    w.write_code("1")     # dy = 0

    planes = tuple(np.zeros_like(p) for p in fwd)
    hooks = _M2Hooks(q_scale_type=0, dc_precision=8, fpfd=0)
    _decode_slice(
        w.bytes(), 0, planes, fwd, bwd, mbw, 1, 3,
        (1, 1), 0, (1, 1), 0, hooks,
    )
    # MB0 really took the field path: both dest fields = bottom field
    assert (planes[0][:, :16] == 200).all()
    # Skipped MB1: frame-based from PMV (0,0) — an exact co-located
    # copy, NOT the all-bottom-field replay of MB0's spec
    assert (planes[0][:, 16:32] == y[:, 16:32]).all()
    assert (planes[1][:, 8:16] == cb[:, 8:16]).all()
    assert (planes[2][:, 8:16] == cr[:, 8:16]).all()
    # MB2 decodes normally
    assert (planes[0][:, 32:] == y[:, 32:]).all()


def test_b_skip_after_field_prediction_uses_pmv_vectors():
    """The skipped macroblock's frame vector comes from the PMVs the
    field decode left behind — horizontal as-is, vertical DOUBLED
    from field coordinates (§7.6.3.1). Field sets move (+1, +1) in
    field coords, so the skip must predict with frame vector
    (1, 2)."""
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        _BitWriter,
        _decode_slice,
        _inter_pred,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import _M2Hooks

    rng = np.random.RandomState(7)
    h, wpx, mbw = 32, 64, 4
    y = rng.randint(0, 256, size=(h, wpx)).astype(np.int64)
    cb = rng.randint(0, 256, size=(h // 2, wpx // 2)).astype(np.int64)
    cr = rng.randint(0, 256, size=(h // 2, wpx // 2)).astype(np.int64)
    fwd = (y, cb, cr)
    bwd = tuple(np.zeros_like(p) for p in fwd)

    w = _BitWriter()
    w.write(4, 5)
    w.write(0, 1)
    w.write_code("1")     # MB0
    w.write_code("0010")  # forward, not coded
    w.write(1, 2)         # field-based
    for _ in range(2):
        w.write(0, 1)       # select top field
        w.write_code("01")  # dx magnitude 1
        w.write(0, 1)       # positive
        w.write_code("01")  # dy magnitude 1 (field coordinates)
        w.write(0, 1)
    w.write_code("011")   # skip MB1, code MB2
    w.write_code("0010")
    w.write(2, 2)
    # frame deltas that RETURN the vector to (1, 2) = the PMV value,
    # i.e. zero deltas — pins that the skip used PMV, not (0, 0)
    w.write_code("1")
    w.write_code("1")

    planes = tuple(np.zeros_like(p) for p in fwd)
    hooks = _M2Hooks(q_scale_type=0, dc_precision=8, fpfd=0)
    _decode_slice(
        w.bytes(), 0, planes, fwd, bwd, mbw, 2, 3,
        (1, 1), 0, (1, 1), 0, hooks,
    )
    want = _inter_pred(fwd, None, 0, 1, True, (1, 2), False, (0, 0), 0, 0)
    assert (planes[0][:16, 16:32] == want[0]).all()
    assert (planes[1][:8, 8:16] == want[1]).all()
    assert (planes[2][:8, 8:16] == want[2]).all()


def test_repeated_sequence_header_rebinds_quant_matrices():
    """§6.3.3: a repeated sequence header RESETS the quantizer
    matrices to defaults and may download new ones — splicing two
    independently-encoded streams (custom-matrix first, default
    second, and the reverse) must decode each picture with ITS OWN
    header's matrices, bit-identically to the standalone decodes
    (r12 ADVICE: the repeated header was skipped unparsed)."""
    f = _frame(0)
    steep = np.full((8, 8), 64, dtype=np.int64)
    steep[0, 0] = 8
    a_custom = encode_m2v([f], qscale_code=2, intra_matrix=steep)
    b_default = encode_m2v([_frame(1)], qscale_code=2)
    end = b"\x00\x00\x01\xb7"
    assert a_custom.endswith(end) and b_default.endswith(end)

    for first, second in ((a_custom, b_default), (b_default, a_custom)):
        spliced = first[: -len(end)] + second
        meta, dec = decode_m2v(spliced)
        assert meta["n_frames"] == 2
        _, alone_first = decode_m2v(first)
        _, alone_second = decode_m2v(second)
        assert np.array_equal(dec[0], alone_first[0])
        assert np.array_equal(dec[1], alone_second[0])
    # the matrices really differ: cross-decode would not match
    _, a_dec = decode_m2v(a_custom)
    _, b_dec = decode_m2v(b_default)
    assert not np.array_equal(a_dec[0], b_dec[0])


def test_extension_id_tolerance_matrix():
    """§6.2 policy (r13 audit): every extension id either decodes,
    skips (display/info metadata — decode identical to baseline), or
    raises a NAMED gate (scalability changes reconstruction; reserved
    ids mean a non-conforming stream). Injected at BOTH the sequence
    level (before the first picture) and the picture level (between
    the coding extension and the first slice)."""
    es = encode_m2v([_frame(0)], qscale_code=2)
    base_meta, base_dec = decode_m2v(es)

    pic_at = es.find(b"\x00\x00\x01\x00")
    slice_at = es.find(b"\x00\x00\x01\x01")
    assert 0 < pic_at < slice_at

    def inject(at, xid):
        ext = b"\x00\x00\x01\xb5" + bytes([xid << 4, 0x55, 0x55])
        return es[:at] + ext + es[at:]

    for at in (pic_at, slice_at):
        for xid in (0x2, 0x4, 0x7, 0xB, 0xC):  # skippable metadata
            meta, dec = decode_m2v(inject(at, xid))
            assert meta["n_frames"] == base_meta["n_frames"]
            assert np.array_equal(dec[0], base_dec[0]), (at, xid)
        for xid in (0x5, 0x9, 0xA):  # scalability: named gate
            with pytest.raises(NotImplementedError, match="scalab"):
                decode_m2v(inject(at, xid))
        for xid in (0x0, 0x6, 0xD, 0xF):  # reserved: non-conforming
            with pytest.raises(ValueError, match="reserved"):
                decode_m2v(inject(at, xid))


def test_tall_picture_gate():
    """Pictures taller than 2800 lines need
    slice_vertical_position_extension (§6.3.16) — an honest gate on
    both sides, not wrong row addressing."""
    es = bytearray(encode_m2v([_frame(0)], qscale_code=2))
    # sequence header: width(12)=48, height(12)=32 -> patch h to 2816
    assert es[4:7] == bytes([0x03, 0x00, 0x20])
    es[4:7] = bytes([0x03, 0x0B, 0x00])
    with pytest.raises(NotImplementedError, match="2800"):
        decode_m2v(bytes(es))
    with pytest.raises(NotImplementedError, match="2800"):
        encode_m2v([np.zeros((2816, 16, 3), dtype=np.uint8)])


def test_repeat_first_field_decodes_with_metadata():
    """repeat_first_field is display-only 3:2 pulldown timing
    (§6.3.10): decode must proceed with IDENTICAL pixels and surface
    the flag count in meta (r13 self-review — the old gate rejected
    film-rate DVD streams that decode exactly)."""
    es = bytearray(encode_m2v([_frame(0)], qscale_code=2))
    p = 0
    while True:
        p = bytes(es).find(b"\x00\x00\x01\xb5", p)
        if es[p + 4] >> 4 == 0x8:
            break
        p += 4
    # id(4)+f_codes(16)+prec(2)+struct(2)+tff(1)+fpfd(1)+cmv(1)
    # +qst(1)+ivlc(1)+altscan(1) -> rff bit offset
    off = (p + 4) * 8 + 4 + 16 + 2 + 2 + 1 + 1 + 1 + 1 + 1 + 1
    i, j = divmod(off, 8)
    patched = bytearray(es)
    patched[i] |= 0x80 >> j
    base_meta, base_dec = decode_m2v(bytes(es))
    meta, dec = decode_m2v(bytes(patched))
    assert base_meta["repeat_first_field"] == 0
    assert meta["repeat_first_field"] == 1
    assert np.array_equal(dec[0], base_dec[0])


def test_sparse_dequant2_matches_dense_twin():
    """r16 optimization: the MPEG-2 sparse dequant (running-total §7.4.4
    mismatch control) must be bit-identical to the dense numpy twin."""
    import random

    import numpy as np

    import articulation_vector_db_api_spark.functions.mpeg1 as m1
    import articulation_vector_db_api_spark.functions.mpeg2 as m2

    rng = random.Random(29)
    for _ in range(400):
        n = rng.randrange(0, 22)
        qscale = rng.choice([2, 4, 6, 8, 10, 16, 31, 56, 112])
        dc_mult = rng.choice([1, 2, 4, 8])
        if rng.random() < 0.4:
            wq = np.asarray(
                [rng.randrange(1, 256) for _ in range(64)], dtype=np.int64
            )
            wq[0] = 8
            wql = m1._wq_list(wq)
        else:
            wq, wql = m2._WQ_ZZ, m2._WQ_ZZ_LIST
        idxs = sorted(rng.sample(range(1, 64), min(n, 63)))
        pairs = [(i, rng.randrange(-2047, 2048) or 1) for i in idxs]
        qdc = rng.randrange(0, 2048)
        dense = np.zeros(64, dtype=np.int64)
        dense[0] = qdc
        for i, lv in pairs:
            dense[i] = lv
        assert np.array_equal(
            m2._dequant_intra2(dense, qscale, dc_mult, wq),
            m2._dequant_intra2_sparse(qdc, pairs, qscale, dc_mult, wql),
        )
        idxs2 = sorted(rng.sample(range(0, 64), min(n, 63)))
        pairs2 = [(i, rng.randrange(-2047, 2048)) for i in idxs2]
        wq_ni, wql_ni = (
            (wq, wql) if wq is not m2._WQ_ZZ
            else (m2._WQ_NI_FLAT, m2._WQ_NI_LIST)
        )
        dense2 = np.zeros(64, dtype=np.int64)
        for i, lv in pairs2:
            dense2[i] = lv
        assert np.array_equal(
            m2._dequant_nonintra2(dense2, qscale, wq_ni),
            m2._dequant_nonintra2_sparse(pairs2, qscale, wql_ni),
        )
