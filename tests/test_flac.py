"""FLAC codec (functions/flac.py): lossless roundtrips across the
encoder envelope, hand-built streams for every decoder path the
encoder does not emit (LPC, left/side, right/side, rice method 1,
partition order > 0, escape partitions, wasted bits), CRC/MD5
integrity, and honest gates."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.flac import (
    _BitWriter,
    _coded_number_decode,
    _coded_number_encode,
    _crc8,
    _crc16,
    _BitReader,
    _write_residual,
    decode_flac,
    encode_flac,
)


def _roundtrips():
    rng = np.random.default_rng(9)
    t = np.arange(9000)
    stereo = np.stack(
        [
            (1000 * np.sin(t[:5000] / 30)).astype(np.int16),
            (1000 * np.sin(t[:5000] / 30)).astype(np.int16)
            + rng.integers(-50, 50, 5000).astype(np.int16),
        ],
        axis=1,
    )
    return [
        ("rand", rng.integers(-32768, 32768, 500).astype(np.int16), {}),
        ("smooth", (3000 * np.sin(t / 50)).astype(np.int16),
         {"block_size": 4096}),
        ("const", np.full(300, -7, np.int16), {}),
        ("tiny", np.array([5], np.int16), {}),
        ("ramp", np.arange(-20000, 20000, 7).astype(np.int16),
         {"block_size": 256}),
        ("stereo-ind", stereo,
         {"stereo_mode": "independent", "block_size": 1024}),
        ("stereo-ms", stereo, {"stereo_mode": "mid-side",
                               "block_size": 1024}),
        ("extremes", np.array([32767, -32768] * 100, np.int16),
         {"block_size": 64}),
    ]


@pytest.mark.parametrize("name,samples,kw", _roundtrips())
def test_roundtrip_lossless(name, samples, kw):
    enc = encode_flac(samples, rate=16000, **kw)
    rate, dec = decode_flac(enc)
    want = samples if samples.ndim == 2 else samples[:, None]
    assert rate == 16000
    assert np.array_equal(dec, want)


def test_structural_anchors():
    enc = encode_flac(np.arange(100, dtype=np.int16))
    assert enc[:4] == b"fLaC"
    # STREAMINFO is 4 (magic) + 4 (block header) + 34 bytes; the first
    # frame of a fixed-blocking stream must start FF F8 (14-bit sync +
    # reserved 0 + blocking 0) — a spec anchor independent of our code
    assert enc[42:44] == b"\xff\xf8"
    import hashlib

    raw = np.arange(100, dtype="<i2").tobytes()
    assert enc[8 + 18 : 8 + 34] == hashlib.md5(raw).digest()


def test_crc_and_md5_tamper_detected():
    enc = bytearray(encode_flac(np.arange(200, dtype=np.int16)))
    flipped = enc.copy()
    flipped[-3] ^= 0x40  # inside the last frame's payload
    # a payload flip either breaks the CRC or desyncs the rice reader —
    # both must surface as ValueError, never as wrong samples
    with pytest.raises(ValueError, match="CRC|truncated"):
        decode_flac(bytes(flipped))
    # flip inside the FIRST frame's entropy bytes: decode continues far
    # enough that the CRC-16 check itself must catch it
    flipped2 = enc.copy()
    flipped2[60] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(flipped2))
    bad_md5 = enc.copy()
    bad_md5[8 + 18] ^= 0xFF  # STREAMINFO md5 field
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad_md5))


def test_coded_number_roundtrip():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 2**20, 2**31,
              2**36 - 1):
        enc = _coded_number_encode(n)
        w = _BitWriter()
        for byte in enc:
            w.write(byte, 8)
        assert _coded_number_decode(_BitReader(w.bytes())) == n
    with pytest.raises(ValueError, match="out of range"):
        _coded_number_encode(2**36)


def test_crc_polynomials():
    # spec polynomials against independently-known check values:
    # CRC-8 (0x07) and CRC-16 (0x8005, MSB-first, init 0) of "123456789"
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


# ---- hand-built decoder-path streams ---------------------------------


def _container(frames: bytes, n: int, ch: int, rate: int = 16000,
               block_size: int = 4096) -> bytes:
    si = _BitWriter()
    si.write(16, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)
    si.write(n, 36)
    si.align()
    info = si.bytes() + b"\x00" * 16  # zero md5 → integrity check skipped
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info + frames


def _header(w: _BitWriter, bs: int, ch_code: int) -> None:
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)  # explicit 16-bit blocksize
    w.write(0, 4)  # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(4, 3)  # 16-bit samples
    w.write(0, 1)
    for byte in _coded_number_encode(0):
        w.write(byte, 8)
    w.write(bs - 1, 16)
    w.write(_crc8(w.bytes()), 8)


def _finish(w: _BitWriter) -> bytes:
    w.align()
    frame = w.bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def _verbatim(w: _BitWriter, vals, bps: int) -> None:
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in vals:
        w.write(int(v), bps)


def test_decode_lpc_subframe():
    # LPC order 1, coefficient 1<<shift → prediction == previous sample,
    # so residuals are plain diffs; the encoder never emits LPC
    vals = np.array([100, 105, 95, 130, 129, 60], dtype=np.int64)
    w = _BitWriter()
    _header(w, len(vals), ch_code=0)
    w.write(0, 1)
    w.write(32, 6)  # LPC, order 1
    w.write(0, 1)
    w.write(int(vals[0]), 16)  # warmup
    w.write(3, 4)  # precision 4 bits
    w.write(2, 5)  # shift 2
    w.write(4, 4)  # coefficient 4 → (4 * prev) >> 2 == prev
    _write_residual(w, np.diff(vals))
    stream = _container(_finish(w), len(vals), 1)
    rate, dec = decode_flac(stream)
    assert np.array_equal(dec[:, 0], vals)


@pytest.mark.parametrize("ch_code", [8, 9])
def test_decode_left_side_and_right_side(ch_code):
    left = np.array([100, -50, 3000, 7], dtype=np.int64)
    right = np.array([90, -80, 2999, -7], dtype=np.int64)
    side = left - right
    w = _BitWriter()
    _header(w, 4, ch_code=ch_code)
    if ch_code == 8:  # left/side
        _verbatim(w, left, 16)
        _verbatim(w, side, 17)
    else:  # right/side
        _verbatim(w, side, 17)
        _verbatim(w, right, 16)
    stream = _container(_finish(w), 4, 2)
    _rate, dec = decode_flac(stream)
    assert np.array_equal(dec[:, 0], left)
    assert np.array_equal(dec[:, 1], right)


def test_decode_rice_method1_partition_order1():
    # verbatim warmup-free order-0 fixed subframe, residuals rice-coded
    # with the 5-bit-parameter method across two partitions
    vals = np.array([3, -2, 0, 5, -6, 1, 2, -1], dtype=np.int64)
    w = _BitWriter()
    _header(w, len(vals), ch_code=0)
    w.write(0, 1)
    w.write(8, 6)  # fixed, order 0 → residual IS the signal
    w.write(0, 1)
    w.write(1, 2)  # rice method 1 (5-bit parameters)
    w.write(1, 4)  # partition order 1 → two partitions of 4
    for part in (vals[:4], vals[4:]):
        w.write(2, 5)  # rice parameter 2
        for v in part:
            u = (int(v) << 1) ^ (int(v) >> 63)
            w.write_unary(u >> 2)
            w.write(u, 2)
    stream = _container(_finish(w), len(vals), 1)
    _rate, dec = decode_flac(stream)
    assert np.array_equal(dec[:, 0], vals)


def test_decode_escape_partition():
    vals = np.array([30000, -30000, 12345, -12345], dtype=np.int64)
    w = _BitWriter()
    _header(w, len(vals), ch_code=0)
    w.write(0, 1)
    w.write(8, 6)  # fixed order 0
    w.write(0, 1)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(0b1111, 4)  # escape
    w.write(16, 5)  # raw 16-bit residuals
    for v in vals:
        w.write(int(v), 16)
    stream = _container(_finish(w), len(vals), 1)
    _rate, dec = decode_flac(stream)
    assert np.array_equal(dec[:, 0], vals)


def test_decode_wasted_bits():
    vals = np.array([4, -8, 16, 0], dtype=np.int64)  # all % 4 == 0
    w = _BitWriter()
    _header(w, len(vals), ch_code=0)
    w.write(0, 1)
    w.write(1, 6)  # verbatim
    w.write(1, 1)  # wasted-bits flag
    w.write(0, 1)  # unary 1 → k-1 = 1 ... unary(1) is '01'
    w.write(1, 1)
    for v in vals >> 2:
        w.write(int(v), 14)  # bps 16 - 2 wasted
    stream = _container(_finish(w), len(vals), 1)
    _rate, dec = decode_flac(stream)
    assert np.array_equal(dec[:, 0], vals)


def test_gates_and_malformed():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + b"\x00" * 50)
    enc = bytearray(encode_flac(np.arange(50, dtype=np.int16)))
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(bytes(enc[:-10]))
    # a RESERVED bit depth (bps-1 = 2 is not a spec value) is refused
    si = _BitWriter()
    si.write(16, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(0, 3)
    si.write(2, 5)  # bps = 3: not one of 8/12/16/20/24/32
    si.write(10, 36)
    si.align()
    stream = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + si.bytes() + b"\x00" * 16
    )
    with pytest.raises(ValueError, match="invalid FLAC bit depth"):
        decode_flac(stream)


@pytest.mark.parametrize("bps", [8, 12, 20, 24, 32])
def test_roundtrip_all_spec_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    mono = rng.integers(-lim, lim, size=700, dtype=np.int64)
    stereo = rng.integers(-lim, lim, size=(700, 2), dtype=np.int64)
    for s, kw in ((mono, {}), (stereo, {"stereo_mode": "mid-side"})):
        _rate, dec = decode_flac(
            encode_flac(s, block_size=128, bps=bps, **kw)
        )
        want = s if s.ndim == 2 else s[:, None]
        # the STREAMINFO MD5 (sign-extended ceil(bps/8)-byte LE
        # packing, RFC 9639 §9.1.4) is verified inside decode, so
        # equality here is belt-and-braces
        assert np.array_equal(dec, want)
        assert dec.dtype == (np.dtype("<i2") if bps <= 16 else
                             np.dtype("<i4"))


def test_decode_partition_order_with_predictor_order():
    # partition order 1 AND fixed order 1: the FIRST partition holds
    # blocksize/2 - order residuals, the second blocksize/2 (RFC 9639
    # partition-size rule) — a boundary the encoder never emits
    vals = np.array([10, 12, 9, 9, 14, 8, 8, 8], dtype=np.int64)
    res = np.diff(vals)  # 7 residuals: first partition 3, second 4
    w = _BitWriter()
    _header(w, len(vals), ch_code=0)
    w.write(0, 1)
    w.write(9, 6)  # fixed, order 1
    w.write(0, 1)
    w.write(int(vals[0]), 16)  # warmup
    w.write(0, 2)  # rice method 0
    w.write(1, 4)  # partition order 1
    for part in (res[:3], res[4 - 1 :]):
        w.write(1, 4)  # rice parameter 1
        for v in part:
            u = (int(v) << 1) ^ (int(v) >> 63)
            w.write_unary(u >> 1)
            w.write(u, 1)
    stream = _container(_finish(w), len(vals), 1)
    _rate, dec = decode_flac(stream)
    assert np.array_equal(dec[:, 0], vals)


def test_unknown_total_samples_decodes_to_eos():
    """STREAMINFO total_samples == 0 is the spec's legal 'unknown'
    value (piped/streamed FLAC): decode must run frame-by-frame to
    end-of-stream, then MD5-check what was decoded (ADVICE r7)."""
    samples = np.arange(-500, 500, 3).astype(np.int16)
    enc = bytearray(encode_flac(samples, rate=16000, block_size=256))
    # total_samples is the 36 bits at STREAMINFO bit offset 108; the
    # block body starts at stream byte 8, so bytes 21 (low nibble) + 22-25
    enc[21] &= 0xF0
    enc[22:26] = b"\x00" * 4
    rate, dec = decode_flac(bytes(enc))
    assert rate == 16000
    assert np.array_equal(dec, samples.astype(np.int16)[:, None])
