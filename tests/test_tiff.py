"""TIFF 6.0 codec (functions/tiff.py): exact roundtrips across the
writer envelope, PackBits edge cases, photometric inversion, honest
compression gates, and corruption contracts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.pixels import decode_pixels
from articulation_vector_db_api_spark.functions.tiff import (
    _packbits_decode,
    _packbits_encode_row,
    decode_tiff,
    encode_tiff,
)


def _patch_tag(b: bytes, tag: int, value: int) -> bytes:
    """Overwrite a little-endian inline IFD value (test fixture knob)."""
    out = bytearray(b)
    n = struct.unpack("<H", out[8:10])[0]
    for k in range(n):
        off = 10 + 12 * k
        if struct.unpack("<H", out[off : off + 2])[0] == tag:
            out[off + 8 : off + 12] = struct.pack("<I", value)
            return bytes(out)
    raise AssertionError(f"tag {tag} not found")


@pytest.mark.parametrize("shape", [(8, 4), (8, 4, 3), (17, 5), (1, 1)])
@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("rps", [None, 3])
@pytest.mark.parametrize("pred", [1, 2])
def test_roundtrip_exact(shape, comp, endian, rps, pred):
    rng = np.random.default_rng(
        hash((shape, comp, endian, rps, pred)) % 2**32
    )
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_tiff(
        encode_tiff(
            px,
            compression=comp,
            rows_per_strip=rps,
            endian=endian,
            predictor=pred,
        )
    )
    want = px if px.ndim == 3 else px[:, :, None]
    assert np.array_equal(got, want)


def test_dispatch_via_decode_pixels():
    px = np.arange(32, dtype=np.uint8).reshape(8, 4)
    for endian in ("<", ">"):
        got = decode_pixels(encode_tiff(px, endian=endian))
        assert np.array_equal(got[:, :, 0], px)


def test_packbits_compresses_runs():
    px = np.repeat(np.arange(16, dtype=np.uint8).reshape(4, 4), 64, axis=1)
    pb = encode_tiff(px, compression="packbits")
    raw = encode_tiff(px)
    assert len(pb) < len(raw) / 5
    assert np.array_equal(decode_tiff(pb), px[:, :, None])


def test_packbits_long_runs_and_literals():
    # literal stretch > 128 bytes and run > 128 bytes both need packet
    # splitting
    lit = np.frombuffer(bytes(range(256)) * 2, dtype=np.uint8).reshape(2, 256)
    run = np.full((1, 300), 9, dtype=np.uint8)
    for px in (lit, run):
        got = decode_tiff(encode_tiff(px, compression="packbits"))
        assert np.array_equal(got, px[:, :, None])


def test_packbits_noop_byte_decodes():
    # 0x80 is a spec'd no-op; our encoder never emits it but the
    # decoder must skip it
    row = bytes([0x80]) + _packbits_encode_row(b"abcabc")
    assert _packbits_decode(row, 6) == b"abcabc"


def test_photometric_zero_inverts():
    b = _patch_tag(encode_tiff(np.full((2, 2), 10, dtype=np.uint8)), 262, 0)
    got = decode_tiff(b)
    assert got.min() == got.max() == 245


def test_compression_gates():
    base = encode_tiff(np.full((2, 2), 10, dtype=np.uint8))
    with pytest.raises(NotImplementedError, match="deprecated"):
        decode_tiff(_patch_tag(base, 259, 6))
    with pytest.raises(ValueError, match="unknown TIFF compression"):
        decode_tiff(_patch_tag(base, 259, 999))


def test_jpeg_in_tiff_strips():
    # constant 8x8 blocks at quality 100 decode bit-exactly — the same
    # property multimodal_jpeg_roundtrip pins for bare JFIF
    rng = np.random.default_rng(5)
    grey = np.repeat(
        np.repeat(rng.integers(0, 256, (4, 2), dtype=np.uint8), 8, axis=0),
        8,
        axis=1,
    )
    for endian in ("<", ">"):
        for rps in (None, 8, 16):
            b = encode_tiff(
                grey, compression="jpeg", rows_per_strip=rps, endian=endian
            )
            assert np.array_equal(decode_tiff(b)[:, :, 0], grey)
    # color crosses RGB->YCbCr->RGB integer rounding: tolerance <= 2
    rgb = np.repeat(
        np.repeat(rng.integers(0, 256, (2, 3, 3), dtype=np.uint8), 8, axis=0),
        8,
        axis=1,
    )
    got = decode_tiff(encode_tiff(rgb, compression="jpeg"))
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 2
    # non-MCU-aligned strip heights: JPEG pads internally, decode crops
    ragged = rng.integers(0, 256, (20, 16), dtype=np.uint8)
    got = decode_tiff(
        encode_tiff(ragged, compression="jpeg", rows_per_strip=6)
    )
    assert got.shape == (20, 16, 1)


def test_jpeg_shared_tables_tag_347():
    rng = np.random.default_rng(6)
    grey = np.repeat(
        np.repeat(rng.integers(0, 256, (6, 2), dtype=np.uint8), 8, axis=0),
        8,
        axis=1,
    )
    plain = encode_tiff(grey, compression="jpeg", rows_per_strip=8)
    shared = encode_tiff(
        grey, compression="jpeg", rows_per_strip=8, jpeg_shared_tables=True
    )
    # hoisting the per-strip DQT/DHT into tag 347 must shrink the file
    # and decode identically (bit-exact here: constant blocks, q=100)
    assert len(shared) < len(plain)
    assert np.array_equal(decode_tiff(shared), decode_tiff(plain))
    assert np.array_equal(decode_tiff(shared)[:, :, 0], grey)
    with pytest.raises(ValueError, match="predictor 2"):
        encode_tiff(grey, compression="jpeg", predictor=2)


def test_lzw_hand_vector():
    # hand-derived from TIFF 6.0 §13: b"AAAA" encodes as codes
    # CLEAR(256), 65, 258, 65, EOI(257), all 9 bits, MSB-first
    from articulation_vector_db_api_spark.functions.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    vec = bytes([0x80, 0x10, 0x60, 0x44, 0x18, 0x08])
    assert _lzw_decode_tiff(vec, 4) == b"AAAA"
    assert _lzw_encode_tiff(b"AAAA") == vec


def test_lzw_width_boundaries_and_table_reset():
    # incompressible data crosses the 9->10->11->12-bit early-change
    # boundaries; 60k bytes forces a mid-stream ClearCode table reset
    from articulation_vector_db_api_spark.functions.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    rng = np.random.default_rng(3)
    for n in (5000, 60000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _lzw_decode_tiff(_lzw_encode_tiff(data), n) == data


def test_old_deflate_code_32946_decodes():
    b = encode_tiff(
        np.arange(16, dtype=np.uint8).reshape(4, 4), compression="deflate"
    )
    got = decode_tiff(_patch_tag(b, 259, 32946))
    assert np.array_equal(got[:, :, 0], np.arange(16).reshape(4, 4))


def test_predictor_helps_gradients():
    g = np.tile(np.arange(256, dtype=np.uint8), (16, 2))
    plain = encode_tiff(g, compression="lzw")
    pred = encode_tiff(g, compression="lzw", predictor=2)
    assert len(pred) < len(plain) / 2
    assert np.array_equal(decode_tiff(pred), g[:, :, None])


def test_corruption_contract():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX\x00\x00garbage")
    whole = encode_tiff(np.full((4, 4), 1, dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated TIFF strip"):
        decode_tiff(whole[:-3])
    # PackBits stream that under-delivers
    with pytest.raises(ValueError, match="PackBits expanded"):
        _packbits_decode(bytes([0x00, 0x61]), 5)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("pred", [1, 2])
def test_planar_configuration_roundtrip(comp, pred):
    # PlanarConfiguration 2: channel-major plane strips, one sample per
    # pixel per strip; predictor differencing runs within each plane
    rng = np.random.default_rng(hash((comp, pred)) % 2**32)
    px = rng.integers(0, 256, size=(17, 5, 3), dtype=np.uint8)
    b = encode_tiff(
        px, compression=comp, rows_per_strip=4, predictor=pred, planar=True
    )
    assert np.array_equal(decode_tiff(b), px)
    with pytest.raises(ValueError, match="planar"):
        encode_tiff(px, compression="jpeg", planar=True)
