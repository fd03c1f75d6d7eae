"""The non-stub decode path is REAL for codec-free formats: a valid
uncompressed BMP and a binary PPM decode to their true dimensions
through the full Arrow mapInPandas pipeline; a compressed-format
payload nulls its row (per-file fault isolation, the reference's O7
shape) instead of failing the task."""

from __future__ import annotations

import struct

from articulation_vector_db_api_spark.operators.multimodal import (
    decode_image,
    extract_binary_features,
)


def _bmp(width: int, height: int) -> bytes:
    row = ((width * 3 + 3) // 4) * 4  # rows pad to 4 bytes
    pixels = b"\x7f" * (row * height)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def _ppm(width: int, height: int) -> bytes:
    return (
        f"P6\n# comment line\n{width} {height}\n255\n".encode()
        + b"\x00" * (width * height * 3)
    )


def test_decode_image_bmp_ppm_direct():
    assert decode_image(_bmp(17, 9)) == (17, 9)
    assert decode_image(_ppm(33, 21)) == (33, 21)
    # top-down BMP stores a negative height; dimension is the magnitude
    b = bytearray(_bmp(5, 4))
    b[22:26] = struct.pack("<i", -4)
    assert decode_image(bytes(b)) == (5, 4)


def test_extract_features_real_decode_with_fault_isolation(spark):
    rows = [
        (0, bytearray(_bmp(64, 48))),
        (1, bytearray(_ppm(10, 20))),
        (2, bytearray(b"\xff\xd8\xff\xe0fake-jpeg")),  # compressed: nulls
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in extract_binary_features(df, deterministic_stub=False).collect()
    }
    assert (out[0].fake_width, out[0].fake_height) == (64, 48)
    assert (out[1].fake_width, out[1].fake_height) == (10, 20)
    assert out[2].fake_width is None and out[2].fake_height is None
    # metadata stays populated even when decode fails
    assert out[2].n_bytes == len(rows[2][1])


def test_decode_bmp_core_header_and_unknown_dib():
    """BITMAPCOREHEADER (OS/2, 12-byte DIB) stores 16-bit dimensions —
    reading it as BITMAPINFOHEADER would fuse width|height into garbage;
    an unknown DIB size must raise (→ nulled row via fault isolation),
    never return fused bytes as dimensions."""
    import pytest

    core = (
        struct.pack("<2sIHHI", b"BM", 26 + 30, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 100, 50, 1, 24)
        + b"\x00" * 30
    )
    assert decode_image(core) == (100, 50)
    bogus = bytearray(_bmp(5, 4))
    bogus[14:18] = struct.pack("<I", 9999)
    with pytest.raises(ValueError, match="DIB"):
        decode_image(bytes(bogus))
