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


def _png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # crc not checked for dimension parse
    )


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def _jpeg(width: int, height: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    # DQT segment before the frame header, as real encoders emit
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xda\x00\x02"


def test_decode_image_png_gif_jpeg_headers():
    """PNG/GIF/JPEG dimensions parse from plain header fields with no
    codec: IHDR big-endian, GIF screen descriptor little-endian, JPEG
    SOF0 found by walking the marker stream past APP0/DQT."""
    assert decode_image(_png(640, 480)) == (640, 480)
    assert decode_image(_gif(320, 200)) == (320, 200)
    assert decode_image(_jpeg(1024, 768)) == (1024, 768)
    # progressive JPEG uses SOF2 — same frame header layout
    prog = bytearray(_jpeg(90, 60))
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    assert decode_image(bytes(prog)) == (90, 60)


def test_decode_image_jpeg_without_sof_is_value_error():
    """A JPEG whose marker stream reaches start-of-scan with no frame
    header is corrupt: ValueError (nulls its row through _safe), not a
    silent wrong answer."""
    import pytest

    truncated = b"\xff\xd8\xff\xda\x00\x02"
    with pytest.raises(ValueError):
        decode_image(truncated)


def _webp_vp8(width: int, height: int) -> bytes:
    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    chunk = b"VP8 " + struct.pack("<I", len(vp8)) + vp8
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _webp_vp8l(width: int, height: int) -> bytes:
    bits = (width - 1) | ((height - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", bits)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _webp_vp8x(width: int, height: int) -> bytes:
    payload = (
        b"\x00\x00\x00\x00"
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk + b"\x00" * 4


def test_decode_image_webp_all_flavors():
    """WebP dimensions parse from the first chunk's fixed fields for
    all three flavors: lossy VP8 (uint16 past the keyframe start
    code), lossless VP8L (packed 14-bit minus-one), extended VP8X
    (24-bit minus-one canvas)."""
    assert decode_image(_webp_vp8(550, 368)) == (550, 368)
    assert decode_image(_webp_vp8l(1280, 720)) == (1280, 720)
    assert decode_image(_webp_vp8x(4096, 2160)) == (4096, 2160)
