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


# ---- full pixel codecs (functions/pixels.py) ----------------------

import numpy as np
import pytest
import zlib

from articulation_vector_db_api_spark.functions.pixels import (
    decode_bmp,
    decode_netpbm,
    decode_pixels,
    decode_png,
    encode_png,
)


def _spec_filter_scanlines(a: np.ndarray, filters: list[int]) -> bytes:
    """Independent scalar reference: applies the W3C PNG §9 filter
    formulas pixel-by-pixel, straight from the spec text — shares no
    code with encode_png, so a joint encoder/decoder bug can't hide."""
    h, w, nch = a.shape
    flat = a.reshape(h, w * nch).astype(int)
    out = bytearray()
    for y in range(h):
        ft = filters[y % len(filters)]
        out.append(ft)
        for x in range(w * nch):
            raw = flat[y][x]
            left = flat[y][x - nch] if x >= nch else 0
            up = flat[y - 1][x] if y else 0
            ul = flat[y - 1][x - nch] if y and x >= nch else 0
            if ft == 0:
                v = raw
            elif ft == 1:
                v = raw - left
            elif ft == 2:
                v = raw - up
            elif ft == 3:
                v = raw - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                v = raw - pred
            out.append(v & 0xFF)
    return bytes(out)


def _png_from_scanlines(w, h, ctype, scanlines, plte=b""):
    import struct

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    png = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    if plte:
        png += chunk(b"PLTE", plte)
    return png + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


def test_png_roundtrip_all_filters_all_channel_counts():
    """encode → decode is the identity for grey/RGB/RGBA with every
    scanline filter type forced — the decoder's five unfilter paths
    are all exercised on the same image."""
    rng = np.random.default_rng(7)
    for nch in (1, 3, 4):
        a = rng.integers(0, 256, size=(9, 5, nch), dtype=np.uint8)
        png = encode_png(a, filters=[0, 1, 2, 3, 4])
        assert decode_png(png).shape == (9, 5, nch)
        np.testing.assert_array_equal(decode_png(png), a)


def test_png_decoder_against_spec_reference_filters():
    """Decode scanlines filtered by the INDEPENDENT per-pixel spec
    implementation — catches any bug shared by encode_png/decode_png."""
    rng = np.random.default_rng(11)
    for nch, ctype in ((1, 0), (3, 2), (4, 6)):
        a = rng.integers(0, 256, size=(7, 6, nch), dtype=np.uint8)
        for ft in (0, 1, 2, 3, 4):
            png = _png_from_scanlines(
                6, 7, ctype, _spec_filter_scanlines(a, [ft])
            )
            np.testing.assert_array_equal(decode_png(png), a)


def test_png_palette_decode():
    rng = np.random.default_rng(3)
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(5, 8, 1), dtype=np.uint8)
    scan = _spec_filter_scanlines(idx, [0, 2])
    png = _png_from_scanlines(8, 5, 3, scan, plte=plte.tobytes())
    np.testing.assert_array_equal(decode_png(png), plte[idx[:, :, 0]])


def test_png_unsupported_forms_raise():
    import struct as _s

    a = np.zeros((2, 2, 1), dtype=np.uint8)
    png = bytearray(encode_png(a))
    png[24] = 16  # bit depth 16
    # re-CRC not needed: decoder checks fields, not CRCs
    with pytest.raises(ValueError):
        decode_png(bytes(png))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x00" + b"\x00" * 30)
    # truncated pixel payload
    bad = _png_from_scanlines(4, 4, 0, b"\x00" * 9)
    with pytest.raises(ValueError):
        decode_png(bad)
    _ = _s  # keep import local-style consistent


def _bmp24(px: np.ndarray, bottom_up: bool = True) -> bytes:
    import struct as s

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = px[::-1] if bottom_up else px
    raster = bytearray()
    for y in range(h):
        row = rows[y][:, [2, 1, 0]].tobytes()  # RGB → BGR on disk
        raster += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    return (
        b"BM" + s.pack("<IHHI", off + len(raster), 0, 0, off)
        + s.pack(
            "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
            len(raster), 2835, 2835, 0, 0,
        )
        + raster
    )


def test_bmp24_roundtrip_both_orientations_and_stride_pad():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)  # stride pad 1
    np.testing.assert_array_equal(decode_bmp(_bmp24(px, True)), px)
    np.testing.assert_array_equal(decode_bmp(_bmp24(px, False)), px)


def test_bmp8_palette_decode():
    import struct as s

    rng = np.random.default_rng(9)
    table = rng.integers(0, 256, size=(16, 4), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(2, 6), dtype=np.uint8)
    stride = (6 + 3) & ~3
    raster = b"".join(
        idx[::-1][y].tobytes() + b"\x00" * (stride - 6) for y in range(2)
    )
    off = 14 + 40 + 64
    bmp = (
        b"BM" + s.pack("<IHHI", off + len(raster), 0, 0, off)
        + s.pack("<IiiHHIIiiII", 40, 6, 2, 1, 8, 0, len(raster), 0, 0, 16, 16)
        + table.tobytes()
        + raster
    )
    np.testing.assert_array_equal(decode_bmp(bmp), table[idx][:, :, [2, 1, 0]])


def test_netpbm_pixel_roundtrip_with_comment():
    rng = np.random.default_rng(13)
    g = rng.integers(0, 256, size=(4, 3, 1), dtype=np.uint8)
    pgm = b"P5\n# a comment\n3 4\n255\n" + g.tobytes()
    np.testing.assert_array_equal(decode_netpbm(pgm), g)
    c = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    ppm = b"P6 2 2 255\n" + c.tobytes()
    np.testing.assert_array_equal(decode_netpbm(ppm), c)


def test_decode_pixels_dispatch_and_codec_gate():
    a = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(decode_pixels(encode_png(a)), a)
    np.testing.assert_array_equal(decode_pixels(_bmp24(a)), a)
    # JPEG dispatches to functions/jpeg.py (r7); a junk FFD8 stream is
    # a malformed-stream ValueError, still per-row isolable
    with pytest.raises(ValueError):
        decode_pixels(b"\xff\xd8\xff\xe0" + b"\x00" * 40)
    # both baseline and progressive decode through the dispatcher;
    # arithmetic coding remains the honest NotImplementedError gate
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    np.testing.assert_array_equal(
        decode_pixels(encode_jpeg_progressive(g, quality=100)),
        decode_pixels(encode_jpeg_baseline(g, quality=100)),
    )
    jp = bytearray(encode_jpeg_baseline(g, quality=100))
    jp[jp.find(b"\xff\xc0") + 1] = 0xC9  # arithmetic-coded frame
    with pytest.raises(NotImplementedError):
        decode_pixels(bytes(jp))


def test_extract_pixel_stats_real_decode_with_fault_isolation(spark):
    """The REAL pixel path end-to-end in Spark: PNG and BMP payloads
    decode to exact integer stats; a codec-needing JPEG nulls its row
    (the reference's O7 per-file isolation, main.py:175-176)."""
    from articulation_vector_db_api_spark.operators.multimodal import (
        extract_pixel_stats,
    )

    a = np.arange(24, dtype=np.uint8).reshape(4, 2, 3)
    rows = [
        (0, bytearray(encode_png(a, filters=[4, 3, 2, 1]))),
        (1, bytearray(_bmp24(a))),
        (2, bytearray(b"\xff\xd8\xff\xe0fake-jpeg")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_pixel_stats(df).collect()}
    for i in (0, 1):
        assert (out[i].width, out[i].height, out[i].channels) == (2, 4, 3)
        assert out[i].px_sum == int(a.sum())
        assert (out[i].px_min, out[i].px_max) == (0, 23)
    assert out[2].px_sum is None and out[2].width is None


def test_resize_nearest_and_box_downscale_exact():
    from articulation_vector_db_api_spark.functions.pixels import (
        downscale_box,
        resize_nearest,
    )

    a = np.arange(32, dtype=np.uint8).reshape(8, 4, 1)
    nn = resize_nearest(a, 4, 2)
    # (y,x) ← source (2y, 2x)
    np.testing.assert_array_equal(nn[:, :, 0], a[::2, ::2, 0])
    up = resize_nearest(a, 16, 8)
    np.testing.assert_array_equal(up[::2, ::2], a)  # each source survives
    box = downscale_box(a, 2)
    # block floor-mean, hand-checked corner: (0+1+4+5)//4 = 2
    assert box[0, 0, 0] == 2
    expect = a.reshape(4, 2, 2, 2, 1).astype(int).sum(axis=(1, 3)) // 4
    np.testing.assert_array_equal(box, expect.astype(np.uint8))
    with pytest.raises(ValueError):
        downscale_box(np.zeros((3, 4, 1), dtype=np.uint8), 2)


def test_resize_pixels_batch_spark_with_fault_isolation(spark):
    from articulation_vector_db_api_spark.operators.multimodal import (
        resize_pixels_batch,
    )

    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    rows = [
        (0, bytearray(encode_png(a, filters=[1, 2, 3, 4]))),
        (1, bytearray(b"\xff\xd8\xff\xe0fake-jpeg")),  # codec-gated: nulls
        (2, bytearray(encode_png(np.zeros((3, 4, 1), np.uint8)))),  # 3 % 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in resize_pixels_batch(df, factor=2).collect()}
    expect = a.reshape(2, 2, 2, 2, 3).astype(int).sum(axis=(1, 3)) // 4
    assert (out[0].width, out[0].height, out[0].channels) == (2, 2, 3)
    assert out[0].px_sum == int(expect.sum())
    assert out[1].px_sum is None and out[2].px_sum is None


def test_gif_lzw_roundtrip_dict_growth_and_interlace():
    """Real LZW: a palette image large enough to grow the code width
    several times round-trips exactly, plain and interlaced; the
    decoder de-weaves the four interlace passes."""
    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(17)
    palette = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, size=(23, 31), dtype=np.uint8)
    for interlaced in (False, True):
        gif = encode_gif(idx, palette, interlaced=interlaced)
        np.testing.assert_array_equal(decode_gif(gif), palette[idx])


def test_gif_lzw_kwkwk_and_table_reset():
    """The KwKwK self-referential code arises from repeated runs; a
    long high-entropy image pushes the dictionary to 4095 and through
    a mid-stream CLEAR reset."""
    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(23)
    palette = np.arange(768, dtype=np.uint8).reshape(256, 3)
    # aaa... prefix guarantees the KwKwK case at stream start
    flat = np.concatenate(
        [
            np.zeros(7, dtype=np.uint8),
            rng.integers(0, 256, size=120 * 100 - 7, dtype=np.uint8),
        ]
    )
    idx = flat.reshape(100, 120)
    gif = encode_gif(idx, palette)
    np.testing.assert_array_equal(decode_gif(gif), palette[idx])


def test_gif_decoder_skips_extensions_and_rejects_garbage():
    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif,
        encode_gif,
    )

    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    gif = bytearray(encode_gif(idx, palette))
    # splice a graphic-control extension between GCT and the descriptor
    desc = gif.index(0x2C, 13)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(gif[:desc]) + ext + bytes(gif[desc:])
    np.testing.assert_array_equal(decode_gif(spliced), palette[idx])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 10 + b"\x99")
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_decode_pixels_dispatches_gif():
    from articulation_vector_db_api_spark.functions.pixels import encode_gif

    palette = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    idx = np.array([[0, 1, 1], [1, 0, 0]], dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_pixels(encode_gif(idx, palette)), palette[idx]
    )


# ---- WAV codec (functions/audio.py) -------------------------------


def test_wav_roundtrip_mono_stereo_and_chunk_skip():
    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(29)
    mono = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    rate, out = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(out[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(50, 2), dtype=np.int16)
    _, out2 = decode_wav(encode_wav(stereo))
    np.testing.assert_array_equal(out2, stereo)
    # an odd-size LIST metadata chunk before data must skip word-aligned
    wav = bytearray(encode_wav(mono[:4], 44100))
    info = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    spliced = bytes(wav[:12]) + info + bytes(wav[12:])
    _, out3 = decode_wav(spliced)
    np.testing.assert_array_equal(out3[:, 0], mono[:4])


def test_wav_compressed_raises_and_frame_energy_exact():
    import struct as s

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_wav,
        frame_energies,
    )

    wav = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    s.pack_into("<H", wav, 20, 85)  # format tag: MP3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(wav))
    x = np.array([3, -4, 5, 0, 1, 2], dtype=np.int16)
    e = frame_energies(x, frame=4, hop=2)
    np.testing.assert_array_equal(e, [9 + 16 + 25 + 0, 25 + 0 + 1 + 4])
    assert len(frame_energies(x[:3], frame=4, hop=2)) == 0


# ---- ISOBMFF box walker (functions/isobmff.py) --------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct as s

    return s.pack(">I", 8 + len(payload)) + btype + payload


def _avif(width: int, height: int) -> bytes:
    import struct as s

    ispe = _box(b"ispe", b"\x00\x00\x00\x00" + s.pack(">II", width, height))
    meta = _box(b"meta", b"\x00\x00\x00\x00" + _box(b"iprp", _box(b"ipco", ispe)))
    return _box(b"ftyp", b"avif\x00\x00\x00\x00avifmif1") + meta


def _mp4(duration_ts: int, timescale: int, w: int, h: int, ver: int) -> bytes:
    import struct as s

    if ver:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + s.pack(
            ">IQ", timescale, duration_ts
        ) + b"\x00" * 80
        tkhd_head = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + s.pack(">I", 7)
    else:
        mvhd = b"\x00" + b"\x00" * 3 + b"\x00" * 8 + s.pack(
            ">II", timescale, duration_ts
        ) + b"\x00" * 80
        tkhd_head = b"\x00" + b"\x00" * 3 + b"\x00" * 8 + s.pack(">I", 7)
    tkhd = tkhd_head + b"\x00" * 48 + s.pack(">II", w << 16, h << 16)
    moov = _box(
        b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd))
    )
    return _box(b"ftyp", b"isom\x00\x00\x00\x00isommp42") + moov


def test_avif_dimensions_via_box_walk():
    from articulation_vector_db_api_spark.functions.isobmff import (
        avif_dimensions,
    )

    b = _avif(1200, 800)
    assert avif_dimensions(b) == (1200, 800)
    # and through the dimension-decode front door
    assert decode_image(b) == (1200, 800)


def test_mp4_meta_both_versions_and_dispatch():
    from articulation_vector_db_api_spark.functions.isobmff import (
        parse_mp4_meta,
    )

    for ver in (0, 1):
        m = parse_mp4_meta(_mp4(90000, 30000, 1920, 1080, ver))
        assert m["duration_sec"] == 3.0
        assert m["tracks"] == [
            {"track_id": 7, "width": 1920, "height": 1080}
        ]
    assert decode_image(_mp4(1, 1, 640, 360, 0)) == (640, 360)


def test_isobmff_malformed_and_largesize():
    import struct as s

    from articulation_vector_db_api_spark.functions.isobmff import (
        parse_mp4_meta,
        walk_boxes,
    )

    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00\x00\x00\x08free" + b"\x00" * 8)
    with pytest.raises(ValueError):
        list(walk_boxes(b"\x00\x00\x00\x03badx"))
    # 64-bit largesize form walks correctly
    payload = b"avif\x00\x00\x00\x00"
    big = s.pack(">I", 1) + b"ftyp" + s.pack(">Q", 16 + len(payload)) + payload
    assert [t for t, *_ in walk_boxes(big)] == [b"ftyp"]


# ---- fault-isolation exception contract (code-review findings) ----


def test_decode_pixels_exception_contract_on_malformed_streams():
    """Every malformed payload must surface as ValueError (or
    NotImplementedError for codec formats) — never zlib.error,
    struct.error, or IndexError — because the operators' per-row
    isolation catches exactly those two types."""
    a = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    png = bytearray(encode_png(a))
    png[-20] ^= 0xFF  # corrupt a compressed IDAT byte
    with pytest.raises(ValueError):
        decode_pixels(bytes(png))
    with pytest.raises(ValueError):
        decode_pixels(b"BM" + b"\x00" * 8)  # truncated BMP header
    with pytest.raises(ValueError):
        decode_pixels(b"GIF89a" + b"\x04\x00\x04\x00\x80\x00\x00")
    # palette PNG whose index exceeds its PLTE
    idx = np.full((2, 2, 1), 3, dtype=np.uint8)
    bad_plte = _png_from_scanlines(
        2, 2, 3, _spec_filter_scanlines(idx, [0]),
        plte=np.zeros((2, 3), np.uint8).tobytes(),
    )
    with pytest.raises(ValueError):
        decode_pixels(bad_plte)


def test_gif_subrectangle_frame_composites_onto_screen():
    """Optimized GIFs store sub-rectangle first frames; decode must
    composite at the descriptor offset onto the logical screen so its
    dimensions agree with decode_image's screen descriptor parse."""
    import struct as s

    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif,
        encode_gif,
    )

    palette = np.array(
        [[9, 9, 9], [50, 60, 70], [200, 210, 220]], dtype=np.uint8
    )
    frame = np.array([[1, 2], [2, 1]], dtype=np.uint8)
    gif = bytearray(encode_gif(frame, palette))
    # widen the logical screen to 4x4, set background index 0, and
    # move the 2x2 frame to offset (1, 1)
    s.pack_into("<HH", gif, 6, 4, 4)
    desc = gif.index(0x2C, 13)
    s.pack_into("<HH", gif, desc + 1, 1, 1)
    out = decode_gif(bytes(gif))
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[1:3, 1:3], palette[frame])
    np.testing.assert_array_equal(out[0, 0], palette[0])
    assert decode_image(bytes(gif)) == (4, 4)
    # a frame overflowing its screen is malformed, loudly
    s.pack_into("<HH", gif, desc + 1, 3, 3)
    with pytest.raises(ValueError):
        decode_gif(bytes(gif))


def test_wav_exception_contract_zero_channels_truncated_fmt():
    import struct as s

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_wav,
    )

    wav = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    s.pack_into("<H", wav, 22, 0)  # nChannels = 0
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))
    # fmt chunk shorter than the 16-byte PCM layout
    short = (
        b"RIFF" + s.pack("<I", 30) + b"WAVE"
        + b"fmt " + s.pack("<I", 14) + b"\x01\x00\x01\x00" + b"\x00" * 10
        + b"data" + s.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        decode_wav(short)


def test_isobmff_truncated_streams_are_value_error_via_decode_image():
    import struct as s

    # truncated largesize box: walk would struct.error; decode_image
    # must convert to ValueError for _safe's per-row isolation
    trunc = s.pack(">I", 1) + b"ftypavif" + b"\x00\x00"
    with pytest.raises(ValueError):
        decode_image(trunc)
    # mvhd shorter than its fixed layout
    short_mvhd = _box(b"ftyp", b"isom") + _box(
        b"moov", _box(b"mvhd", b"\x00\x00\x00")
    )
    with pytest.raises(ValueError):
        decode_image(short_mvhd)


def test_png_adam7_interlace_roundtrip_ragged_sizes():
    """Adam7: seven independently-filtered passes weave back to the
    exact image — exercised at ragged sizes where late passes are
    empty or partial, for every channel count and with filter
    cycling inside each pass."""
    rng = np.random.default_rng(31)
    for nch in (1, 3, 4):
        for hw in ((9, 5), (1, 1), (3, 10), (16, 16)):
            a = rng.integers(0, 256, size=(*hw, nch), dtype=np.uint8)
            png = encode_png(a, filters=[0, 1, 2, 3, 4], interlace=True)
            np.testing.assert_array_equal(decode_png(png), a)
    # truncated interlaced payload is a loud ValueError
    a = rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    png = encode_png(a, interlace=True)
    import struct as s
    import zlib as z

    # rebuild with one byte chopped from the decompressed stream
    raw = z.decompress(png[png.index(b"IDAT") + 4 : png.rindex(b"IEND") - 8])
    bad_idat = z.compress(raw[:-1])
    ihdr = png[8:33]
    def chunk(t, d):
        return s.pack(">I", len(d)) + t + d + s.pack(
            ">I", z.crc32(t + d) & 0xFFFFFFFF
        )
    bad = png[:8] + ihdr + chunk(b"IDAT", bad_idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)


def test_tiff_dimensions_both_endians_and_dispatch():
    import struct as s

    from articulation_vector_db_api_spark.functions.isobmff import (
        tiff_dimensions,
    )

    def tiff(endian: str, w: int, h: int) -> bytes:
        e = "<" if endian == "little" else ">"
        head = (b"II*\x00" if endian == "little" else b"MM\x00*") + s.pack(
            f"{e}I", 8
        )
        # two entries: ImageWidth as LONG, ImageLength as SHORT
        ent1 = s.pack(f"{e}HHI", 256, 4, 1) + s.pack(f"{e}I", w)
        ent2 = s.pack(f"{e}HHI", 257, 3, 1) + s.pack(f"{e}H", h) + b"\x00\x00"
        return head + s.pack(f"{e}H", 2) + ent1 + ent2 + s.pack(f"{e}I", 0)

    for endian in ("little", "big"):
        assert tiff_dimensions(tiff(endian, 640, 480)) == (640, 480)
        assert decode_image(tiff(endian, 33, 21)) == (33, 21)
    with pytest.raises(ValueError):
        tiff_dimensions(b"II*\x00" + b"\x08\x00\x00\x00")  # truncated IFD
    with pytest.raises(ValueError):
        decode_image(b"II*\x00\x08\x00\x00\x00\x01\x00")  # via front door


def test_adpcm_ima_codec():
    """IMA ADPCM (WAV tag 0x11): constant blocks at index 0 are
    bit-exact, smooth content is step-bounded, and the state machine
    is idempotent — encode(decode(encode(x))) == encode(x), the
    strongest self-consistency a lossy codec admits."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_adpcm_ima,
        encode_wav,
    )

    rng = np.random.RandomState(4)
    consts = rng.randint(-30000, 30000, size=6)
    spb = 65
    sig = np.repeat(consts, spb).astype(np.int16)
    rate, dec = decode_wav(encode_adpcm_ima(sig, samples_per_block=spb))
    assert rate == 16000
    assert np.array_equal(dec[:, 0], sig)  # constant blocks exact

    t = np.arange(4096)
    smooth = (np.sin(t / 50) * 8000).astype(np.int16)
    wav = encode_adpcm_ima(smooth)
    _, d2 = decode_wav(wav)
    err = np.abs(d2[: len(smooth), 0].astype(int) - smooth.astype(int)).max()
    assert err <= 1200  # adaptation transients, bounded by the step table

    _, d3 = decode_wav(wav)
    assert wav == encode_adpcm_ima(d3[:, 0])  # idempotent re-encode

    # PCM path untouched; a payload too short for the fact-declared
    # frame count is a clean ValueError
    _, d4 = decode_wav(encode_wav(smooth))
    assert np.array_equal(d4[:, 0], smooth)
    with pytest.raises(ValueError):
        decode_wav(wav[: len(wav) // 2])


def test_resample_441_320_exact_semantics(spark):
    """The fixed-point resampler against closed forms computed
    independently of the implementation: a constant signal is a fixed
    point (equal endpoints blend to themselves at every frac), a pure
    ramp lands on round-to-nearest of the continuous interpolant
    (f(x)=100x at x=i*441/320 -> floor((44100*i + 160)/320)), and a
    negative constant pins the bias trick (floor == truncate must not
    diverge below zero)."""
    import pyspark.sql.functions as F

    from articulation_vector_db_api_spark.suites.multimodal import (
        resample_441_320,
    )

    const = [777] * 32
    ramp = [100 * j for j in range(32)]
    neg = [-5] * 32
    df = spark.createDataFrame(
        [(0, const), (1, ramp), (2, neg)], "i int, s array<int>"
    )
    got = {
        r.i: r.r
        for r in df.select(
            "i", resample_441_320("s", 23).alias("r")
        ).collect()
    }
    assert got[0] == [777] * 23
    assert got[1] == [(44100 * i + 160) // 320 for i in range(23)]
    assert got[2] == [-5] * 23


def test_g711_expansion_tables_and_wav_plumbing():
    """G.711 μ-law/A-law anchors from the published ITU tables, spec
    monotonicity, and the tag-6/7 WAV decode path."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.audio import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_wav,
        encode_wav_g711,
    )

    # published full-scale / zero anchors
    assert _ULAW_TABLE[0x00] == -32124 and _ULAW_TABLE[0x80] == 32124
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
    assert _ALAW_TABLE[0x2A] == -32256 and _ALAW_TABLE[0xAA] == 32256
    # strictly monotone magnitude within each sign half (companding
    # property). μ-law is ordered by the raw code; A-law's codes are
    # xor-0x55 scrambled, so order by the unscrambled value first.
    lo, hi = _ULAW_TABLE[:128].astype(int), _ULAW_TABLE[128:].astype(int)
    assert (np.diff(lo) > 0).all() and (np.diff(hi) < 0).all()
    by_a = _ALAW_TABLE[np.argsort(np.arange(256) ^ 0x55)].astype(int)
    assert (np.diff(by_a[:128]) < 0).all()  # a=0..127: -8 → -32256
    assert (np.diff(by_a[128:]) > 0).all()  # a=128..255: +8 → +32256
    # WAV container roundtrip through both format tags
    codes = np.arange(256, dtype=np.uint8)
    for law, table in (("ulaw", _ULAW_TABLE), ("alaw", _ALAW_TABLE)):
        rate, s = decode_wav(encode_wav_g711(codes, law))
        assert rate == 8000 and s.shape == (256, 1)
        assert np.array_equal(s[:, 0], table)
    # 16-bit G.711 header is malformed, not gated
    import pytest as _pytest

    bad = bytearray(encode_wav_g711(codes, "ulaw"))
    bad[34:36] = (16).to_bytes(2, "little")  # bits-per-sample field
    with _pytest.raises(ValueError, match="must be 8"):
        decode_wav(bytes(bad))


def test_wav_pcm_all_whole_byte_depths():
    """8/24/32-bit PCM WAV decode: hand-built headers, exact values."""
    import struct as _struct

    import numpy as np

    from articulation_vector_db_api_spark.functions.audio import decode_wav

    def wav(tag, ch, rate, bits, data):
        fmt = _struct.pack(
            "<HHIIHH", tag, ch, rate, rate * ch * bits // 8,
            ch * bits // 8, bits,
        )
        return (
            b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data
        )

    # 8-bit: unsigned with midpoint 128 → centered raw amplitudes
    r, s = decode_wav(wav(1, 1, 8000, 8, bytes([0, 128, 255, 200])))
    assert r == 8000 and s[:, 0].tolist() == [-128, 0, 127, 72]
    # 24-bit: 3-byte little-endian signed, stereo interleaved
    vals = [-(1 << 23), (1 << 23) - 1, -1, 123456]
    data = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    _r, s = decode_wav(wav(1, 2, 48000, 24, data))
    assert s.reshape(-1).tolist() == vals
    # 32-bit PCM
    vals32 = [-(1 << 31), (1 << 31) - 1, 7, -7]
    _r, s = decode_wav(
        wav(1, 1, 44100, 32, np.array(vals32, dtype="<i4").tobytes())
    )
    assert s[:, 0].tolist() == vals32
    # float WAV decodes (r8) — tag 3 with a non-float width is refused
    import pytest as _pytest

    _r, z = decode_wav(wav(3, 1, 8000, 32, b"\x00" * 8))
    assert z.tolist() == [[0], [0]]
    with _pytest.raises(ValueError, match="float WAV"):
        decode_wav(wav(3, 1, 8000, 16, b"\x00" * 8))


def test_adpcm_ima_no_fact_short_final_block():
    """A fact-less IMA-ADPCM WAV whose final block is shorter than
    block_align (legal — samples need not fill the last block) decodes
    every stored sample instead of raising (ADVICE r7)."""
    import struct

    import numpy as np

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_adpcm_ima,
    )

    spb = 9  # -> block_align = 8
    sig = np.repeat([100, -200, 300], spb).astype(np.int16)
    wav = bytes(encode_adpcm_ima(sig, samples_per_block=spb))
    # deterministic layout: RIFF(12) | fmt hdr(8)+body(20) | fact(8+4) | data
    assert wav[12:16] == b"fmt " and wav[40:44] == b"fact"
    assert wav[52:56] == b"data"
    fmt_chunk, data = wav[12:40], wav[60:]
    trunc = data[:-2]  # final block loses 2 bytes = 4 nibble samples
    no_fact = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + 8 + len(trunc))
        + b"WAVE"
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(trunc))
        + trunc
    )
    rate, dec = decode_wav(no_fact)
    assert rate == 16000
    assert len(dec) == 2 * spb + 5  # full, full, short(1 header + 4 nibbles)
    assert np.array_equal(dec[:, 0], sig[: len(dec)])


def test_gif_animation_disposal_and_transparency():
    """decode_gif_frames honors all three disposal methods and the
    transparency index; wrong composition shifts a canvas sum."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = np.array([[10] * 3, [50] * 3, [90] * 3, [200] * 3], np.uint8)
    r3 = np.full((8, 8), 3, int)
    r3[::2, ::2] = 0
    spec = [
        {"indices": np.zeros((16, 16), int), "delay_cs": 5, "disposal": 1},
        {"indices": np.full((8, 8), 1, int), "left": 0, "top": 0,
         "delay_cs": 7, "disposal": 1},
        {"indices": np.full((8, 8), 2, int), "left": 8, "top": 8,
         "delay_cs": 9, "disposal": 3},
        {"indices": r3, "left": 8, "top": 0, "delay_cs": 11,
         "disposal": 0, "transparent": 0},
    ]
    gif = encode_gif_animation(spec, pal, (16, 16), bg_index=0)
    frames = decode_gif_frames(gif)
    assert [d for d, _ in frames] == [5, 7, 9, 11]
    c0, c1, c2, c3 = (c for _, c in frames)
    assert (c0 == 10).all()
    assert (c1[:8, :8] == 50).all() and (c1[8:, :] == 10).all()
    assert (c2[8:, 8:] == 90).all()
    # disposal 3 (restore previous): frame 2's paint must be undone
    assert (c3[8:, 8:] == 10).all()
    # transparency: checkerboard holes show the canvas underneath
    reg = c3[:8, 8:]
    assert (reg[::2, ::2] == 10).all() and (reg[1::2, :] == 200).all()
    # decode_gif == first composited frame
    assert np.array_equal(decode_gif(gif), c0)


def test_gif_animation_disposal2_and_malformed():
    import numpy as np
    import pytest as _pytest

    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = np.array([[0] * 3, [255] * 3], np.uint8)
    spec = [
        {"indices": np.ones((4, 4), int), "left": 2, "top": 2,
         "delay_cs": 1, "disposal": 2},
        {"indices": np.zeros((1, 1), int), "delay_cs": 1},
    ]
    gif = encode_gif_animation(spec, pal, (8, 8), bg_index=0)
    f = decode_gif_frames(gif)
    # disposal 2: the painted region returns to background before f1
    assert (f[1][1][2:6, 2:6] == 0).all()
    assert f[0][1][2:6, 2:6].max() == 255
    # max_frames stops early without walking the rest
    assert len(decode_gif_frames(gif, max_frames=1)) == 1
    # a reserved disposal method is refused
    bad = bytearray(gif)
    gce = bad.find(b"\x21\xf9\x04")
    bad[gce + 3] = (bad[gce + 3] & ~0x1C) | (5 << 2)
    with _pytest.raises(ValueError, match="disposal"):
        decode_gif_frames(bytes(bad))


def test_float_wav_decodes():
    """IEEE-float WAV (format tag 3): float32/float64 samples convert
    by the symmetric x*32767 convention, so 16-bit material
    round-trips bit-exactly; non-finite samples are rejected."""
    import struct

    import numpy as np

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_wav_float,
    )

    rng = np.random.RandomState(9)
    sig = rng.randint(-32767, 32768, 300).astype(np.int16)
    for bits in (32, 64):
        rate, dec = decode_wav(encode_wav_float(sig, rate=22050, bits=bits))
        assert rate == 22050
        assert np.array_equal(dec[:, 0], sig)
    # stereo
    st = np.stack([sig, sig[::-1]], axis=1)
    _r, dec = decode_wav(encode_wav_float(st))
    assert np.array_equal(dec, st)
    # out-of-range float clips instead of wrapping
    wav = bytearray(encode_wav_float(np.array([0], np.int16)))
    wav[-4:] = struct.pack("<f", 2.5)
    assert decode_wav(bytes(wav))[1][0, 0] == 32767
    wav[-4:] = struct.pack("<f", float("nan"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-finite"):
        decode_wav(bytes(wav))


def test_wav_extensible_subformat_dispatch():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) must dispatch on the SubFormat
    GUID: a float-subformat extensible file previously decoded as int32
    PCM garbage. PCM and float GUIDs both route correctly; a corrupt
    GUID suffix is refused."""
    import struct

    import numpy as np

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_wav,
        encode_wav_float,
    )

    guid_suffix = (
        b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    sig = np.array([100, -2000, 32767, -32768], np.int16)

    def to_extensible(wav: bytes, sub: int) -> bytes:
        # rewrite the 16-byte fmt body as a 40-byte extensible one
        body = bytearray(wav[20:36])
        bits = struct.unpack_from("<H", body, 14)[0]
        struct.pack_into("<H", body, 0, 0xFFFE)
        ext = (
            struct.pack("<HHI", 22, bits, 0)
            + struct.pack("<H", sub)
            + guid_suffix
        )
        rest = wav[36:]
        return (
            wav[:16]
            + struct.pack("<I", 16 + len(ext))
            + bytes(body)
            + ext
            + rest
        )

    pcm = to_extensible(encode_wav(sig), 1)
    _r, d = decode_wav(pcm)
    assert np.array_equal(d[:, 0], sig)

    flt = encode_wav_float(sig)
    # float WAV layout: fmt at 12 (16-byte body), fact, data — rebuild
    # with an extensible fmt; reuse to_extensible's arithmetic by
    # noting its offsets only assume fmt-at-12 with a 16-byte body
    flt_ext = to_extensible(flt, 3)
    _r, d = decode_wav(flt_ext)
    assert np.array_equal(d[:, 0], sig)

    import pytest as _pytest

    bad = bytearray(pcm)
    bad[bad.find(guid_suffix) + 3] ^= 0xFF
    with _pytest.raises(ValueError, match="GUID"):
        decode_wav(bytes(bad))


def test_gif_truncation_is_valueerror():
    """Truncating an animation anywhere must surface as ValueError
    (the per-row fault-isolation contract), never IndexError."""
    import numpy as np
    import pytest as _pytest

    from articulation_vector_db_api_spark.functions.pixels import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = np.array([[0] * 3, [255] * 3], np.uint8)
    gif = encode_gif_animation(
        [{"indices": np.ones((6, 6), int), "delay_cs": 2}],
        pal,
        (6, 6),
    )
    for cut in (7, 14, len(gif) // 2, len(gif) - 2):
        with _pytest.raises(ValueError):
            decode_gif_frames(gif[:cut])
