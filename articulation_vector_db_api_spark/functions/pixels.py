"""REAL pixel codecs with no imaging library — public-spec decoders
for the containers whose compression is stdlib-expressible.

The reference never decodes media (its corpus is PDFs read as text,
/root/reference/main.py:106-115); the engine's multimodal columns
(operators/multimodal.py) previously decoded DIMENSIONS natively but
gated PIXEL decode behind a deployment-provided imaging library. This
module removes that wall for the formats whose full pixel path is
specified by public documents and needs only ``zlib``:

- PNG (W3C PNG spec, ISO/IEC 15948): chunk walk, IDAT concat +
  inflate, all five scanline filters (None/Sub/Up/Average/Paeth)
  un-applied; 8-bit greyscale / RGB / RGBA and palette images, plain
  or Adam7-interlaced (seven sub-image passes woven back by their
  pass geometry).
- BMP (Windows DIB): uncompressed 8/24/32-bit rows, 4-byte stride
  padding, bottom-up or top-down.
- netpbm P5/P6 (maxval ≤ 255): raster follows the header verbatim.
- GIF (GIF89a spec): real variable-width LZW (appendix F), global and
  local color tables, interlace de-weave; ANIMATION decodes fully —
  Graphic Control Extensions (delay, transparency index) and all three
  disposal methods (leave / restore-background / restore-previous)
  composite each frame onto the logical screen (decode_gif_frames).

JPEG decodes natively too — baseline sequential AND progressive
(functions/jpeg.py: marker walk, Huffman entropy decode, multi-scan
successive-approximation accumulation, 8×8 IDCT, chroma upsampling);
lossless WebP decodes natively as well (functions/vp8l.py: LZ77 +
canonical prefix codes + all four transforms); arithmetic-coded JPEG
and lossy VP8 WebP genuinely need more codec machinery and remain
gated. The encoder below makes
the decode path oracle-checkable end-to-end: encode arbitrary bytes as
a PNG (cycling through ALL five filter types), decode them back, and
the pixel statistics must equal byte statistics computed directly by
the oracle — a full-value correctness proof of the codec itself
(suites/multimodal.py:multimodal_pixel_roundtrip).

Scale shape: codecs run inside Arrow-batched ``mapInPandas`` where the
payload bytes live — a narrow map, no shuffle. Unfiltering is
vectorized where the recurrence allows (None/Up whole-row, Sub as a
per-channel running sum); Average/Paeth are inherently sequential in x
and run as scalar integer loops (no per-pixel array allocation).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunks(b: bytes):
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        yield ctype, b[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            return
        i += 12 + length  # length + type + data + crc


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    # PNG spec §9.4: predictor closest to a+b-c, ties a then b then c
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(b: bytes) -> np.ndarray:
    """Full PNG pixel decode → uint8 array of shape (h, w, channels).

    Supports bit depth 8, color types 0 (grey), 2 (RGB), 3 (palette),
    6 (RGBA), both non-interlaced and Adam7-interlaced — the
    overwhelming share of real-world PNGs. Anything else raises
    ValueError (callers keep per-row fault isolation, the reference's
    O7 shape)."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    ihdr = palette = None
    idat = bytearray()
    for ctype, data in _chunks(bytes(b)):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    nch = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype_)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {ctype_}")
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        # Adam7: seven independently-filtered sub-images, woven back
        # into the full grid by their pass geometry
        px2 = np.zeros((h, w, nch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            size = ph * (pw * nch + 1)
            sub = _unfilter_scanlines(raw[off : off + size], ph, pw, nch)
            off += size
            px2[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
        if off != len(raw):
            raise ValueError("PNG pixel payload has wrong length")
        px = px2
    else:
        stride = w * nch
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel payload has wrong length")
        px = _unfilter_scanlines(raw, h, w, nch).reshape(h, w, nch)
    if ctype_ == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        px = palette[px[:, :, 0]]
    return px


def _unfilter_scanlines(raw: bytes, h: int, w: int, nch: int) -> np.ndarray:
    """Reverse the five PNG scanline filters over one (sub-)image of
    ``h`` rows × ``w`` pixels; returns the (h, w*nch) reconstruction."""
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    raw = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, cur = int(ftypes[y]), rows[y]
        prev = out[y - 1] if y else zero_row
        if ft == 0:  # None
            out[y] = cur
        elif ft == 1:  # Sub: recon is a per-channel running sum mod 256
            sums = cur.reshape(w, nch).astype(np.int64).cumsum(axis=0)
            out[y] = (sums & 0xFF).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            out[y] = cur + prev
        elif ft == 3:  # Average — sequential in x, scalar int math
            cur_l, prev_l = cur.tolist(), prev.tolist()
            line_l = [0] * stride
            for x in range(nch):
                line_l[x] = (cur_l[x] + prev_l[x] // 2) & 0xFF
            for x in range(nch, stride):
                line_l[x] = (
                    cur_l[x] + (line_l[x - nch] + prev_l[x]) // 2
                ) & 0xFF
            out[y] = line_l
        elif ft == 4:  # Paeth — sequential in x, scalar int math
            cur_l, prev_l = cur.tolist(), prev.tolist()
            line_l = [0] * stride
            for x in range(nch):
                # Paeth(0, up, 0) = up (pa=|up| beats pb=0 only at 0)
                line_l[x] = (cur_l[x] + prev_l[x]) & 0xFF
            for x in range(nch, stride):
                a, bb, c = line_l[x - nch], prev_l[x], prev_l[x - nch]
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                line_l[x] = (cur_l[x] + pred) & 0xFF
            out[y] = line_l
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    return out


def encode_png(
    arr: np.ndarray,
    filters: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal spec-conformant PNG encoder (8-bit grey/RGB/RGBA,
    plain or Adam7-interlaced). ``filters`` selects the filter type
    per scanline (cycling) — the round-trip tests use it to force
    every unfilter path through the decoder; default is filter 0
    everywhere."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(nch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {nch}")

    def filter_sub(sub: np.ndarray) -> bytearray:
        sh, sw = sub.shape[:2]
        sstride = sw * nch
        flat = sub.reshape(sh, sstride).astype(np.int16)
        zero_row = np.zeros(sstride, dtype=np.int16)
        lines = bytearray()
        for y in range(sh):
            ft = filters[y % len(filters)] if filters else 0
            cur = flat[y]
            prev = flat[y - 1] if y else zero_row
            left = np.concatenate(
                [np.zeros(nch, dtype=np.int16), cur[:-nch]]
            )
            ul = np.concatenate(
                [np.zeros(nch, dtype=np.int16), prev[:-nch]]
            )
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = cur - left
            elif ft == 2:
                enc = cur - prev
            elif ft == 3:
                enc = cur - (left + prev) // 2
            elif ft == 4:
                enc = cur - _paeth(
                    left.astype(np.uint8), prev.astype(np.uint8),
                    ul.astype(np.uint8),
                )
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            lines.append(ft)
            lines += (enc & 0xFF).astype(np.uint8).tobytes()
        return lines

    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += filter_sub(sub)
    else:
        lines = filter_sub(a)

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype_b
            + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 8/24/32-bit BMP pixel decode → (h, w, channels).

    Rows are 4-byte aligned; positive biHeight means bottom-up storage
    (flipped here to natural top-down order). 24/32-bit rows are BGR(A)
    on disk and returned RGB(A); 8-bit rows index the color table."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (dib,) = struct.unpack_from("<I", b, 14)
    if dib < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib}")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    h, bottom_up = abs(h_raw), h_raw > 0
    stride = ((w * bpp // 8) + 3) & ~3
    raster = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = raster.reshape(h, stride)
    if bpp == 8:
        # color table: dib header end → data_off, BGRX quads
        table = np.frombuffer(
            b, dtype=np.uint8, count=data_off - 14 - dib, offset=14 + dib
        ).reshape(-1, 4)
        px = table[rows[:, :w]][:, :, [2, 1, 0]]  # BGRX → RGB
    else:
        nch = bpp // 8
        px = rows[:, : w * nch].reshape(h, w, nch)
        px = px[:, :, [2, 1, 0]] if nch == 3 else px[:, :, [2, 1, 0, 3]]
    return px[::-1].copy() if bottom_up else px.copy()


def decode_netpbm(b: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6) pixel decode, maxval ≤ 255."""
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm stream")
    nch = 1 if b[:2] == b"P5" else 3
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            i = b.index(b"\n", i)
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            tokens.append(int(b[i:j]))
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated netpbm header")
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    i += 1  # exactly one whitespace byte separates header from raster
    return (
        np.frombuffer(b, dtype=np.uint8, count=h * w * nch, offset=i)
        .reshape(h, w, nch)
        .copy()
    )


def decode_pixels(payload: bytes) -> np.ndarray:
    """Dispatch on magic → (h, w, channels) uint8 pixels, or raise.

    The REAL counterpart of operators/multimodal.py:decode_image's
    dimension sniff: PNG/BMP/netpbm/GIF/JPEG (baseline + progressive),
    lossless WebP, and TIFF (uncompressed/PackBits/LZW/Deflate, both
    byte orders, predictor-2) decode fully here; arithmetic-coded
    JPEG, lossy VP8 WebP, and JPEG-in-TIFF still raise
    NotImplementedError.

    EXCEPTION CONTRACT: raises only ValueError (malformed/unsupported
    stream) or NotImplementedError (codec-needing format) — the two
    types every caller's per-row fault isolation catches. Internal
    parse failures (zlib.error on corrupt deflate, struct.error /
    IndexError on truncation, bad palette indices) are converted here
    so a single corrupt payload can never abort a whole Spark task."""
    b = bytes(payload)
    if b[:8] == _PNG_SIG:
        dec = decode_png
    elif b[:2] == b"BM":
        dec = decode_bmp
    elif b[:2] in (b"P5", b"P6"):
        dec = decode_netpbm
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        dec = decode_gif
    elif b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        # baseline sequential AND progressive decode natively
        # (functions/jpeg.py); arithmetic/lossless variants raise
        # NotImplementedError from inside the marker walk
        dec = decode_jpeg
    elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from .vp8l import decode_vp8l

        # lossless WebP decodes natively (functions/vp8l.py); lossy
        # VP8 raises NotImplementedError from inside the chunk walk
        dec = decode_vp8l
    elif b[:4] == b"qoif":
        from .qoi import decode_qoi

        # QOI decodes natively (functions/qoi.py, lossless)
        dec = decode_qoi
    elif b[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        # uncompressed/PackBits/LZW/Deflate TIFF decode natively
        # (functions/tiff.py, both byte orders, predictor-2 undo);
        # JPEG-in-TIFF strips raise NotImplementedError from inside
        # the IFD walk
        dec = decode_tiff
    else:
        raise NotImplementedError(
            "pixel decode of this format requires a codec library "
            "(PNG/BMP/PGM/PPM/GIF/JPEG/lossless-WebP/TIFF decode natively)"
        )
    try:
        return dec(b)
    except (zlib.error, struct.error, IndexError) as exc:
        raise ValueError(f"corrupt {dec.__name__[7:]} stream: {exc}") from exc


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample: output pixel (y, x) copies source
    pixel (floor(y*h/out_h), floor(x*w/out_w)) — pure integer index
    math, bit-reproducible in any engine."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs].copy()


def downscale_box(px: np.ndarray, factor: int) -> np.ndarray:
    """Exact box-filter downscale by an integer factor: each output
    pixel is floor(mean) of its factor×factor block — the antialiased
    downsample a vision pipeline runs before feature extraction,
    expressed entirely in integer arithmetic so the result is
    bit-identical across engines and partitionings. Requires
    dimensions divisible by the factor (callers pad or crop first)."""
    h, w, nch = px.shape
    if h % factor or w % factor:
        raise ValueError(f"dimensions {h}x{w} not divisible by {factor}")
    blocks = px.reshape(h // factor, factor, w // factor, factor, nch)
    sums = blocks.astype(np.int64).sum(axis=(1, 3))
    return (sums // (factor * factor)).astype(np.uint8)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW (GIF89a spec appendix F): variable code width
    from min_code_size+1 up to 12 bits, little-endian bit packing,
    CLEAR resets the table, EOI terminates."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh() -> list[list[int]]:
        return [[i] for i in range(clear)] + [[], []]

    table = fresh()
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            if prev is not None:
                table.append(prev + entry[:1])
                # width grows when the NEXT code could overflow it
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Matching LZW encoder (string-table variant) — exists so the
    decoder's dict-growth and KwKwK paths are round-trip testable
    without an imaging library."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        # decoder grows width right after adding the SAME entry; stay in step
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = (px,)
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> np.ndarray:
    """First-frame GIF pixel decode → (screen_h, screen_w, 3) RGB —
    real LZW (GIF89a spec), interlace de-woven, local color table
    honored, and the frame COMPOSITED onto the logical screen at its
    descriptor's left/top offset (optimized GIFs routinely store
    sub-rectangle frames; returning the bare frame would contradict
    decode_image's screen dimensions for the same payload). Uncovered
    screen area takes the background color."""
    frames = decode_gif_frames(b, max_frames=1)
    return frames[0][1]


def decode_gif_frames(
    b: bytes, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """FULL animated-GIF decode (GIF89a spec §23): every frame
    composited onto the logical screen → [(delay_cs, RGB canvas)].

    Graphic Control Extensions carry each frame's delay (centiseconds),
    transparency index (transparent pixels leave the canvas unchanged)
    and DISPOSAL method, all honored: 0/1 leave the frame in place,
    2 restores the frame's region to the background color, 3 restores
    it to the canvas as it was before the frame rendered. Other
    extensions (NETSCAPE loop, comments) skip by their sub-block
    lengths. Compositing happens in RGB so per-frame LOCAL color
    tables can't corrupt earlier frames' pixels.

    EXCEPTION CONTRACT: ValueError for any malformed/truncated stream
    (byte indexing past end is converted, so an IndexError can never
    escape a caller's per-row fault isolation)."""
    try:
        return _decode_gif_frames(b, max_frames)
    except IndexError as exc:
        raise ValueError("truncated GIF stream") from exc


def _decode_gif_frames(
    b: bytes, max_frames: int | None
) -> list[tuple[int, np.ndarray]]:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    screen_w = int.from_bytes(b[6:8], "little")
    screen_h = int.from_bytes(b[8:10], "little")
    flags = b[10]
    bg_index = b[11]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, count=3 * n, offset=i).reshape(-1, 3)
        i += 3 * n
    bg = bg_index if (gct is not None and bg_index < len(gct)) else 0
    bg_rgb = gct[bg] if gct is not None else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (screen_h, screen_w, 3)).copy()
    frames: list[tuple[int, np.ndarray]] = []
    # pending Graphic Control Extension state for the NEXT image
    delay_cs, disposal, transparent = 0, 0, None
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-blocks
            label = b[i + 1]
            i += 2
            if label == 0xF9:  # Graphic Control Extension
                size = b[i]
                if size != 4:
                    raise ValueError("bad GIF graphic control block size")
                packed = b[i + 1]
                delay_cs = int.from_bytes(b[i + 2 : i + 4], "little")
                disposal = (packed >> 2) & 0x07
                transparent = b[i + 4] if packed & 0x01 else None
                if disposal > 3:
                    raise ValueError(
                        f"reserved GIF disposal method {disposal}"
                    )
            while b[i]:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            left = int.from_bytes(b[i + 1 : i + 3], "little")
            top = int.from_bytes(b[i + 3 : i + 5], "little")
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            iflags = b[i + 9]
            i += 10
            if left + w > screen_w or top + h > screen_h:
                raise ValueError("GIF frame exceeds its logical screen")
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    b, np.uint8, count=3 * n, offset=i
                ).reshape(-1, 3)
                i += 3 * n
            if table is None:
                raise ValueError("GIF frame has no color table")
            mcs = b[i]
            i += 1
            data = bytearray()
            while b[i]:
                size = b[i]
                data += b[i + 1 : i + 1 + size]
                i += 1 + size
            i += 1  # block terminator
            idx = _lzw_decode(bytes(data), mcs)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            grid = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = [
                    y
                    for start, step in _GIF_INTERLACE_PASSES
                    for y in range(start, h, step)
                ]
                woven = np.empty_like(grid)
                woven[rows] = grid
                grid = woven
            if int(grid.max(initial=0)) >= len(table):
                raise ValueError("GIF index outside color table")
            region = canvas[top : top + h, left : left + w]
            saved = region.copy() if disposal == 3 else None
            rgb = table[grid]
            if transparent is not None:
                mask = grid != transparent
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append((delay_cs, canvas.copy()))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            if disposal == 2:  # restore region to background
                region[:] = bg_rgb
            elif disposal == 3:  # restore region to pre-frame canvas
                region[:] = saved
            delay_cs, disposal, transparent = 0, 0, None
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def encode_gif_animation(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int],
    bg_index: int = 0,
) -> bytes:
    """Animated-GIF89a encoder — the roundtrip witness for
    decode_gif_frames. Each frame dict: ``indices`` (h, w int array),
    ``left``/``top`` offsets, ``delay_cs``, ``disposal`` (0-3),
    optional ``transparent`` index. One global color table; a
    NETSCAPE2.0 loop extension is emitted so the decoder's
    skip-unknown-extensions path is always exercised."""
    screen_h, screen_w = screen
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = palette
    mcs = max(2, bits)
    out = bytearray()
    out += (
        b"GIF89a"
        + screen_w.to_bytes(2, "little")
        + screen_h.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), bg_index, 0])
        + table.tobytes()
    )
    # NETSCAPE2.0 application extension (infinite loop)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        indices = np.asarray(f["indices"])
        h, w = indices.shape
        transparent = f.get("transparent")
        packed = ((f.get("disposal", 0) & 0x07) << 2) | (
            0x01 if transparent is not None else 0x00
        )
        out += (
            b"\x21\xf9\x04"
            + bytes([packed])
            + int(f.get("delay_cs", 0)).to_bytes(2, "little")
            + bytes([transparent or 0, 0])
        )
        lzw = _lzw_encode(indices.reshape(-1).tolist(), mcs)
        blocks = bytearray()
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        out += (
            b"\x2c"
            + int(f.get("left", 0)).to_bytes(2, "little")
            + int(f.get("top", 0)).to_bytes(2, "little")
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + b"\x00"
            + bytes([mcs])
            + bytes(blocks)
        )
    out += b"\x3b"
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlaced: bool = False
) -> bytes:
    """Single-frame GIF89a encoder (global color table, real LZW) —
    the round-trip witness for decode_gif."""
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = palette
    mcs = max(2, bits)
    if interlaced:
        rows = [
            y
            for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        flat = indices[rows].reshape(-1).tolist()
    else:
        flat = indices.reshape(-1).tolist()
    lzw = _lzw_encode(flat, mcs)
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), 0, 0])
        + table.tobytes()
        + b"\x2c"
        + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x40 if interlaced else 0x00])
        + bytes([mcs])
        + bytes(blocks)
        + b"\x3b"
    )
