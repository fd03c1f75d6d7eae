"""TIFF 6.0 baseline codec — stdlib + numpy only, like the PNG/GIF/JPEG
siblings in this package.

TIFF is the scanned-document and scientific-imaging carrier a real
multimodal corpus hits constantly (and the byte layout EXIF embeds —
`functions/isobmff.py:tiff_dimensions` already walks its IFDs for
dimensions; this module decodes the pixels). Implemented straight from
the public TIFF 6.0 specification:

- decode: both byte orders (``II``/``MM``), 8-bit greyscale
  (PhotometricInterpretation 0/1, WhiteIsZero inverted to standard
  intensity) and RGB, chunky planar config, strip-organized, with
  Compression 1 (none) and 32773 (PackBits). LZW/JPEG/Deflate
  compressions raise NotImplementedError (honest codec gates, same
  policy as arithmetic JPEG and lossy VP8); structural damage raises
  ValueError.
- encode: spec-conformant writer for greyscale/RGB with configurable
  byte order, rows-per-strip, and none/PackBits compression — the
  test-vector generator, exactly the role encode_png/encode_gif play.

The reference has no image path at all (/root/reference/main.py is
text-only); this is engine surface for the multimodal column family.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 3: 2, 4: 4, 7: 1}  # BYTE, SHORT, LONG, UNDEFINED


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits per TIFF 6.0 §9: n in [0,127] copies n+1 literal
    bytes; n in [129,255] repeats the next byte 257-n times; 128 is a
    no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            lit = data[i : i + n + 1]
            if len(lit) != n + 1:
                raise ValueError("truncated PackBits literal run")
            out += lit
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits expanded to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _packbits_encode_row(row: bytes) -> bytes:
    """Greedy run/literal emitter; rows encode independently (TIFF 6.0
    recommends PackBits never cross a row boundary)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), row[i]])
            i = j
            continue
        # literal stretch: until a run of >=3 starts (2-runs stay
        # literal — replacing them never shrinks the output)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW per TIFF 6.0 §13: MSB-first bit packing (the
    opposite of GIF's), fixed 8-bit symbols, ClearCode 256 / EOI 257,
    9→12 bit code widths with the spec's EARLY-CHANGE quirk (the width
    bumps one code earlier than the table size strictly requires)."""
    CLEAR, EOI = 256, 257
    bitpos = 0
    nbits = len(data) * 8
    width = 9
    table: list[bytes] = []
    prev = b""
    out = bytearray()
    while True:
        if bitpos + width > nbits:
            raise ValueError("truncated TIFF LZW stream (no EOI)")
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte : byte + 3].ljust(3, b"\x00"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = b""
            continue
        if code == EOI:
            break
        if not table:
            raise ValueError("TIFF LZW stream must start with ClearCode")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} out of range")
        out += entry
        if prev:
            table.append(prev + entry[:1])
        prev = entry
        # early change, decoder side: the decoder's table add for a
        # given code happens one READ after the encoder's add for the
        # same code, so the decoder must widen one entry earlier than
        # the encoder's next_code == (1<<width)-1 rule to read the
        # first widened code correctly (the TIFF 6.0 pseudo-code's
        # notorious off-by-one; libtiff agrees with this side)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW expanded to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Encoder twin of _lzw_decode_tiff (vector generator): greedy
    longest-match, ClearCode-reset before the 12-bit table fills,
    early-change width bumps mirroring the decoder's."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    width = 9
    table = fresh()
    next_code = 258
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4093:
            # reset with room to spare; the decoder follows any CLEAR
            emit(CLEAR, width)
            table = fresh()
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _split_jpeg_tables(jfif: bytes) -> tuple[bytes, bytes]:
    """Split a JFIF stream into (SOI+DQT/DHT+EOI tables stream,
    stream-with-tables-removed) — the JPEGTables (tag 347) layout of
    TIFF Technical Note #2."""
    if jfif[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    rest = bytearray(b"\xff\xd8")
    i = 2
    while i + 2 <= len(jfif):
        if jfif[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        m = jfif[i + 1]
        if m == 0xD9:
            rest += jfif[i : i + 2]
            break
        if m == 0xDA:  # SOS: entropy data follows verbatim
            rest += jfif[i:]
            break
        size = int.from_bytes(jfif[i + 2 : i + 4], "big")
        seg = jfif[i : i + 2 + size]
        if m in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        i += 2 + size
    return b"\xff\xd8" + bytes(tables) + b"\xff\xd9", bytes(rest)


def _read_ifd(b: bytes, e: str) -> dict[int, list[int]]:
    off = struct.unpack(e + "I", b[4:8])[0]
    if off + 2 > len(b):
        raise ValueError("truncated TIFF: IFD offset past EOF")
    n = struct.unpack(e + "H", b[off : off + 2])[0]
    tags: dict[int, list[int]] = {}
    for k in range(n):
        ent = b[off + 2 + 12 * k : off + 14 + 12 * k]
        if len(ent) != 12:
            raise ValueError("truncated TIFF IFD entry")
        tag, dtype, count = struct.unpack(e + "HHI", ent[:8])
        if dtype not in _TYPE_SIZES:
            continue  # RATIONAL resolutions etc. — not needed here
        size = _TYPE_SIZES[dtype] * count
        raw = ent[8:12] if size <= 4 else None
        if raw is None:
            p = struct.unpack(e + "I", ent[8:12])[0]
            raw = b[p : p + size]
            if len(raw) != size:
                raise ValueError(f"truncated TIFF value for tag {tag}")
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[dtype]
        tags[tag] = list(
            struct.unpack(e + fmt * count, raw[: _TYPE_SIZES[dtype] * count])
        )
    return tags


def decode_tiff(b: bytes) -> np.ndarray:
    """TIFF 6.0 → (h, w, channels) uint8. See module docstring for the
    supported envelope; unsupported COMPRESSIONS raise
    NotImplementedError, structural damage raises ValueError."""
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    t = _read_ifd(b, e)
    try:
        w = t[256][0]
        h = t[257][0]
        offsets = t[273]
        counts = t[279]
    except KeyError as exc:
        raise ValueError(f"TIFF IFD lacks required tag {exc}") from exc
    spp = t.get(277, [1])[0]
    bits = t.get(258, [8] * spp)
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    rps = t.get(278, [h])[0]
    planar = t.get(284, [1])[0]
    if any(v != 8 for v in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} (8 only)")
    if planar not in (1, 2):
        raise ValueError(f"unknown TIFF PlanarConfiguration {planar}")
    if planar == 2 and t.get(259, [1])[0] == 7:
        raise NotImplementedError("planar JPEG-in-TIFF")
    if photo not in (0, 1, 2) and not (photo == 6 and comp == 7):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if comp not in (1, 5, 7, 8, 32773, 32946):
        if comp == 6:
            # TIFF 6.0's original JPEG scheme was so underspecified it
            # was formally deprecated by TIFF Technical Note #2; real
            # files use the new-style scheme (compression 7) instead
            raise NotImplementedError(
                "old-style JPEG-in-TIFF (compression 6) is deprecated "
                "by TIFF TechNote 2 and not supported"
            )
        raise ValueError(f"unknown TIFF compression {comp}")
    jpeg_tables = bytes(t[347]) if 347 in t else b""
    if jpeg_tables and not (
        jpeg_tables[:2] == b"\xff\xd8" and jpeg_tables[-2:] == b"\xff\xd9"
    ):
        raise ValueError("JPEGTables must be an SOI..EOI tables stream")
    predictor = t.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    strips_per_plane = -(-h // rps) if rps > 0 else 0
    n_planes = spp if planar == 2 else 1
    strip_spp = 1 if planar == 2 else spp
    if rps <= 0 or len(offsets) != strips_per_plane * n_planes:
        raise ValueError("strip count inconsistent with RowsPerStrip")
    import zlib

    out = bytearray()
    for i, (o, c) in enumerate(zip(offsets, counts)):
        strip = b[o : o + c]
        if len(strip) != c:
            raise ValueError("truncated TIFF strip data")
        # planar config 2: strips run channel-major — all of plane 0's
        # row blocks, then plane 1's, ... — each carrying ONE sample
        # per pixel
        rows = min(rps, h - (i % strips_per_plane) * rps)
        expected = rows * w * strip_spp
        if comp == 7:
            # new-style JPEG-in-TIFF (TechNote 2): each strip is a JPEG
            # stream; shared DQT/DHT segments may live in the
            # JPEGTables tag and splice in right after the strip's SOI
            from .jpeg import decode_jpeg

            if strip[:2] != b"\xff\xd8":
                raise ValueError("JPEG strip does not start with SOI")
            if jpeg_tables:
                strip = strip[:2] + jpeg_tables[2:-2] + strip[2:]
            arr = decode_jpeg(strip)
            if arr.shape != (rows, w, spp):
                raise ValueError(
                    f"JPEG strip decoded to {arr.shape}, expected "
                    f"{(rows, w, spp)}"
                )
            out += arr.tobytes()
            continue
        if comp == 32773:
            strip = _packbits_decode(strip, expected)
        elif comp == 5:
            strip = _lzw_decode_tiff(strip, expected)
        elif comp in (8, 32946):
            try:
                strip = zlib.decompress(strip)
            except zlib.error as exc:
                raise ValueError(f"corrupt Deflate TIFF strip: {exc}") from exc
            if len(strip) != expected:
                raise ValueError(
                    f"Deflate strip expanded to {len(strip)} bytes, "
                    f"expected {expected}"
                )
        elif len(strip) != expected:
            raise ValueError(
                f"strip {i} holds {len(strip)} bytes, expected {expected}"
            )
        if predictor == 2:
            # undo horizontal differencing: each sample accumulates
            # onto the pixel to its left, per row, per channel, mod 256
            arr = np.frombuffer(strip, dtype=np.uint8).reshape(
                rows, w, strip_spp
            )
            strip = (
                (arr.astype(np.uint64).cumsum(axis=1) & 0xFF)
                .astype(np.uint8)
                .tobytes()
            )
        out += strip
    if planar == 2:
        planes = np.frombuffer(bytes(out), dtype=np.uint8).reshape(
            spp, h, w
        )
        px = np.transpose(planes, (1, 2, 0))
    else:
        px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp)
    if photo == 0:
        px = 255 - px  # WhiteIsZero → standard min-is-black intensity
    return px.copy()


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    endian: str = "<",
    predictor: int = 1,
    jpeg_shared_tables: bool = False,
    planar: bool = False,
) -> bytes:
    """(h, w[, channels]) uint8 → spec-conformant TIFF 6.0 bytes.

    Greyscale (2-D or 1-channel) writes PhotometricInterpretation 1,
    3-channel writes RGB; ``compression`` is ``"none"``, ``"packbits"``,
    ``"lzw"``, ``"deflate"``, or ``"jpeg"`` (new-style TechNote-2
    strips, each a full baseline JFIF stream; photometric 6 for color);
    ``endian`` is ``"<"`` (II) or ``">"`` (MM); ``predictor`` 2 applies
    horizontal differencing before compression (the layout real
    LZW/Deflate TIFFs ship with; invalid with JPEG)."""
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError(f"encode_tiff supports 1 or 3 channels, got {spp}")
    if endian not in ("<", ">"):
        raise ValueError("endian must be '<' or '>'")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2, got {predictor}")
    comp = {
        "none": 1,
        "packbits": 32773,
        "lzw": 5,
        "deflate": 8,
        "jpeg": 7,
    }[compression]
    if comp == 7 and predictor == 2:
        raise ValueError("predictor 2 applies to LZW/Deflate, not JPEG")
    if comp == 7 and planar:
        raise ValueError("planar layout does not combine with JPEG strips")
    rps = rows_per_strip or h
    # planar config 2 writes channel-major plane images, each strip
    # carrying one sample per pixel; chunky writes the interleaved rows
    layout = (
        [px[:, :, ch : ch + 1] for ch in range(spp)]
        if planar and spp > 1
        else [px]
    )
    strips = []
    for plane in layout:
        pspp = plane.shape[2]
        if predictor == 2:
            diff = plane.astype(np.int16)
            diff[:, 1:, :] -= plane[:, :-1, :].astype(np.int16)
            raw = (diff % 256).astype(np.uint8).tobytes()
        else:
            raw = plane.tobytes()
        for top in range(0, h, rps):
            rows = min(rps, h - top)
            chunk = raw[top * w * pspp : (top + rows) * w * pspp]
            if comp == 32773:
                chunk = b"".join(
                    _packbits_encode_row(
                        chunk[r * w * pspp : (r + 1) * w * pspp]
                    )
                    for r in range(rows)
                )
            elif comp == 5:
                chunk = _lzw_encode_tiff(chunk)
            elif comp == 8:
                chunk = zlib.compress(chunk)
            elif comp == 7:
                from .jpeg import encode_jpeg_baseline

                strip_px = plane[top : top + rows]
                chunk = encode_jpeg_baseline(
                    strip_px if spp == 3 else strip_px[:, :, 0],
                    quality=100,
                )
            strips.append(chunk)

    jpeg_tables = b""
    if comp == 7 and jpeg_shared_tables:
        # hoist the identical DQT/DHT segments out of every strip into
        # the shared JPEGTables stream (tag 347)
        split = [_split_jpeg_tables(s) for s in strips]
        jpeg_tables = split[0][0]
        if any(t != jpeg_tables for t, _ in split):
            raise ValueError("strips disagree on JPEG tables")
        strips = [rest for _, rest in split]

    photo = (6 if comp == 7 else 2) if spp == 3 else 1
    # layout: 8-byte header | IFD | out-of-line arrays | strip data
    entries = []  # (tag, dtype, count, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [comp]))
    entries.append((262, 3, 1, [photo]))
    entries.append((273, 4, len(strips), None))  # offsets patched below
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 4, 1, [rps]))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    entries.append((284, 3, 1, [2 if planar and spp > 1 else 1]))
    if predictor == 2:
        entries.append((317, 3, 1, [2]))
    if jpeg_tables:
        entries.append((347, 7, len(jpeg_tables), list(jpeg_tables)))
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_at = 8 + ifd_size
    overflow = bytearray()
    inline: list[bytes] = []
    fmt = {1: "B", 3: "H", 4: "I", 7: "B"}
    # first pass sizes the out-of-line region so strip offsets are known
    for tag, dtype, count, values in entries:
        size = _TYPE_SIZES[dtype] * count
        if size > 4:
            overflow += b"\x00" * size
    data_at = overflow_at + len(overflow)
    strip_offsets = []
    pos = data_at
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    overflow = bytearray()
    for tag, dtype, count, values in entries:
        if values is None:
            values = strip_offsets
        size = _TYPE_SIZES[dtype] * count
        packed = struct.pack(endian + fmt[dtype] * count, *values)
        if size <= 4:
            inline.append(packed + b"\x00" * (4 - size))
        else:
            inline.append(
                struct.pack(endian + "I", overflow_at + len(overflow))
            )
            overflow += packed
    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", 8)
    out += struct.pack(endian + "H", len(entries))
    for (tag, dtype, count, _), val4 in zip(entries, inline):
        out += struct.pack(endian + "HHI", tag, dtype, count) + val4
    out += struct.pack(endian + "I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
