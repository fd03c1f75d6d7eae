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

_TYPE_SIZES = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


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
        fmt = {1: "B", 3: "H", 4: "I"}[dtype]
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
    if planar != 1:
        raise NotImplementedError("planar TIFF (PlanarConfiguration 2)")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if comp not in (1, 32773):
        gated = {5: "LZW", 6: "old-JPEG", 7: "JPEG", 8: "Deflate"}
        if comp in gated:
            raise NotImplementedError(
                f"{gated[comp]}-compressed TIFF requires a codec library"
            )
        raise ValueError(f"unknown TIFF compression {comp}")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    if rps <= 0 or len(offsets) != -(-h // rps):
        raise ValueError("strip count inconsistent with RowsPerStrip")
    out = bytearray()
    for i, (o, c) in enumerate(zip(offsets, counts)):
        strip = b[o : o + c]
        if len(strip) != c:
            raise ValueError("truncated TIFF strip data")
        rows = min(rps, h - i * rps)
        expected = rows * w * spp
        if comp == 32773:
            strip = _packbits_decode(strip, expected)
        elif len(strip) != expected:
            raise ValueError(
                f"strip {i} holds {len(strip)} bytes, expected {expected}"
            )
        out += strip
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp)
    if photo == 0:
        px = 255 - px  # WhiteIsZero → standard min-is-black intensity
    return px.copy()


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    endian: str = "<",
) -> bytes:
    """(h, w[, channels]) uint8 → spec-conformant TIFF 6.0 bytes.

    Greyscale (2-D or 1-channel) writes PhotometricInterpretation 1,
    3-channel writes RGB; ``compression`` is ``"none"`` or
    ``"packbits"``; ``endian`` is ``"<"`` (II) or ``">"`` (MM)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError(f"encode_tiff supports 1 or 3 channels, got {spp}")
    if endian not in ("<", ">"):
        raise ValueError("endian must be '<' or '>'")
    comp = {"none": 1, "packbits": 32773}[compression]
    rps = rows_per_strip or h
    raw = px.tobytes()
    strips = []
    for top in range(0, h, rps):
        rows = min(rps, h - top)
        chunk = raw[top * w * spp : (top + rows) * w * spp]
        if comp == 32773:
            chunk = b"".join(
                _packbits_encode_row(chunk[r * w * spp : (r + 1) * w * spp])
                for r in range(rows)
            )
        strips.append(chunk)

    photo = 2 if spp == 3 else 1
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
    entries.append((284, 3, 1, [1]))
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_at = 8 + ifd_size
    overflow = bytearray()
    inline: list[bytes] = []
    fmt = {1: "B", 3: "H", 4: "I"}
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
