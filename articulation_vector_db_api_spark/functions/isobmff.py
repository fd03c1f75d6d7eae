"""ISOBMFF (ISO/IEC 14496-12) box walker — the container structure
under MP4/MOV video and AVIF/HEIF images.

Pure header parsing, no codec: boxes are (uint32 size, 4cc type
[, uint64 largesize]) records, containers nest child boxes in their
payload. That is enough to read the metadata a 100 TB video/image
curation pipeline filters on BEFORE any decode — MP4 duration and
track dimensions (mvhd/tkhd), AVIF pixel dimensions (meta → iprp →
ipco → ispe) — closing the one container family
operators/multimodal.py:decode_image previously could not walk.
Sample data (mdat) is never touched; the walk cost is the box tree,
bytes of it, not the media.
"""

from __future__ import annotations

import struct

# containers whose payload is a sequence of child boxes; meta is a
# FullBox container (4-byte version/flags prefix before children)
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"iprp", b"ipco",
    b"moof", b"traf", b"edts",
}
_FULLBOX_CONTAINERS = {b"meta"}


def walk_boxes(b: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end, depth) over the box
    tree, recursing into known containers. Tolerates the 64-bit
    largesize form and size=0 (box extends to end of enclosure)."""
    end = len(b) if end is None else end
    stack = [(start, end, 0)]
    while stack:
        i, stop, depth = stack.pop()
        while i + 8 <= stop:
            (size,) = struct.unpack_from(">I", b, i)
            btype = b[i + 4 : i + 8]
            payload = i + 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", b, i + 8)
                payload = i + 16
            elif size == 0:
                size = stop - i
            if size < 8 or i + size > stop:
                raise ValueError(f"malformed box {btype!r} at {i}")
            body_start = payload
            if btype in _FULLBOX_CONTAINERS:
                body_start += 4  # version/flags
            yield btype, payload, i + size, depth
            if btype in _CONTAINERS or btype in _FULLBOX_CONTAINERS:
                # children first (depth-first), then continue siblings
                stack.append((i + size, stop, depth))
                i, stop, depth = body_start, i + size, depth + 1
                continue
            i += size


def parse_mp4_meta(b: bytes) -> dict:
    """Duration and per-track dimensions from moov — the pre-decode
    facts (length, resolution, track count) a video curation filter
    needs. Handles mvhd/tkhd versions 0 (32-bit) and 1 (64-bit)."""
    out: dict = {"duration_sec": None, "tracks": []}
    if b[4:8] != b"ftyp":
        raise ValueError("not an ISOBMFF stream (no ftyp)")
    for btype, p, q, _d in walk_boxes(b):
        if btype == b"mvhd":
            ver = b[p]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", b, p + 20)
            else:
                ts, dur = struct.unpack_from(">II", b, p + 12)
            out["duration_sec"] = dur / ts if ts else None
        elif btype == b"tkhd":
            ver = b[p]
            # track_ID follows version/flags + creation/modification
            # times (4+4 bytes in v0, 8+8 in v1)
            base = p + (20 if ver == 1 else 12)
            # width/height are 16.16 fixed point at the box tail
            w, h = struct.unpack_from(">II", b, q - 8)
            (track_id,) = struct.unpack_from(">I", b, base)
            out["tracks"].append(
                {"track_id": track_id, "width": w >> 16, "height": h >> 16}
            )
    if out["duration_sec"] is None and not out["tracks"]:
        raise ValueError("ISOBMFF stream has no moov metadata")
    return out


def avif_dimensions(b: bytes) -> tuple[int, int]:
    """AVIF/HEIF pixel dimensions from the ispe property (ISO 23008-12
    §6.5.3: FullBox with uint32 width, height) — found by walking
    meta → iprp → ipco. The codec payload (av1C/mdat) is never read."""
    for btype, p, _q, _d in walk_boxes(b):
        if btype == b"ispe":
            w, h = struct.unpack_from(">II", b, p + 4)
            return w, h
    raise ValueError("no ispe property (not an AVIF/HEIF still?)")


def tiff_dimensions(b: bytes) -> tuple[int, int]:
    """TIFF dimension decode (TIFF 6.0 spec): endian header, first IFD
    walk, ImageWidth (256) / ImageLength (257) tags as SHORT or LONG.
    Pure directory parsing — strips/tiles are never read. Also the
    carrier format of EXIF metadata blocks."""
    if b[:4] == b"II*\x00":
        endian = "little"
    elif b[:4] == b"MM\x00*":
        endian = "big"
    else:
        raise ValueError("not a TIFF stream")

    def u(off: int, size: int) -> int:
        chunk = b[off : off + size]
        if len(chunk) < size:
            raise ValueError("truncated TIFF")
        return int.from_bytes(chunk, endian)

    ifd = u(4, 4)
    n = u(ifd, 2)
    width = height = None
    for k in range(n):
        e = ifd + 2 + 12 * k
        tag, dtype = u(e, 2), u(e + 2, 2)
        if tag in (256, 257):
            # value fits inline: SHORT (3) reads 2 bytes, LONG (4)
            # reads 4 — both left-justified in the value field
            if dtype == 3:
                val = u(e + 8, 2)
            elif dtype == 4:
                val = u(e + 8, 4)
            else:
                raise ValueError(f"unexpected TIFF dim type {dtype}")
            if tag == 256:
                width = val
            else:
                height = val
    if width is None or height is None:
        raise ValueError("TIFF IFD lacks dimension tags")
    return width, height
