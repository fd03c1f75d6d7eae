"""QOI ("Quite OK Image", qoiformat.org spec, public domain) — a
complete lossless codec in both directions, stdlib + numpy only.

QOI is the one modern image format whose ENTIRE spec fits on a page:
a 14-byte header, six chunk ops (RGB, RGBA, 64-slot INDEX keyed by
(3r+5g+7b+11a) mod 64, 2-bit DIFF, LUMA, RUN), wraparound byte
arithmetic, and an 8-byte end marker. It ships in ffmpeg/stb, so web
corpora genuinely contain it — and because every op is closed-form,
the engine's implementation is exact, not approximated: arbitrary
bytes roundtrip bit-identically (pinned by multimodal_qoi_roundtrip's
oracle and the op-level vectors in tests/test_qoi.py).

EXCEPTION CONTRACT: ValueError for malformed streams (bad magic,
bad channels/colorspace, pixel under/overrun, missing end marker) —
the per-row fault-isolation contract every decoder in functions/
keeps.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(px: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> QOI bytes."""
    if px.ndim != 3 or px.shape[2] not in (3, 4) or px.dtype != np.uint8:
        raise ValueError("QOI encodes (h, w, 3|4) uint8 arrays")
    h, w, ch = px.shape
    out = bytearray(_MAGIC + struct.pack(">IIBB", w, h, ch, 0))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, ch)
    for row in flat:
        cur = (int(row[0]), int(row[1]), int(row[2]),
               int(row[3]) if ch == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        k = _hash(*cur)
        if index[k] == cur:
            out.append(_OP_INDEX | k)
        else:
            index[k] = cur
            r, g, b, a = cur
            pr, pg, pb, pa = prev
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        _OP_DIFF
                        | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(_OP_RGB)
                    out += bytes((r, g, b))
            else:
                out.append(_OP_RGBA)
                out += bytes((r, g, b, a))
        prev = cur
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(b: bytes) -> np.ndarray:
    """QOI bytes -> (h, w, 3|4) uint8. Strict: the chunk stream must
    produce exactly width*height pixels and end with the 8-byte end
    marker."""
    if len(b) < 22 or b[:4] != _MAGIC:
        raise ValueError("not a QOI stream")
    w, h, ch, cs = struct.unpack_from(">IIBB", b, 4)
    if ch not in (3, 4):
        raise ValueError(f"QOI channels {ch} not in (3, 4)")
    if cs not in (0, 1):
        raise ValueError(f"QOI colorspace {cs} invalid")
    n = w * h
    if not 0 < n <= 64_000_000:
        raise ValueError(f"QOI dimensions {w}x{h} out of range")
    # cheapest possible encoding is one 62-pixel RUN per byte — a
    # header claiming more pixels than the stream could carry must be
    # a cheap ValueError, not a large allocation followed by one
    if len(b) - 22 < n // 62:
        raise ValueError(
            f"QOI stream too short for {w}x{h} pixels"
        )
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, bl, a = 0, 0, 0, 255
    p = 14
    i = 0
    end = len(b) - 8
    while i < n:
        if p >= end:
            raise ValueError("QOI chunk stream underruns pixel count")
        op = b[p]
        p += 1
        if op == _OP_RGB:
            if p + 3 > end:
                raise ValueError("truncated QOI RGB chunk")
            r, g, bl = b[p], b[p + 1], b[p + 2]
            p += 3
        elif op == _OP_RGBA:
            if p + 4 > end:
                raise ValueError("truncated QOI RGBA chunk")
            r, g, bl, a = b[p], b[p + 1], b[p + 2], b[p + 3]
            p += 4
        elif op >> 6 == _OP_INDEX >> 6:
            r, g, bl, a = index[op & 0x3F]
        elif op >> 6 == _OP_DIFF >> 6:
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            bl = (bl + (op & 3) - 2) % 256
        elif op >> 6 == _OP_LUMA >> 6:
            if p >= end:
                raise ValueError("truncated QOI LUMA chunk")
            dg = (op & 0x3F) - 32
            r = (r + dg + ((b[p] >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            bl = (bl + dg + (b[p] & 0xF) - 8) % 256
            p += 1
        else:  # RUN
            run = (op & 0x3F) + 1
            if i + run > n:
                raise ValueError("QOI run overruns pixel count")
            out[i : i + run] = (r, g, bl, a)
            i += run
            index[_hash(r, g, bl, a)] = (r, g, bl, a)
            continue
        index[_hash(r, g, bl, a)] = (r, g, bl, a)
        out[i] = (r, g, bl, a)
        i += 1
    if b[p : p + 8] != _END:
        raise ValueError("QOI stream missing end marker")
    px = out.reshape(h, w, 4)
    return px if ch == 4 else px[:, :, :3].copy()
