"""AIFF (Apple/EA-IFF 85) and Sun AU (.snd) audio containers —
encode + decode, numpy only. Both are plain structural formats from
public specs: AIFF is an IFF FORM of chunks (COMM with the channel/
frame/width facts and the sample rate as an 80-bit IEEE 754 extended
float, SSND with big-endian PCM); AU is a 24-byte header (magic
".snd", data offset/size, encoding, rate, channels) over big-endian
payload. The LLM-audio relevance: older speech corpora and
professional-audio exports ship as .aiff/.au, and both reduce to the
same int16 sample matrix the WAV path yields — so the curation
pipeline treats all three interchangeably.

Exception contract (shared with functions/audio.py): ValueError for
malformed streams, NotImplementedError for honest codec gates
(AIFF-C compression types, AU encodings beyond linear PCM + G.711
μ-law/A-law) — nothing else escapes per-row fault isolation.

Reference behavior parity: the reference (/root/reference/main.py)
has no audio path; frontier surface alongside functions/audio.py.
"""

from __future__ import annotations

import struct

import numpy as np

from .audio import _ALAW_TABLE, _ULAW_TABLE

__all__ = ["encode_aiff", "decode_aiff", "encode_au", "decode_au"]


def _ext80_from_int(rate: int) -> bytes:
    """Positive integer -> 80-bit IEEE 754 extended (sign 1, exponent
    15, mantissa 64 with the EXPLICIT integer bit), the COMM
    sampleRate encoding."""
    if rate <= 0:
        raise ValueError("AIFF sample rate must be positive")
    k = rate.bit_length() - 1
    exponent = 16383 + k
    mantissa = rate << (63 - k)
    return struct.pack(">HQ", exponent, mantissa)


def _ext80_to_int(b: bytes) -> int:
    if len(b) != 10:
        raise ValueError("AIFF extended float must be 10 bytes")
    exponent, mantissa = struct.unpack(">HQ", b)
    if exponent & 0x8000:
        raise ValueError("negative AIFF sample rate")
    if exponent == 0 and mantissa == 0:
        raise ValueError("zero AIFF sample rate")
    shift = exponent - 16383 - 63
    rate = mantissa << shift if shift >= 0 else mantissa >> -shift
    if rate <= 0 or rate > 10**7:
        raise ValueError("AIFF sample rate out of range")
    return int(rate)


def encode_aiff(
    samples: np.ndarray, rate: int = 16000, sample_size: int = 16
) -> bytes:
    """int array (n,) or (n, ch) -> AIFF bytes (big-endian PCM,
    sample_size 8/16/24/32 bits)."""
    if sample_size not in (8, 16, 24, 32):
        raise ValueError("AIFF sample_size must be 8/16/24/32")
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    width = sample_size // 8
    lo = -(1 << (sample_size - 1))
    hi = (1 << (sample_size - 1)) - 1
    xi = np.clip(x.astype(np.int64), lo, hi)
    if width in (1, 2, 4):
        data = xi.astype(f">i{width}").tobytes()
    else:  # 24-bit: big-endian 3-byte two's complement
        flat = (xi.reshape(-1) & 0xFFFFFF).astype(np.uint32)
        raw = flat.astype(">u4").tobytes()
        data = b"".join(
            raw[i + 1 : i + 4] for i in range(0, len(raw), 4)
        )
    comm = struct.pack(">hLh", ch, n, sample_size) + _ext80_from_int(rate)
    ssnd = struct.pack(">LL", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
        + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[int, np.ndarray]:
    """AIFF bytes -> (rate, int32 array (n, ch)). 8/16/24/32-bit
    big-endian PCM; AIFC compression types other than 'NONE'/'sowt'
    raise NotImplementedError ('sowt' is little-endian 16-bit, the
    common Mac variant)."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"FORM":
        raise ValueError("not an IFF FORM stream")
    form = b[8:12]
    if form not in (b"AIFF", b"AIFC"):
        raise ValueError(f"not an AIFF form: {form!r}")
    # Bound the chunk walk by the declared FORM size: bytes past the
    # FORM are not chunks (taggers commonly append ID3v1/v2 records —
    # r14 self-review F6: the unbounded walk parsed that garbage as a
    # chunk header and died on 'truncated AIFF chunk').
    (form_size,) = struct.unpack_from(">L", b, 4)
    end = min(len(b), 8 + form_size)
    if end < 12:
        raise ValueError("IFF FORM size too small")
    i = 12
    comm = ssnd = None
    compression = b"NONE"
    while i + 8 <= end:
        cid = b[i : i + 4]
        (size,) = struct.unpack_from(">L", b, i + 4)
        if i + 8 + size > end:
            raise ValueError("truncated AIFF chunk")
        body = b[i + 8 : i + 8 + size]
        if cid == b"COMM":
            if size < 18:
                raise ValueError("truncated AIFF COMM chunk")
            comm = body
            if form == b"AIFC" and size >= 22:
                compression = body[18:22]
        elif cid == b"SSND":
            ssnd = body
        i += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    ch, n, bits = struct.unpack_from(">hLh", comm, 0)
    rate = _ext80_to_int(comm[8:18])
    if ch <= 0:
        raise ValueError("AIFF zero channels")
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"AIFF sample size {bits}")
    little = False
    if compression not in (b"NONE",):
        if compression == b"sowt" and bits == 16:
            little = True
        else:
            raise NotImplementedError(
                f"AIFF-C compression {compression!r}"
            )
    if len(ssnd) < 8:
        raise ValueError("truncated AIFF SSND chunk")
    offset, _block = struct.unpack_from(">LL", ssnd, 0)
    data = ssnd[8 + offset :]
    width = bits // 8
    need = n * ch * width
    if len(data) < need:
        raise ValueError("AIFF SSND shorter than COMM frame count")
    data = data[:need]
    if width == 3:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        v = (
            (raw[:, 0].astype(np.int64) << 16)
            | (raw[:, 1].astype(np.int64) << 8)
            | raw[:, 2]
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
    else:
        dt = f"{'<' if little else '>'}i{width}"
        v = np.frombuffer(data, dtype=dt).astype(np.int64)
    return rate, v.reshape(n, ch).astype(np.int32)


# ------------------------------------------------------------- Sun AU

_AU_MAGIC = b".snd"
# encoding field (public Sun header): 1 μ-law, 2/3/4/5 linear
# 8/16/24/32-bit, 27 A-law
_AU_LINEAR = {2: 1, 3: 2, 4: 3, 5: 4}  # encoding -> byte width


def encode_au(
    samples: np.ndarray, rate: int = 8000, encoding: int = 3
) -> bytes:
    """int array (n,) or (n, ch) -> Sun AU bytes. encoding 2/3/4/5 =
    linear PCM 8/16/24/32-bit big-endian; 1/27 wrap raw μ-law/A-law
    CODE bytes (pass the 8-bit codes)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if encoding in _AU_LINEAR:
        width = _AU_LINEAR[encoding]
        bits = width * 8
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        xi = np.clip(x.astype(np.int64), lo, hi)
        if width == 3:
            flat = (xi.reshape(-1) & 0xFFFFFF).astype(">u4").tobytes()
            data = b"".join(
                flat[i + 1 : i + 4] for i in range(0, len(flat), 4)
            )
        else:
            data = xi.astype(f">i{width}").tobytes()
    elif encoding in (1, 27):
        data = (x.reshape(-1).astype(np.int64) & 0xFF).astype(
            np.uint8
        ).tobytes()
    else:
        raise NotImplementedError(f"AU encoding {encoding}")
    header = _AU_MAGIC + struct.pack(
        ">LLLLL", 24, len(data), encoding, rate, ch
    )
    return header + data


def decode_au(payload: bytes) -> tuple[int, np.ndarray]:
    """Sun AU bytes -> (rate, int32 array (n, ch)); μ-law/A-law
    expand through the shared G.711 tables to int16 range."""
    b = bytes(payload)
    if len(b) < 24 or b[:4] != _AU_MAGIC:
        raise ValueError("not a Sun AU stream")
    offset, size, encoding, rate, ch = struct.unpack_from(">LLLLL", b, 4)
    if offset < 24 or offset > len(b):
        raise ValueError("AU data offset out of range")
    if ch <= 0 or ch > 64:
        raise ValueError("AU channel count out of range")
    if not 1 <= rate <= 10**7:
        raise ValueError("AU sample rate out of range")
    data = b[offset:]
    if size != 0xFFFFFFFF:
        if len(data) < size:
            raise ValueError("AU payload shorter than header size")
        data = data[:size]
    if encoding in _AU_LINEAR:
        width = _AU_LINEAR[encoding]
        usable = len(data) - len(data) % (width * ch)
        data = data[:usable]
        if width == 3:
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            v = (
                (raw[:, 0].astype(np.int64) << 16)
                | (raw[:, 1].astype(np.int64) << 8)
                | raw[:, 2]
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
        else:
            v = np.frombuffer(data, dtype=f">i{width}").astype(np.int64)
    elif encoding in (1, 27):
        codes = np.frombuffer(data[: len(data) - len(data) % ch],
                              dtype=np.uint8)
        table = _ULAW_TABLE if encoding == 1 else _ALAW_TABLE
        v = table[codes].astype(np.int64)
    else:
        raise NotImplementedError(f"AU encoding {encoding}")
    return int(rate), v.reshape(-1, ch).astype(np.int32)
