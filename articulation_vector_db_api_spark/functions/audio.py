"""REAL audio codec with no media library — RIFF/WAVE PCM, the
uncompressed interchange format every audio pipeline meets first.

Same rationale as functions/pixels.py: the container walk (RIFF chunk
list → fmt → data) and PCM sample layout are fully specified public
structure with no entropy coding, so a 100 TB audio-curation pipeline
can run its framing / energy / silence-trim / resample-budget stages
with zero codec dependencies; only perceptual codecs (MP3/AAC/Opus)
need a real decoder, and they stay behind the same fault-isolated
seam. The encoder exists so decode is round-trip provable end-to-end
(suites/multimodal.py:multimodal_audio_wav_roundtrip: digest bytes →
WAV → engine decode → frame energies ≡ the oracle's direct integer
arithmetic on the same bytes).

Scale shape: decode runs inside Arrow-batched ``mapInPandas`` where
the payload lives; samples never leave the executor, only fixed-width
feature rows do.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Canonical 16-bit PCM WAV: (n,) mono or (n, ch) interleaved."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav_float(
    samples: np.ndarray, rate: int = 16000, bits: int = 32
) -> bytes:
    """IEEE-float WAV (format tag 3) from int16-range samples via the
    symmetric x/32767 convention — decode_wav's float branch inverts
    it exactly. Emits the fact chunk float WAV files carry."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    f = (a / 32767.0).astype("<f4" if bits == 32 else "<f8")
    data = f.reshape(-1).tobytes()
    step = bits // 8
    fmt = struct.pack(
        "<HHIIHH", 3, ch, rate, rate * ch * step, ch * step, bits
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


# G.711 companded telephony expansion (ITU-T G.711, the public-domain
# CCITT reference formulation): 8-bit logarithmic codes → linear int16.
# Pure integer piecewise-linear math, so the DuckDB oracle replicates
# the SAME formula in SQL and the parity gate cross-checks two
# independent implementations of the spec.


def _build_ulaw_table() -> np.ndarray:
    u = (~np.arange(256)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    a = np.arange(256) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()


def encode_wav_g711(codes: np.ndarray, law: str, rate: int = 8000) -> bytes:
    """Wrap raw 8-bit G.711 codes as a WAV (format tag 7 = μ-law,
    6 = A-law) — the telephony capture container; mono."""
    tag = {"ulaw": 7, "alaw": 6}[law]
    data = np.asarray(codes, dtype=np.uint8).reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    fact = struct.pack("<I", len(data))
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM decode → (sample_rate, int16 array (n, ch)).

    Walks the chunk list (LIST/INFO and other metadata chunks skip by
    their declared size, word-aligned per the RIFF spec). Extensible
    (0xFFFE) files dispatch on their SubFormat GUID's format code, so
    PCM / IEEE-float / G.711 / ADPCM all decode through the same
    branches whether plain-tagged or extensible.

    EXCEPTION CONTRACT (same as functions/pixels.py:decode_pixels):
    only ValueError for malformed streams and NotImplementedError for
    compressed formats — truncated fmt chunks and zero-channel headers
    are checked explicitly so no struct.error/ZeroDivisionError can
    escape a caller's per-row fault isolation."""
    b = bytes(payload)
    rf64 = b[:4] in (b"RF64", b"BW64")
    if not rf64 and b[:4] != b"RIFF":
        raise ValueError("not a RIFF/WAVE stream")
    if b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    # RF64/BW64 (EBU Tech 3306/3285 supplement): 32-bit size fields
    # hold 0xFFFFFFFF and the REAL 64-bit sizes ride in a mandatory
    # ds64 chunk that must come FIRST — the broadcast form for >4 GB
    # captures (r13; at 100 TB scale these are routine)
    ds64_data_size = None
    ds64_fact = None
    i, fmt, fmt_body, data, fact_frames = 12, None, b"", None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack_from("<I", b, i + 4)
        if cid == b"ds64":
            if not rf64:
                raise ValueError("ds64 chunk in a plain RIFF stream")
            if size < 24:
                raise ValueError("truncated RF64 ds64 chunk")
            _riff_sz, ds64_data_size, ds64_fact = struct.unpack_from(
                "<QQQ", b, i + 8
            )
            i += 8 + size + (size & 1)
            continue
        if size == 0xFFFFFFFF and rf64 and cid == b"data":
            if ds64_data_size is None:
                raise ValueError("RF64 data chunk before ds64")
            size = ds64_data_size
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
            if fact_frames == 0xFFFFFFFF and ds64_fact is not None:
                fact_frames = ds64_fact
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, _byterate, align, bits = fmt
    if ch == 0:
        raise ValueError("WAV fmt declares zero channels")
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the REAL format code is the first
        # two bytes of the SubFormat GUID (a float-subformat file read
        # as PCM would silently produce garbage samples); the GUID
        # suffix is fixed by the spec and verified
        if len(fmt_body) < 40:
            raise ValueError("extensible WAV fmt chunk too short")
        (tag,) = struct.unpack_from("<H", fmt_body, 24)
        if fmt_body[26:40] != (
            b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        ):
            raise ValueError("bad WAV extensible SubFormat GUID")
    if tag == 0x11:
        # IMA ADPCM (mono): block geometry from the extended fmt
        if ch != 1 or bits != 4:
            raise NotImplementedError(
                f"IMA ADPCM with ch={ch}, bits={bits} (mono 4-bit only)"
            )
        if len(fmt_body) < 20:
            raise ValueError("IMA ADPCM fmt chunk missing samples/block")
        (spb,) = struct.unpack_from("<H", fmt_body, 18)
        # fact absent → decode everything present; a short final
        # block (legal) yields its actual capacity, not spb
        samples = decode_adpcm_ima(data, align, spb, fact_frames)
        return rate, samples.reshape(-1, 1)
    if tag in (6, 7):
        # G.711 A-law / μ-law: 8-bit companded codes expand through
        # the exact ITU tables above
        if bits != 8:
            raise ValueError(f"G.711 WAV with bits={bits} (must be 8)")
        table = _ALAW_TABLE if tag == 6 else _ULAW_TABLE
        n = len(data) // ch
        codes = np.frombuffer(data, dtype=np.uint8, count=n * ch)
        return rate, table[codes].reshape(n, ch)
    if tag == 3:
        # IEEE-float WAV (WAVE_FORMAT_IEEE_FLOAT): float32/float64
        # samples in [-1, 1], converted to int16 by the symmetric
        # x*32767 convention (the encode_wav_float inverse, so 16-bit
        # material round-trips bit-exactly); out-of-range input clips
        if bits not in (32, 64):
            raise ValueError(f"float WAV with bits={bits} (32/64 only)")
        step = bits // 8
        n = len(data) // (step * ch)
        with np.errstate(invalid="ignore"):
            # a corrupt stream's signaling NaNs warn during the f4->f8
            # widening; the finiteness check right below raises for
            # them, so the cast itself must stay silent
            f = np.frombuffer(
                data, dtype="<f4" if bits == 32 else "<f8", count=n * ch
            ).astype(np.float64)
        if not np.isfinite(f).all():
            raise ValueError("float WAV contains non-finite samples")
        pcm = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int16)
        return rate, pcm.reshape(n, ch)
    if tag not in (1, 0xFFFE) or bits not in (8, 16, 24, 32):
        raise NotImplementedError(
            f"compressed or non-PCM WAV (tag={tag}, bits={bits}) "
            "needs a codec library"
        )
    step = bits // 8
    n = len(data) // (step * ch)
    if bits == 8:
        # 8-bit PCM is UNSIGNED with midpoint 128 (the one unsigned
        # layout in the format); return raw centered amplitudes
        u = np.frombuffer(data, dtype=np.uint8, count=n * ch)
        samples = (u.astype(np.int16) - 128).reshape(n, ch)
    elif bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=n * ch
        ).reshape(n, ch).copy()
    elif bits == 24:
        raw = np.frombuffer(
            data, dtype=np.uint8, count=n * ch * 3
        ).reshape(-1, 3).astype(np.int32)
        v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        samples = np.where(v & 0x800000, v - (1 << 24), v).reshape(n, ch)
    else:
        samples = np.frombuffer(
            data, dtype="<i4", count=n * ch
        ).reshape(n, ch).copy()
    return rate, samples


def frame_energies(
    samples: np.ndarray, frame: int, hop: int
) -> np.ndarray:
    """Per-frame energy (sum of squared samples, exact int64) over
    sliding windows — the front-end statistic of fbank/VAD/silence
    trimming. Mono-sums multi-channel input first. Vectorized via a
    strided window view; frames that would overrun are dropped (the
    standard framing convention)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 2:
        s = s.sum(axis=1)
    n_frames = 0 if len(s) < frame else 1 + (len(s) - frame) // hop
    if n_frames <= 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    return (s[idx] ** 2).sum(axis=1)


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11) — IMA Digital Audio Technical
# Working Group 1992 recommendation (also RFC 3551 §4.5.1 "DVI4"),
# public spec. 4:1 compressed voice WAV is the one non-PCM format a
# real speech corpus actually contains; the step/index state machine
# is pure integer arithmetic, so it belongs in the no-codec-library
# stack. MP3/AAC/Opus remain honestly gated (perceptual codecs).
# ---------------------------------------------------------------------------

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
IMA_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder state transition: (predictor', index')."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + IMA_INDEX_ADJUST[nibble & 7]))
    return predictor, index


def _ima_encode_nibble(delta: int, step: int) -> int:
    """Quantize one delta against the current step (spec encoder)."""
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return nibble


def encode_adpcm_ima(samples: np.ndarray, rate: int = 16000,
                     samples_per_block: int = 505) -> bytes:
    """Encode MONO int16 samples as an IMA-ADPCM WAV (format tag
    0x11): per-block 4-byte header (predictor int16, step index,
    reserved) + packed low-nibble-first 4-bit codes. Block-aligned
    per the spec: samples_per_block = 1 header sample + 2 nibbles per
    following byte (default 505 -> 256-byte blocks)."""
    s = np.asarray(samples, dtype=np.int64).ravel()
    if (samples_per_block - 1) % 2:
        raise ValueError("samples_per_block must be odd (header + pairs)")
    block_align = 4 + (samples_per_block - 1) // 2
    data = bytearray()
    index = 0
    for start in range(0, len(s), samples_per_block):
        blk = s[start : start + samples_per_block]
        predictor = int(blk[0])
        data += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for sample in blk[1:]:
            step = IMA_STEP_TABLE[index]
            nibble = _ima_encode_nibble(int(sample) - predictor, step)
            predictor, index = _ima_step(predictor, index, nibble)
            nibbles.append(nibble)
        while len(nibbles) < samples_per_block - 1:  # pad the tail block
            step = IMA_STEP_TABLE[index]
            nibble = _ima_encode_nibble(0, step)  # hold the last value
            predictor, index = _ima_step(predictor, index, nibble)
            nibbles.append(nibble)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            data.append(lo | (hi << 4))
    n_frames = len(s)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, rate,
        rate * block_align // samples_per_block,
        block_align, 4, 2, samples_per_block,
    )
    fact = struct.pack("<I", n_frames)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )


def decode_adpcm_ima(
    data: bytes,
    block_align: int,
    samples_per_block: int,
    n_frames: int | None,
) -> np.ndarray:
    """Decode mono IMA-ADPCM 'data' chunk payload -> int16 samples.

    n_frames comes from the fact chunk; None (fact absent) returns
    every decodable sample — a legal short final block then simply
    yields fewer than samples_per_block samples instead of failing."""
    out: list[int] = []
    if block_align < 5 or samples_per_block < 3:
        raise ValueError("bad IMA ADPCM block geometry")
    for start in range(0, len(data), block_align):
        blk = data[start : start + block_align]
        if len(blk) < 4:
            raise ValueError("truncated IMA ADPCM block header")
        predictor, index, _rsvd = struct.unpack_from("<hBB", blk, 0)
        if index > 88:
            raise ValueError(f"bad IMA ADPCM step index {index}")
        decoded = [predictor]
        for byte in blk[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_step(predictor, index, nibble)
                decoded.append(predictor)
        # padding nibbles past samples_per_block never enter the stream
        out.extend(decoded[:samples_per_block])
    if n_frames is None:
        n_frames = len(out)
    if len(out) < n_frames:
        raise ValueError("IMA ADPCM payload shorter than fact frame count")
    return np.asarray(out[:n_frames], dtype=np.int16)
