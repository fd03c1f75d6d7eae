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


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM decode → (sample_rate, int16 array (n, ch)).

    Walks the chunk list (LIST/INFO and other metadata chunks skip by
    their declared size, word-aligned per the RIFF spec); accepts
    format tag 1 (PCM) and 0xFFFE (extensible) at 16 bits.

    EXCEPTION CONTRACT (same as functions/pixels.py:decode_pixels):
    only ValueError for malformed streams and NotImplementedError for
    compressed formats — truncated fmt chunks and zero-channel headers
    are checked explicitly so no struct.error/ZeroDivisionError can
    escape a caller's per-row fault isolation."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, _byterate, _align, bits = fmt
    if tag not in (1, 0xFFFE) or bits != 16:
        raise NotImplementedError(
            f"compressed or non-16-bit WAV (tag={tag}, bits={bits}) "
            "needs a codec library"
        )
    if ch == 0:
        raise ValueError("WAV fmt declares zero channels")
    n = len(data) // (2 * ch)
    samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, samples.copy()


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
