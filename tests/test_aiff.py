"""AIFF + Sun AU containers (functions/aiff.py): 80-bit extended
sample-rate codec, bit-depth grid roundtrips, 24-bit packing, sowt
little-endian variant, AU linear + G.711 paths, gates, and the
byte-flip fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.aiff import (
    _ext80_from_int,
    _ext80_to_int,
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
)


def test_extended80_sample_rates():
    for rate in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 1):
        assert _ext80_to_int(_ext80_from_int(rate)) == rate
    # the canonical spec example: 44100 = 0x400E AC44 0000 0000 0000
    assert _ext80_from_int(44100) == bytes.fromhex("400eac44000000000000")
    with pytest.raises(ValueError):
        _ext80_to_int(bytes(10))  # zero
    with pytest.raises(ValueError):
        _ext80_to_int(b"\xc0\x0e" + bytes(8))  # negative


def _sig(n=500, ch=2, bits=16, seed=3):
    rng = np.random.RandomState(seed)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    return rng.randint(lo, hi + 1, size=(n, ch)).astype(np.int64)


def test_aiff_roundtrip_bit_depth_grid():
    for bits in (8, 16, 24, 32):
        for ch in (1, 2):
            x = _sig(311, ch, bits)
            rate, y = decode_aiff(encode_aiff(x, 22050, bits))
            assert rate == 22050
            assert y.shape == (311, ch)
            assert np.array_equal(y, x)


def test_aiff_sowt_little_endian():
    """AIFF-C 'sowt' = uncompressed little-endian 16-bit, the common
    Mac export variant."""
    x = _sig(100, 1, 16)
    es = bytearray(encode_aiff(x, 8000, 16))
    # rewrite FORM type to AIFC, add a sowt compression id in COMM
    at = bytes(es).find(b"COMM")
    (size,) = struct.unpack_from(">L", es, at + 4)
    comm = es[at + 8 : at + 8 + size] + b"sowt"
    ssnd_at = bytes(es).find(b"SSND")
    (ssize,) = struct.unpack_from(">L", es, ssnd_at + 4)
    ssnd = bytes(es[ssnd_at : ssnd_at + 8 + ssize])
    # byte-swap the sample data
    data = bytearray(ssnd[16:])
    data[0::2], data[1::2] = data[1::2], data[0::2]
    ssnd = ssnd[:16] + bytes(data)
    body = (
        b"AIFC"
        + b"COMM" + struct.pack(">L", len(comm)) + comm
        + ssnd
    )
    aifc = b"FORM" + struct.pack(">L", len(body)) + body
    rate, y = decode_aiff(aifc)
    assert np.array_equal(y, x)
    # other compression types gate honestly
    bad = aifc.replace(b"sowt", b"ima4")
    with pytest.raises(NotImplementedError, match="compression"):
        decode_aiff(bad)


def test_au_roundtrip_linear_grid():
    for enc, bits in ((2, 8), (3, 16), (4, 24), (5, 32)):
        x = _sig(257, 2, bits, seed=enc)
        rate, y = decode_au(encode_au(x, 16000, enc))
        assert rate == 16000
        assert np.array_equal(y, x)


def test_au_g711_paths():
    codes = np.arange(256, dtype=np.int64)
    for enc in (1, 27):
        rate, y = decode_au(encode_au(codes, 8000, enc))
        assert rate == 8000 and y.shape == (256, 1)
        assert np.abs(y).max() < 1 << 15  # expanded to int16 range
    # μ-law silence code 0xFF expands to 0
    _, y = decode_au(encode_au(np.array([0xFF]), 8000, 1))
    assert y[0, 0] == 0


def test_gates_and_malformed():
    with pytest.raises(ValueError, match="FORM"):
        decode_aiff(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="Sun AU"):
        decode_au(b"RIFF" + bytes(40))
    with pytest.raises(NotImplementedError, match="AU encoding"):
        encode_au(np.zeros(4), 8000, 23)  # ADPCM
    au = bytearray(encode_au(_sig(50, 1, 16), 8000, 3))
    struct.pack_into(">L", au, 12, 23)  # encoding -> G.721 ADPCM
    with pytest.raises(NotImplementedError, match="AU encoding"):
        decode_au(bytes(au))


def test_fuzz_contract():
    import random

    rng = random.Random(7)
    aiff = encode_aiff(_sig(120, 2, 16), 44100, 16)
    au = encode_au(_sig(120, 2, 16), 8000, 3)
    for blob, dec in ((aiff, decode_aiff), (au, decode_au)):
        for _ in range(250):
            bad = bytearray(blob)
            i = rng.randrange(len(bad))
            bad[i] ^= 1 << rng.randrange(8)
            try:
                rate, y = dec(bytes(bad))
            except (ValueError, NotImplementedError):
                continue
            assert 0 < rate <= 10**7 and y.ndim == 2


def test_chunks_after_ssnd_are_walked():
    """Trailing metadata chunks (e.g. a name/annotation chunk after
    SSND) must not break the walk."""
    x = _sig(60, 1, 16)
    es = encode_aiff(x, 16000, 16)
    trailing = b"NAME" + struct.pack(">L", 5) + b"hello" + b"\x00"
    # append inside the FORM: grow the FORM size
    grown = bytearray(es + trailing)
    struct.pack_into(">L", grown, 4, len(grown) - 8)
    rate, y = decode_aiff(bytes(grown))
    assert rate == 16000 and np.array_equal(y, x)


def test_trailing_tag_after_form_is_ignored():
    """r14 self-review F6: bytes past the declared FORM size are not
    chunks — taggers commonly append ID3v1 records, and the
    unbounded walk used to die on 'truncated AIFF chunk'."""
    import numpy as np

    x = (np.arange(400) % 251 - 125).astype(np.int64)
    blob = encode_aiff(x, rate=8000, sample_size=16)
    tagged = blob + b"TAG" + b"\x00" * 125  # ID3v1 record
    rate, v = decode_aiff(tagged)
    assert rate == 8000 and v.shape == (400, 1)
    assert (v[:, 0] == x).all()
    # but a CHUNK that claims to extend past the FORM end still raises
    import struct as _s

    bad = bytearray(blob)
    ssnd_at = bad.find(b"SSND")
    (sz,) = _s.unpack_from(">L", bad, ssnd_at + 4)
    _s.pack_into(">L", bad, ssnd_at + 4, sz + 64)
    with pytest.raises(ValueError, match="truncated AIFF chunk"):
        decode_aiff(bytes(bad) + b"\xff" * 64)
