"""QOI codec (functions/qoi.py): op-level vectors, roundtrips, and
the malformed-input contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.qoi import (
    decode_qoi,
    encode_qoi,
)


def test_roundtrip_random_rgb_rgba():
    rng = np.random.RandomState(5)
    for ch in (3, 4):
        for shape in ((1, 1), (7, 13), (32, 9)):
            px = rng.randint(0, 256, (*shape, ch), dtype=np.uint8)
            assert (decode_qoi(encode_qoi(px)) == px).all()


def test_op_level_vectors():
    # the spec's op preference from the implicit (0,0,0,255) start:
    # an all-9s first pixel is within LUMA range (dg=9, dr-dg=db-dg=0)
    px = np.full((1, 200, 3), 9, dtype=np.uint8)
    enc = encode_qoi(px)
    body = enc[14:-8]
    assert body[0] == 0x80 | (9 + 32) and body[1] == 0x88
    # RUN: the remaining 199 identical pixels pack into 62-cap runs
    runs = list(body[2:])
    assert all(c >> 6 == 0b11 for c in runs)
    assert sum((c & 0x3F) + 1 for c in runs) == 199

    # a first pixel outside LUMA range emits a full RGB chunk
    px = np.array([[[200, 10, 3], [201, 11, 4]]], dtype=np.uint8)
    body = encode_qoi(px)[14:-8]
    assert body[0] == 0xFE and body[1:4] == bytes((200, 10, 3))
    # DIFF: +1 on each channel is one 0b01 chunk
    assert body[4] >> 6 == 0b01
    assert (decode_qoi(encode_qoi(px)) == px).all()

    # LUMA: +20 on all channels (dg=20, dr-dg=0, db-dg=0)
    px = np.array([[[200, 10, 3], [220, 30, 23]]], dtype=np.uint8)
    body = encode_qoi(px)[14:-8]
    assert body[4] >> 6 == 0b10 and (body[4] & 0x3F) == 20 + 32
    assert body[5] == 0x88

    # INDEX: a seen pixel re-referenced is one 0b00 chunk
    a = [1, 2, 3]
    b = [200, 100, 50]
    px = np.array([[a, b, a]], dtype=np.uint8)
    body = encode_qoi(px)[14:-8]
    assert body[-1] >> 6 == 0b00
    assert (decode_qoi(encode_qoi(px)) == px).all()

    # wraparound arithmetic: 255 -> 0 is DIFF +1 mod 256
    px = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
    assert (decode_qoi(encode_qoi(px)) == px).all()


def test_alpha_transitions_use_rgba():
    px = np.array([[[5, 5, 5, 255], [5, 5, 5, 128]]], dtype=np.uint8)
    body = encode_qoi(px)[14:-8]
    assert 0xFF in body  # RGBA op for the alpha change
    assert (decode_qoi(encode_qoi(px)) == px).all()


def test_malformed_contract():
    good = encode_qoi(np.full((4, 4, 3), 77, dtype=np.uint8))
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"qoix" + good[4:])
    with pytest.raises(ValueError, match="channels"):
        decode_qoi(good[:12] + b"\x07\x00" + good[14:])
    with pytest.raises(ValueError, match="end marker|underruns|truncated"):
        decode_qoi(good[:-9] + b"\x00" * 9)
    # pixel-count overrun via an oversized RUN
    hdr = b"qoif" + struct.pack(">IIBB", 2, 1, 3, 0)
    stream = hdr + bytes([0xFE, 1, 2, 3, 0xC0 | 61]) + b"\x00" * 7 + b"\x01"
    with pytest.raises(ValueError, match="overruns"):
        decode_qoi(stream)
    with pytest.raises(ValueError):
        encode_qoi(np.zeros((4, 4), dtype=np.uint8))  # no channel dim


def test_dispatch_and_fuzz_contract():
    from articulation_vector_db_api_spark.functions.pixels import (
        decode_pixels,
    )
    from tests.test_fuzz_contracts import _assert_contract

    px = (np.arange(12 * 10 * 3) % 256).astype(np.uint8).reshape(12, 10, 3)
    enc = encode_qoi(px)
    assert (decode_pixels(enc) == px).all()
    _assert_contract("qoi", enc, decode_pixels)
