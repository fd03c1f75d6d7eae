"""AVI (RIFF) container + frame decode (functions/avi.py): structure
roundtrips, idx1 verification, DIB row padding, MJPEG dispatch through
the from-scratch JPEG decoder, and the malformed-input ValueError
contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.avi import (
    build_avi,
    decode_avi_frames,
    decode_dib_frame,
    encode_dib_frame,
    extract_avi_frames,
    parse_avi,
)
from articulation_vector_db_api_spark.functions.jpeg import (
    encode_jpeg_baseline,
)


def _clip(n=5, w=18, h=12, seed=7):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_dib_roundtrip_bit_exact():
    frames = _clip()
    avi = build_avi(
        [encode_dib_frame(f) for f in frames], 18, 12, "DIB", fps_rate=12
    )
    meta, dec = decode_avi_frames(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (18, 12, 5)
    assert meta["codec"] == "DIB" and meta["fps"] == 12.0
    assert all((a == b).all() for a, b in zip(frames, dec))


def test_dib_row_padding_and_bottom_up():
    # width 10 -> 30-byte rows padded to 32; row order must flip
    f = np.arange(10 * 6 * 3, dtype=np.uint8).reshape(6, 10, 3)
    payload = encode_dib_frame(f)
    assert len(payload) == 32 * 6
    # first stored row is the BOTTOM image row, channels swapped to BGR
    assert payload[0] == f[5, 0, 2] and payload[2] == f[5, 0, 0]
    assert (decode_dib_frame(payload, 10, 6) == f).all()
    with pytest.raises(ValueError, match="payload"):
        decode_dib_frame(payload[:-1], 10, 6)


def test_mjpeg_frames_decode_through_jpeg():
    frames = [
        np.full((24, 32, 3), 30 + 50 * i, dtype=np.uint8) for i in range(3)
    ]
    avi = build_avi(
        [encode_jpeg_baseline(f, quality=90) for f in frames],
        32, 24, "MJPG", fps_rate=10,
    )
    meta, dec = decode_avi_frames(avi)
    assert meta["codec"] == "MJPG" and meta["duration_ms"] == 300
    for a, b in zip(frames, dec):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 4


def test_odd_payload_word_alignment():
    # 5-byte payloads force the RIFF pad byte; extraction must strip it
    payloads = [b"12345", b"abcde", b"zz"]
    avi = build_avi(payloads, 1, 1, "MJPG")
    assert extract_avi_frames(avi) == payloads
    assert parse_avi(avi)["n_frames"] == 3


def test_idx1_must_agree_with_movi_walk():
    avi = bytearray(
        build_avi([encode_dib_frame(f) for f in _clip(3)], 18, 12, "DIB")
    )
    # corrupt the size field of the FIRST idx1 entry
    at = bytes(avi).rfind(b"idx1") + 8 + 12
    avi[at:at + 4] = struct.pack("<I", 1)
    with pytest.raises(ValueError, match="idx1"):
        parse_avi(bytes(avi))


def test_malformed_streams_raise_value_error():
    good = build_avi([encode_dib_frame(_clip(1)[0])], 18, 12, "DIB")
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(good[:30])
    # frame-count disagreement between avih and the movi walk
    bad = bytearray(good)
    at = bytes(bad).find(b"avih") + 8 + 16  # dwTotalFrames
    bad[at:at + 4] = struct.pack("<I", 9)
    with pytest.raises(ValueError, match="frame count"):
        parse_avi(bytes(bad))


def test_unsupported_codec_gates_not_implemented():
    with pytest.raises(NotImplementedError):
        build_avi([b"x"], 4, 4, "H264")
    good = bytearray(build_avi([b"x"], 4, 4, "MJPG"))
    # rewrite strf biCompression to an unknown fourcc and strh handler
    at = bytes(good).find(b"strf") + 8 + 16
    good[at:at + 4] = b"XVID"
    ah = bytes(good).find(b"strh") + 8 + 4
    good[ah:ah + 4] = b"XVID"
    with pytest.raises(NotImplementedError, match="codec"):
        parse_avi(bytes(good))


def test_empty_clip_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        build_avi([], 4, 4, "DIB")


def _wild_avi(frames):
    """A real-world-shaped AVI: JUNK + audio interleave in movi, one
    frame wrapped in a 'rec ' LIST, idx1 in the ABSOLUTE-offset
    convention with audio entries mixed in (the ffmpeg-compatible shape
    the r10 ADVICE asked the parser to accept)."""
    from articulation_vector_db_api_spark.functions.avi import (
        _chunk,
        _list,
        _u32,
    )

    ref = build_avi([encode_dib_frame(f) for f in frames], 18, 12, "DIB")
    # reuse the writer's hdrl verbatim
    hdrl_at = ref.find(b"LIST")
    (hdrl_size,) = struct.unpack_from("<I", ref, hdrl_at + 4)
    hdrl = ref[hdrl_at : hdrl_at + 8 + hdrl_size + (hdrl_size & 1)]

    payloads = [encode_dib_frame(f) for f in frames]
    movi = b"movi" + _chunk(b"JUNK", b"\x00" * 12)
    vid_pos = []  # movi-relative offsets of the video chunk headers
    for i, p in enumerate(payloads):
        if i == 1:
            # frame 1 rides inside a 'rec ' group next to audio
            inner = b"rec " + _chunk(b"01wb", b"\x07" * 10)
            vid_pos.append(len(movi) + 8 + len(inner))
            inner += _chunk(b"00db", p)
            movi += _chunk(b"LIST", inner)
        else:
            vid_pos.append(len(movi))
            movi += _chunk(b"00db", p)
        movi += _chunk(b"01wb", b"\x09" * 6)
    movi_chunk = _chunk(b"LIST", movi)
    movi_fourcc_abs = 8 + 4 + len(hdrl) + 8  # RIFF hdr + 'AVI ' + hdrl + LIST hdr
    idx = b""
    for off, p in zip(vid_pos, payloads):
        idx += b"00db" + _u32(0x10) + _u32(movi_fourcc_abs + off) + _u32(len(p))
        idx += b"01wb" + _u32(0) + _u32(0) + _u32(6)  # audio entry, ignored
    body = b"AVI " + hdrl + movi_chunk + _chunk(b"idx1", idx)
    return _chunk(b"RIFF", body)


def test_wild_interleave_and_absolute_idx1():
    frames = _clip(3)
    avi = _wild_avi(frames)
    meta, dec = decode_avi_frames(avi)
    assert meta["n_frames"] == 3 and meta["codec"] == "DIB"
    assert all((a == b).all() for a, b in zip(frames, dec))
    # a wrong absolute offset must still be caught
    bad = bytearray(avi)
    at = bytes(bad).rfind(b"idx1") + 8 + 8
    bad[at:at + 4] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="idx1"):
        parse_avi(bytes(bad))


# ---------------------------------------------------------------------------
# interleaved audio stream ('auds' / '01wb')
# ---------------------------------------------------------------------------


def _av_fixture():
    import numpy as np

    from articulation_vector_db_api_spark.functions.mp2 import encode_mp2
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        encode_m1v,
        split_m1v_frames,
    )

    yy, xx = np.mgrid[0:32, 0:48]
    frames = []
    for i in range(3):
        base = (128 + 60 * np.sin(2 * np.pi * (xx / 48 + i * 0.13))
                + 40 * np.cos(2 * np.pi * yy / 32))
        frames.append(
            np.stack([np.clip(base, 0, 255)] * 3, -1).astype(np.uint8)
        )
    ves = encode_m1v(frames, qscale=4)
    t = np.arange(4000) / 48000
    aes = encode_mp2(0.5 * np.sin(2 * np.pi * 440 * t), 48000, 192)
    return split_m1v_frames(ves), aes


def test_avi_audio_roundtrip_mpeg():
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        decode_avi_frames,
        extract_avi_audio,
        parse_avi,
    )
    from articulation_vector_db_api_spark.functions.mp2 import decode_mp2

    vpay, aes = _av_fixture()
    chunks = [aes[i : i + 600] for i in range(0, len(aes), 600)]
    avi = build_avi(
        vpay, 48, 32, "MPG1", fps_rate=25,
        audio_payloads=chunks,
        audio_format={"tag": 0x0050, "channels": 1, "rate": 48000,
                      "block_align": 1},
    )
    # the video walk still verifies against idx1 with audio interleaved
    meta = parse_avi(avi)
    assert meta["codec"] == "MPG1" and meta["n_frames"] == 3
    _m, dec = decode_avi_frames(avi)
    assert len(dec) == 3
    fmt, audio = extract_avi_audio(avi)
    assert fmt["tag"] == 0x0050 and fmt["rate"] == 48000
    assert fmt["n_chunks"] == len(chunks)
    assert audio == aes  # bit-exact reassembly
    rate, ch, _pcm = decode_mp2(audio)
    assert (rate, ch) == (48000, 1)


def test_avi_audio_pcm_and_absence():
    import numpy as np

    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        extract_avi_audio,
    )

    vpay, _aes = _av_fixture()
    pcm = (np.sin(np.arange(800) * 0.03) * 20000).astype("<i2").tobytes()
    avi = build_avi(
        vpay, 48, 32, "MPG1", fps_rate=25,
        audio_payloads=[pcm[:700], pcm[700:]],
        audio_format={"tag": 0x0001, "channels": 1, "rate": 16000,
                      "block_align": 2, "bits": 16},
    )
    fmt, audio = extract_avi_audio(avi)
    assert (fmt["tag"], fmt["bits"], fmt["block_align"]) == (1, 16, 2)
    assert audio == pcm
    with pytest.raises(ValueError, match="no audio"):
        extract_avi_audio(build_avi(vpay, 48, 32, "MPG1", fps_rate=25))
    with pytest.raises(ValueError, match="audio_format"):
        build_avi(vpay, 48, 32, "MPG1", audio_payloads=[b"x"])


def test_avi_audio_default_path_byte_identical():
    """The audio feature must not perturb single-stream output (the
    hash-pinned queries depend on the writer's exact bytes)."""
    from articulation_vector_db_api_spark.functions.avi import build_avi

    vpay, _ = _av_fixture()
    assert build_avi(vpay, 48, 32, "MPG1", fps_rate=25) == build_avi(
        vpay, 48, 32, "MPG1", fps_rate=25, audio_payloads=None
    )


def test_fuzz_avi_audio_contract():
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        extract_avi_audio,
    )
    from tests.test_fuzz_contracts import _assert_contract

    vpay, aes = _av_fixture()
    avi = build_avi(
        vpay, 48, 32, "MPG1", fps_rate=25,
        audio_payloads=[aes[i : i + 500] for i in range(0, len(aes), 500)],
        audio_format={"tag": 0x0050, "channels": 1, "rate": 48000,
                      "block_align": 1},
    )
    _assert_contract("avi-audio", avi, extract_avi_audio, n=100)
