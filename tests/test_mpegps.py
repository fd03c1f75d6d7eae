"""MPEG-1 system stream (functions/mpegps.py): mux/demux bit-exact
roundtrips carrying real video+audio elementary streams, timestamp
layout, the no-start-code-scan-inside-packets invariant, strict
malformed-stream errors, and the mutation-fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.mpegps import (
    AUDIO_STREAM_0,
    VIDEO_STREAM_0,
    build_mpeg_ps,
    demux_mpeg_ps,
    parse_mpeg_ps,
)


def _video_es(n=3):
    from articulation_vector_db_api_spark.functions.mpeg1 import encode_m1v

    def moving(t, h=32, w=32):
        img = np.full((h, w, 3), 90, dtype=np.uint8)
        yy, xx = np.mgrid[0:16, 0:16]
        sq = (120 + 6 * xx + 4 * yy).clip(0, 255).astype(np.uint8)
        img[8:24, 2 + 2 * t : 18 + 2 * t, 0] = sq
        img[8:24, 2 + 2 * t : 18 + 2 * t, 1] = 255 - sq
        return img

    return encode_m1v([moving(t) for t in range(n)], qscale=4,
                      p_frames=True)


def _audio_es():
    from articulation_vector_db_api_spark.functions.mp2 import encode_mp2

    t = np.arange(4000) / 48000
    return encode_mp2(0.5 * np.sin(2 * np.pi * 440 * t), 48000, 192)


def test_mux_demux_bit_exact_and_decodable():
    ves, aes = _video_es(), _audio_es()
    ps = build_mpeg_ps(
        {VIDEO_STREAM_0: ves, AUDIO_STREAM_0: aes}, packet_size=512
    )
    meta = demux_mpeg_ps(ps)
    v = meta["streams"][VIDEO_STREAM_0]
    a = meta["streams"][AUDIO_STREAM_0]
    assert v["data"] == ves and a["data"] == aes
    # the reassembled elementary streams decode end to end
    from articulation_vector_db_api_spark.functions.mp2 import decode_mp2
    from articulation_vector_db_api_spark.functions.mpeg1 import decode_m1v

    m, frames = decode_m1v(v["data"])
    assert m["n_frames"] == 3 and m["n_p"] == 2
    rate, ch, pcm = decode_mp2(a["data"])
    assert (rate, ch) == (48000, 1)
    # SCR advances per pack; PTS per stream is strictly increasing
    assert meta["scr_first"] == 0
    assert meta["scr_last"] == (meta["n_packs"] - 1) * 3600
    for rec in (v, a):
        assert rec["pts"] == sorted(rec["pts"])
        assert len(set(rec["pts"])) == len(rec["pts"])


def test_payload_start_code_emulation_is_safe():
    """Elementary streams legally contain 0x000001 byte runs — the
    demuxer must consume payloads by packet_length, never by scanning
    for start codes (the classic .mpg demux bug)."""
    evil = (b"\x00\x00\x01\xba" + b"\x00\x00\x01\xb9") * 40
    ps = build_mpeg_ps({VIDEO_STREAM_0: evil}, packet_size=64)
    out = demux_mpeg_ps(ps)["streams"][VIDEO_STREAM_0]["data"]
    assert out == evil


def test_parse_metadata_only_matches_demux():
    ves = _video_es(2)
    ps = build_mpeg_ps({VIDEO_STREAM_0: ves}, packet_size=256)
    meta = parse_mpeg_ps(ps)
    rec = meta["streams"][VIDEO_STREAM_0]
    assert rec["n_bytes"] == len(ves)
    assert "data" not in rec
    assert meta["mux_rate"] == 3528


def test_timestamp_codec_exact():
    from articulation_vector_db_api_spark.functions.mpegps import (
        _read_ts,
        _ts_bytes,
    )

    for ts in (0, 1, 90_000, (1 << 33) - 1, 0x15555_5555 & ((1 << 33) - 1)):
        assert _read_ts(_ts_bytes(0b0010, ts), 0, 0b0010) == ts
    with pytest.raises(ValueError, match="33-bit"):
        _ts_bytes(0b0010, 1 << 33)


def test_malformed_streams_raise():
    ves = _video_es(2)
    ps = bytearray(build_mpeg_ps({VIDEO_STREAM_0: ves}))
    with pytest.raises(ValueError, match="no pack header"):
        demux_mpeg_ps(b"RIFFnot a program stream")
    with pytest.raises(ValueError, match="without end code"):
        demux_mpeg_ps(bytes(ps[:-4]))
    with pytest.raises(ValueError, match="stream id"):
        build_mpeg_ps({0x42: b"x"})
    with pytest.raises(ValueError, match="at least one"):
        build_mpeg_ps({})
    # corrupt a pack-header marker bit
    bad = bytearray(ps)
    bad[4] &= 0xFE  # clear the SCR low marker
    with pytest.raises(ValueError):
        demux_mpeg_ps(bytes(bad))


def test_fuzz_mpegps_contract():
    from tests.test_fuzz_contracts import _assert_contract

    ps = build_mpeg_ps(
        {VIDEO_STREAM_0: _video_es(2), AUDIO_STREAM_0: _audio_es()},
        packet_size=384,
    )
    _assert_contract("mpegps", ps, demux_mpeg_ps)


def test_padding_and_private2_packets():
    """Real archives hold mux_rate with padding-stream (0xBE) packets
    — all-0xFF payload, no header byte — and may carry
    private_stream_2 (0xBF), whose payload starts right after
    packet_length. Both must demux without errors (r11 self-review:
    the first cut fed them through the stuffing/flag parser and
    raised)."""
    ves = _video_es(2)
    ps = bytearray(build_mpeg_ps({VIDEO_STREAM_0: ves}, packet_size=256))
    end_at = len(ps) - 4  # before the end code
    pad = b"\x00\x00\x01\xbe" + (16).to_bytes(2, "big") + b"\xff" * 16
    priv = b"\x00\x00\x01\xbf" + (5).to_bytes(2, "big") + b"hello"
    doctored = bytes(ps[:end_at]) + pad + priv + bytes(ps[end_at:])
    meta = demux_mpeg_ps(doctored)
    assert meta["streams"][VIDEO_STREAM_0]["data"] == ves
    assert 0xBE not in meta["streams"]  # padding is discarded
    assert meta["streams"][0xBF]["data"] == b"hello"


def test_mpeg2_program_stream_roundtrip():
    """13818-1 program stream (the .vob/.mpg layout): '01'-marked pack
    headers with SCR base+extension, '10'-marked PES headers; both
    payloads reassemble bit-exact and decode (MPEG-2 video + the MP2
    table regions the r11 build gated)."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.mp2 import (
        decode_mp2,
        encode_mp2,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import (
        decode_m2v,
        encode_m2v,
    )
    from articulation_vector_db_api_spark.functions.mpegps import (
        AUDIO_STREAM_0,
        VIDEO_STREAM_0,
        build_mpeg2_ps,
        demux_mpeg_ps,
    )

    yy, xx = np.mgrid[0:32, 0:48]
    frames = []
    for i in range(3):
        base = (128 + 60 * np.sin(2 * np.pi * (xx / 48 + i * 0.13))
                + 40 * np.cos(2 * np.pi * yy / 32))
        frames.append(
            np.stack([np.clip(base, 0, 255)] * 3, -1).astype(np.uint8)
        )
    ves = encode_m2v(frames, qscale_code=2, p_frames=True)
    t = np.arange(3000) / 44100
    aes = encode_mp2(0.4 * np.sin(2 * np.pi * 440 * t), 44100, 192)
    ps = build_mpeg2_ps(
        {VIDEO_STREAM_0: ves, AUDIO_STREAM_0: aes}, packet_size=512
    )
    meta = demux_mpeg_ps(ps)
    assert meta["mpeg_version"] == 2
    v, a = meta["streams"][VIDEO_STREAM_0], meta["streams"][AUDIO_STREAM_0]
    assert v["data"] == ves and a["data"] == aes
    assert v["pts"] == sorted(v["pts"])
    m2, dec = decode_m2v(v["data"])
    assert (m2["n_i"], m2["n_p"], len(dec)) == (1, 2, 3)
    rate, ch, pcm = decode_mp2(a["data"])
    assert (rate, ch) == (44100, 1) and pcm.shape[1] > 0


def test_mpeg_ps_version_mixing_rejected():
    from articulation_vector_db_api_spark.functions.mpegps import (
        VIDEO_STREAM_0,
        build_mpeg2_ps,
        build_mpeg_ps,
        demux_mpeg_ps,
    )

    ps1 = build_mpeg_ps({VIDEO_STREAM_0: b"\x11" * 600})
    ps2 = build_mpeg2_ps({VIDEO_STREAM_0: b"\x22" * 600})
    assert demux_mpeg_ps(ps1)["mpeg_version"] == 1
    assert demux_mpeg_ps(ps2)["mpeg_version"] == 2
    mixed = ps2[: len(ps2) - 4] + ps1
    with pytest.raises(ValueError, match="version changes"):
        demux_mpeg_ps(mixed)


def test_fuzz_mpeg2_ps_contract():
    from articulation_vector_db_api_spark.functions.mpegps import (
        VIDEO_STREAM_0,
        build_mpeg2_ps,
        demux_mpeg_ps,
    )
    from tests.test_fuzz_contracts import _assert_contract

    ps = build_mpeg2_ps({VIDEO_STREAM_0: bytes(range(256)) * 6})
    _assert_contract("mpeg2-ps", ps, demux_mpeg_ps, n=80)


def test_timestamp_wraparound_mod_2_33():
    """13818-1/11172-1 timestamps are mod-2^33 counters (~26.5 h at
    90 kHz). Long content must WRAP, not crash — pre-r13 the builders
    raised once pack_no * pts_step crossed 2^33 (~4.7 GB of ES at the
    defaults). A huge pts_step forces the wrap within 3 packs."""
    from articulation_vector_db_api_spark.functions.mpegps import (
        build_mpeg2_ps,
        build_mpeg_ps,
        demux_mpeg_ps,
    )

    step = (1 << 33) - 1800  # second pack's SCR wraps
    es = bytes(range(256)) * 10  # 2560 bytes -> 3 packs at 1024
    for build in (build_mpeg_ps, build_mpeg2_ps):
        ps = build({0xE0: es}, packet_size=1024, pts_step=step)
        meta = demux_mpeg_ps(ps)
        assert meta["streams"][0xE0]["data"] == es
        assert meta["n_packs"] == 3
        # SCRs: 0, step (wrapped? no: step < 2^33), 2*step mod 2^33
        assert meta["scr_last"] == (2 * step) & ((1 << 33) - 1)
        pts = meta["streams"][0xE0]["pts"]
        assert all(0 <= p < (1 << 33) for p in pts)
        assert len(pts) == 3


def test_pes_header_data_length_must_cover_pts():
    """A PES packet whose flags claim a PTS but whose
    PES_header_data_length is too small to hold one must raise, not
    parse payload bytes as a timestamp."""
    import pytest

    from articulation_vector_db_api_spark.functions.mpegps import (
        _pack_header2,
        demux_mpeg_ps,
    )

    bad_pes = (
        b"\x00\x00\x01\xe0"
        + (3 + 4).to_bytes(2, "big")  # header(3) + 4 payload bytes
        + bytes([0b10000000, 0b10000000, 0])  # PTS flagged, hdl = 0
        + b"\x21\x00\x01\x00"  # payload that could fake a PTS prefix
    )
    ps = _pack_header2(0, 0, 3528) + bad_pes + b"\x00\x00\x01\xb9"
    with pytest.raises(ValueError, match="header_data_length"):
        demux_mpeg_ps(ps)
