"""HLS playlists over TS segments (functions/hls.py): playlist
build/parse round-trip, unknown-tag tolerance, master-playlist gate,
segment stitching with the continuous PTS timeline, the cross-segment
MPEG-2 multi-sequence decode, and error paths."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.hls import (
    build_hls,
    demux_hls,
    parse_m3u8,
)
from articulation_vector_db_api_spark.functions.mpegts import (
    AUDIO_STREAM_0,
    VIDEO_STREAM_0,
)


def test_playlist_build_parse_roundtrip():
    playlist, files = build_hls(
        [{VIDEO_STREAM_0: bytes(5000)}, {VIDEO_STREAM_0: bytes(2000)}],
        pes_chunk=1024,
    )
    meta = parse_m3u8(playlist)
    assert meta["endlist"] and meta["media_sequence"] == 0
    assert [u for _, u in meta["segments"]] == ["seg0.ts", "seg1.ts"]
    assert set(files) == {"seg0.ts", "seg1.ts"}
    assert meta["target_duration"] >= max(d for d, _ in meta["segments"])


def test_playlist_tolerance_and_gates():
    text = (
        "#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:4\n"
        "#EXT-X-PROGRAM-DATE-TIME:2020-01-01T00:00:00Z\n"  # unknown: skip
        "# a comment\n"
        "#EXTINF:3.2, title with, commas\nseg0.ts\n#EXT-X-ENDLIST\n"
    )
    meta = parse_m3u8(text)
    assert meta["segments"] == [(3.2, "seg0.ts")]
    with pytest.raises(ValueError, match="EXTM3U"):
        parse_m3u8("#EXTINF:1,\nx.ts\n")
    with pytest.raises(NotImplementedError, match="master"):
        parse_m3u8("#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=1\nv.m3u8\n")
    with pytest.raises(ValueError, match="without #EXTINF"):
        parse_m3u8("#EXTM3U\nseg0.ts\n")
    with pytest.raises(ValueError, match="without a following URI"):
        parse_m3u8("#EXTM3U\n#EXTINF:1,\n")


def test_stitch_continuous_pts_and_bit_exact():
    v1, v2 = bytes(range(200)) * 20, bytes(reversed(range(200))) * 10
    a1, a2 = b"\x11" * 1500, b"\x22" * 900
    playlist, files = build_hls(
        [
            {VIDEO_STREAM_0: v1, AUDIO_STREAM_0: a1},
            {VIDEO_STREAM_0: v2, AUDIO_STREAM_0: a2},
        ],
        pes_chunk=1024,
    )
    out = demux_hls(playlist, files)
    assert out["n_segments"] == 2 and out["endlist"]
    assert out["streams"][VIDEO_STREAM_0]["data"] == v1 + v2
    assert out["streams"][AUDIO_STREAM_0]["data"] == a1 + a2
    pts = out["streams"][VIDEO_STREAM_0]["pts"]
    assert pts == sorted(set(pts))  # ONE continuous timeline


def test_stitch_error_paths():
    playlist, files = build_hls([{VIDEO_STREAM_0: bytes(1000)}])
    with pytest.raises(ValueError, match="not fetched"):
        demux_hls(playlist, {})
    # disjoint timelines (independently-built segments both starting
    # at PTS 3600) must fail the monotonicity check
    from articulation_vector_db_api_spark.functions.mpegts import (
        build_mpeg_ts,
    )

    seg = build_mpeg_ts({VIDEO_STREAM_0: bytes(5000)}, pes_chunk=1024)
    pl = (
        "#EXTM3U\n#EXTINF:1,\na.ts\n#EXTINF:1,\nb.ts\n#EXT-X-ENDLIST\n"
    )
    with pytest.raises(ValueError, match="monotone"):
        demux_hls(pl, {"a.ts": seg, "b.ts": seg})


def test_cross_segment_mpeg2_decode():
    """The capstone: two closed-GOP MPEG-2 segments (sequence_end
    stripped from the non-final one — what real segmenters emit),
    stitched ES decodes as SIX frames through the repeated-sequence-
    header path, with each segment's own quantizer matrices."""
    from articulation_vector_db_api_spark.functions.mp2 import (
        decode_mp2,
        encode_mp2,
    )
    from articulation_vector_db_api_spark.functions.mpeg2 import (
        decode_m2v,
        encode_m2v,
    )

    yy, xx = np.mgrid[0:32, 0:48]

    def frames(t0):
        return [
            np.stack(
                [((xx * 3 + yy * 5 + (t0 + t) * 37) % 256).astype(
                    np.uint8
                )] * 3,
                axis=-1,
            )
            for t in range(3)
        ]

    end = b"\x00\x00\x01\xb7"
    ves1 = encode_m2v(frames(0), qscale_code=3, p_frames=True)
    ves2 = encode_m2v(frames(3), qscale_code=4, p_frames=True)
    assert ves1.endswith(end)
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(2304) / 48000)
    aes = encode_mp2(tone, 48000, 192)
    half = len(aes) // 2
    # MP2 frames are 576 bytes at 48k/192k: split on a frame boundary
    half -= half % 576
    playlist, files = build_hls(
        [
            {VIDEO_STREAM_0: ves1[: -len(end)], AUDIO_STREAM_0: aes[:half]},
            {VIDEO_STREAM_0: ves2, AUDIO_STREAM_0: aes[half:]},
        ],
        pes_chunk=512,
    )
    out = demux_hls(playlist, files)
    sv = out["streams"][VIDEO_STREAM_0]
    assert sv["stream_type"] == 0x02
    meta, dec = decode_m2v(sv["data"])
    assert meta["n_frames"] == 6 and meta["n_p"] == 4
    assert len(dec) == 6
    rate, _ch, pcm = decode_mp2(out["streams"][AUDIO_STREAM_0]["data"])
    assert rate == 48000 and pcm.shape[1] > 0
    # both segments really decode to THEIR frames (display order)
    src = frames(0) + frames(3)
    for t in (0, 3):
        a = src[t].astype(np.float64)
        b = dec[t].astype(np.float64)
        snr = 10 * np.log10(
            (a**2).sum() / max(((a - b) ** 2).sum(), 1e-9)
        )
        assert snr > 15, t


def test_segments_with_different_pids_still_stitch():
    """Aggregation is by PES stream id, not PID — segments from
    different packagers may map the same stream to different PIDs."""
    from articulation_vector_db_api_spark.functions.mpegps import (
        _pes_packet2,
    )
    from articulation_vector_db_api_spark.functions.mpegts import (
        _psi_packet,
        _section,
    )

    def one_segment(pid, payload, pts):
        pat = bytes([0x00, 0x01, 0xE0 | 0x10, 0x00])
        pmt = bytes([
            0xE0 | (pid >> 8), pid & 0xFF, 0xF0, 0x00,
            0x01, 0xE0 | (pid >> 8), pid & 0xFF, 0xF0, 0x00,
        ])
        pkts = [
            _psi_packet(0x0000, _section(0x00, 1, pat), 0),
            _psi_packet(0x1000, _section(0x02, 1, pmt), 0),
        ]
        pes = _pes_packet2(0xE0, payload, pts)
        at, first, cc = 0, True, 0
        while at < len(pes):
            take = min(len(pes) - at, 184)
            need = 184 - take
            if need == 1:
                af = bytes([0])
            elif need:
                af = bytes([need - 1, 0x00]) + b"\xff" * (need - 2)
            else:
                af = b""
            pkts.append(
                bytes([
                    0x47,
                    (0x40 if first else 0) | (pid >> 8),
                    pid & 0xFF,
                    (0x30 if af else 0x10) | cc,
                ]) + af + pes[at : at + take]
            )
            cc, at, first = (cc + 1) & 0xF, at + take, False
        return b"".join(pkts)

    v1, v2 = b"\x31" * 500, b"\x32" * 400
    pl = "#EXTM3U\n#EXTINF:1,\na.ts\n#EXTINF:1,\nb.ts\n#EXT-X-ENDLIST\n"
    out = demux_hls(
        pl,
        {"a.ts": one_segment(0x100, v1, 3600),
         "b.ts": one_segment(0x1E0, v2, 7200)},
    )
    assert out["streams"][VIDEO_STREAM_0]["data"] == v1 + v2


def test_master_playlist_parse_and_variant_pick():
    from articulation_vector_db_api_spark.functions.hls import (
        parse_m3u8_master,
    )

    master = (
        "#EXTM3U\n"
        '#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360,'
        'CODECS="avc1.4d401e,mp4a.40.2"\n'
        "low/index.m3u8\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=2500000,RESOLUTION=1280x720\n"
        "hi/index.m3u8\n"
    )
    out = parse_m3u8_master(master)
    assert out["best"] == "hi/index.m3u8"
    assert out["variants"][0]["codecs"] == "avc1.4d401e,mp4a.40.2"
    assert out["variants"][0]["resolution"] == "640x360"
    with pytest.raises(ValueError, match="no #EXT-X-STREAM-INF"):
        parse_m3u8_master("#EXTM3U\n#EXTINF:1,\nseg.ts\n")
    with pytest.raises(ValueError, match="without a URI"):
        parse_m3u8_master("#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=1\n")
    with pytest.raises(ValueError, match="BANDWIDTH"):
        parse_m3u8_master(
            "#EXTM3U\n#EXT-X-STREAM-INF:RESOLUTION=1x1\nx.m3u8\n"
        )
    # the media-playlist side of the fence still routes correctly
    with pytest.raises(NotImplementedError, match="master"):
        parse_m3u8(master)


def test_encrypted_segments_roundtrip():
    """#EXT-X-KEY METHOD=AES-128 (RFC 8216 §4.3.2.4): whole-segment
    CBC+PKCS7, IV defaulting to the media sequence number."""
    from articulation_vector_db_api_spark.functions.mpegts import (
        AUDIO_STREAM_0,
        VIDEO_STREAM_0,
    )

    segs = [
        {VIDEO_STREAM_0: bytes(range(256)) * 4, AUDIO_STREAM_0: b"au" * 700},
        {VIDEO_STREAM_0: bytes(range(255, -1, -1)) * 4,
         AUDIO_STREAM_0: b"io" * 700},
    ]
    plain = demux_hls(*build_hls(segs))
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pl, files = build_hls(segs, key=key)
    assert '#EXT-X-KEY:METHOD=AES-128,URI="stream.key"' in pl
    assert files["stream.key"] == key
    # ciphertext really is ciphertext (no TS sync byte grid)
    assert files["seg0.ts"][0:1] != b"\x47"
    out = demux_hls(pl, files)
    for sid in (VIDEO_STREAM_0, AUDIO_STREAM_0):
        assert out["streams"][sid]["data"] == plain["streams"][sid]["data"]
    # per-seq IVs differ per segment
    meta = parse_m3u8(pl)
    ivs = [m["key"]["iv"] for m in meta["media"]]
    assert ivs == [(0).to_bytes(16, "big"), (1).to_bytes(16, "big")]
    # explicit IV is declared and honored
    iv = bytes.fromhex("9f8e7d6c5b4a39281716051423324150")
    pl2, files2 = build_hls(segs, key=key, iv=iv)
    assert f"IV=0x{iv.hex()}" in pl2
    out2 = demux_hls(pl2, files2)
    assert out2["streams"][VIDEO_STREAM_0]["data"] == \
        plain["streams"][VIDEO_STREAM_0]["data"]


def test_byterange_packed_resource():
    """#EXT-X-BYTERANGE (§4.3.2.2): segments as sub-ranges of one
    packed resource, implicit offsets continuing the previous range."""
    from articulation_vector_db_api_spark.functions.mpegts import (
        VIDEO_STREAM_0,
    )

    segs = [{VIDEO_STREAM_0: bytes([k]) * 3000} for k in range(3)]
    plain = demux_hls(*build_hls(segs))
    pl, files = build_hls(segs, byterange=True)
    assert "#EXT-X-VERSION:4" in pl and list(files) == ["media.bin"]
    assert pl.count("#EXT-X-BYTERANGE:") == 3
    assert pl.count("@") == 1  # only the first range is explicit
    out = demux_hls(pl, files)
    assert out["n_segments"] == 3
    assert out["streams"][VIDEO_STREAM_0]["data"] == \
        plain["streams"][VIDEO_STREAM_0]["data"]
    # byterange + encryption compose
    key = bytes.fromhex("ffeeddccbbaa99887766554433221100")
    ple, fe = build_hls(segs, key=key, byterange=True)
    oute = demux_hls(ple, fe)
    assert oute["streams"][VIDEO_STREAM_0]["data"] == \
        plain["streams"][VIDEO_STREAM_0]["data"]


def test_key_and_byterange_error_contract():
    """Named gates (VERDICT r13 item 3) and fetch/slice errors."""
    head = "#EXTM3U\n#EXT-X-TARGETDURATION:1\n"
    with pytest.raises(NotImplementedError, match="SAMPLE-AES"):
        parse_m3u8(head + '#EXT-X-KEY:METHOD=SAMPLE-AES,URI="k"\n'
                   "#EXTINF:1,\ns.ts\n")
    with pytest.raises(NotImplementedError, match="KEYFORMAT"):
        parse_m3u8(
            head + '#EXT-X-KEY:METHOD=AES-128,URI="k",'
            'KEYFORMAT="com.apple.streamingkeydelivery"\n'
            "#EXTINF:1,\ns.ts\n"
        )
    with pytest.raises(ValueError, match="without URI"):
        parse_m3u8(head + "#EXT-X-KEY:METHOD=AES-128\n#EXTINF:1,\ns.ts\n")
    with pytest.raises(ValueError, match="METHOD"):
        parse_m3u8(head + '#EXT-X-KEY:METHOD=ROT13,URI="k"\n'
                   "#EXTINF:1,\ns.ts\n")
    with pytest.raises(ValueError, match="IV"):
        parse_m3u8(head + '#EXT-X-KEY:METHOD=AES-128,URI="k",IV=0x12\n'
                   "#EXTINF:1,\ns.ts\n")
    # METHOD=NONE resets the context
    meta = parse_m3u8(
        head + '#EXT-X-KEY:METHOD=AES-128,URI="k"\n#EXTINF:1,\na.ts\n'
        "#EXT-X-KEY:METHOD=NONE\n#EXTINF:1,\nb.ts\n"
    )
    assert meta["media"][0]["key"] is not None
    assert meta["media"][1]["key"] is None
    # implicit byterange continuation needs the same resource
    with pytest.raises(ValueError, match="4.3.2.2"):
        parse_m3u8(
            head + "#EXT-X-BYTERANGE:10@0\n#EXTINF:1,\na.bin\n"
            "#EXT-X-BYTERANGE:10\n#EXTINF:1,\nb.bin\n"
        )
    with pytest.raises(ValueError, match="4.3.2.2"):
        parse_m3u8(head + "#EXT-X-BYTERANGE:10\n#EXTINF:1,\na.bin\n")
    # byterange past the resource end
    pl = (head + "#EXT-X-BYTERANGE:100@0\n#EXTINF:1,\na.bin\n"
          "#EXT-X-ENDLIST\n")
    with pytest.raises(ValueError, match="beyond"):
        demux_hls(pl, {"a.bin": b"short"})
    # missing / wrong-size key
    from articulation_vector_db_api_spark.functions.mpegts import (
        VIDEO_STREAM_0,
    )

    key = bytes(range(16))
    ple, fe = build_hls([{VIDEO_STREAM_0: b"v" * 2000}], key=key)
    missing = {u: b for u, b in fe.items() if u != "stream.key"}
    with pytest.raises(ValueError, match="key not fetched"):
        demux_hls(ple, missing)
    short = dict(fe)
    short["stream.key"] = b"tooshort"
    with pytest.raises(ValueError, match="8 bytes"):
        demux_hls(ple, short)
    wrong = dict(fe)
    wrong["stream.key"] = bytes.fromhex("aa" * 16)
    with pytest.raises(ValueError, match="padding"):
        demux_hls(ple, wrong)


def test_media_sequence_after_first_segment_raises():
    """r14 self-review F10 (RFC 8216 §4.3.3.2): #EXT-X-MEDIA-SEQUENCE
    MUST appear before the first segment — applied late it would
    renumber the sequence the earlier default IVs derive from."""
    with pytest.raises(ValueError, match="MEDIA-SEQUENCE after"):
        parse_m3u8(
            "#EXTM3U\n#EXTINF:1,\na.ts\n"
            "#EXT-X-MEDIA-SEQUENCE:7\n#EXTINF:1,\nb.ts\n"
        )


def test_negative_sequence_and_byterange_rejected():
    """r14 review: a negative #EXT-X-MEDIA-SEQUENCE overflowed the
    128-bit IV derivation (OverflowError escaping the contract), and
    a negative @offset sliced the packed resource from the END via
    Python negative indexing — silently wrong bytes."""
    head = "#EXTM3U\n#EXT-X-TARGETDURATION:1\n"
    with pytest.raises(ValueError, match="negative"):
        parse_m3u8("#EXTM3U\n#EXT-X-MEDIA-SEQUENCE:-1\n"
                   "#EXTINF:1,\na.ts\n")
    with pytest.raises(ValueError, match="out of range"):
        parse_m3u8(head + "#EXT-X-BYTERANGE:752@-10\n#EXTINF:1,\na.bin\n")
    with pytest.raises(ValueError, match="out of range"):
        parse_m3u8(head + "#EXT-X-BYTERANGE:0@0\n#EXTINF:1,\na.bin\n")
