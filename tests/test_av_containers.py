"""Ogg (functions/ogg.py) and EBML/WebM (functions/ebml.py) container
walks: spec anchors, structural verification, and corruption
contracts."""

from __future__ import annotations

import struct

import pytest

from articulation_vector_db_api_spark.functions.ebml import (
    build_webm,
    parse_ebml,
)
from articulation_vector_db_api_spark.functions.ogg import (
    _ogg_crc,
    build_ogg_opus,
    build_ogg_vorbis,
    parse_ogg,
)


def test_ogg_crc_spec_anchor():
    # Ogg's CRC-32 is poly 0x04C11DB7, init 0, unreflected, NO xor-out.
    # CRC-32/POSIX (cksum) is the same machine WITH xor-out 0xFFFFFFFF
    # and published check value 0x765E7680 for "123456789" — so ours
    # must be its complement. An anchor independent of this code.
    assert _ogg_crc(b"123456789") == 0x765E7680 ^ 0xFFFFFFFF


def test_ogg_opus_roundtrip():
    meta = parse_ogg(build_ogg_opus(channels=2, duration_ms=1230))
    assert meta == {
        "codec": "opus",
        "channels": 2,
        "sample_rate": 48000,
        "duration_ms": 1230,
        "n_pages": 3,
    }


def test_ogg_vorbis_roundtrip():
    meta = parse_ogg(build_ogg_vorbis(channels=1, rate=16000,
                                      duration_ms=250))
    assert meta["codec"] == "vorbis"
    assert meta["sample_rate"] == 16000
    assert meta["duration_ms"] == 250


def test_ogg_large_packet_lacing():
    # a >255-byte head forces multi-segment lacing (255-valued lacing
    # entries + terminator); pre-skip subtraction still exact
    stream = build_ogg_opus(channels=1, duration_ms=40, pre_skip=3840)
    assert parse_ogg(stream)["duration_ms"] == 40


def test_ogg_corruption_contract():
    good = bytearray(build_ogg_opus(channels=1, duration_ms=100))
    bad = good.copy()
    bad[40] ^= 0x01  # flip inside the OpusHead payload
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(bad))
    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(b"NotOgg" + bytes(good))
    with pytest.raises(ValueError, match="truncated"):
        parse_ogg(bytes(good[:-4]))
    # stream that never flags EOS: drop the final (EOS) page by
    # splitting the stream at page boundaries
    no_eos = build_ogg_opus(channels=1, duration_ms=100)
    pages = []
    i = 0
    while i < len(no_eos):
        n = no_eos[i + 26]
        body = sum(no_eos[i + 27 : i + 27 + n])
        end = i + 27 + n + body
        pages.append(no_eos[i:end])
        i = end
    with pytest.raises(ValueError, match="EOS"):
        parse_ogg(b"".join(pages[:-1]))


def test_ogg_unknown_codec_gated():
    # hand-build a BOS+EOS stream whose first packet is neither
    # OpusHead nor a Vorbis ident
    from articulation_vector_db_api_spark.functions.ogg import _page

    stream = _page(b"FLACxxxx", 0, 9, 0, 0x02) + _page(b"z", 100, 9, 1, 0x04)
    with pytest.raises(NotImplementedError, match="Opus/Vorbis"):
        parse_ogg(stream)


def test_webm_roundtrip_and_defaults():
    meta = parse_ebml(
        build_webm(1280, 720, 12345, audio_rate=44100, audio_channels=1)
    )
    assert {k: meta[k] for k in ("doctype", "duration_ms", "video", "audio")} == {
        "doctype": "webm",
        "duration_ms": 12345,
        "video": [(1280, 720)],
        "audio": [(44100, 1)],
    }
    assert parse_ebml(build_webm(2, 2, 1, doctype="matroska"))[
        "doctype"
    ] == "matroska"


def test_webm_unknown_size_segment():
    # replace the Segment's size vint with the 8-byte all-ones
    # "unknown — extends to end" form (RFC 8794 §6); the walk must
    # still find Info and Tracks
    b = bytearray(build_webm(64, 48, 10))
    i = b.find(bytes.fromhex("18538067"))
    ln = 9 - b[i + 4].bit_length()
    patched = (
        bytes(b[: i + 4]) + bytes([0x01] + [0xFF] * 7) + bytes(b[i + 4 + ln:])
    )
    meta = parse_ebml(patched)
    assert meta["video"] == [(64, 48)] and meta["duration_ms"] == 10


def test_ebml_corruption_contract():
    with pytest.raises(ValueError, match="not an EBML"):
        parse_ebml(b"\x00\x00\x00\x00junk")
    good = build_webm(64, 48, 10)
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_ebml(good[:-5])
    # float duration of an invalid width
    bad = bytearray(good)
    i = bad.find(bytes([0x44, 0x89]))  # Duration element id
    bad[i + 2] = 0x83  # declare size 3 (invalid float width)
    with pytest.raises(ValueError, match="float of width|overruns"):
        parse_ebml(bytes(bad[: i + 3 + 3]) + bytes(bad[i + 3 + 8 :]))


def test_ebml_float32_duration_and_scale():
    # hand-build Info with float32 Duration and a non-default
    # TimestampScale of 2ms per tick
    from articulation_vector_db_api_spark.functions.ebml import (
        _DURATION,
        _INFO,
        _SEGMENT,
        _TS_SCALE,
        _el,
        _uint_el,
    )

    header = build_webm(2, 2, 1)[: build_webm(2, 2, 1).find
                                 (bytes.fromhex("18538067"))]
    info = _el(
        _INFO,
        _uint_el(_TS_SCALE, 2_000_000)
        + _el(_DURATION, struct.pack(">f", 50.0)),
    )
    meta = parse_ebml(header + _el(_SEGMENT, info))
    assert meta["duration_ms"] == 100  # 50 ticks x 2 ms


def test_ogg_opus_off_ms_granule_rounds():
    # 2.5 ms Opus frames (120 samples) are legal RFC 6716 sizes, so
    # final granules need not land on ms boundaries — the probe must
    # round, never reject (ADVICE r7)
    from articulation_vector_db_api_spark.functions.ogg import _page

    head = b"OpusHead" + bytes([1, 1]) + struct.pack("<HIhB", 0, 48000, 0, 0)
    stream = _page(head, 0, 9, 0, 0x02) + _page(b"\xfc" * 8, 120, 9, 1, 0x04)
    assert parse_ogg(stream)["duration_ms"] == 3  # round(120/48) = 2.5 -> 3


def test_ogg_vorbis_off_ms_granule_rounds():
    # 44101 samples at 44.1 kHz ends 1/44100 s past the second — real
    # Vorbis files almost always end off ms boundaries (ADVICE r7)
    from articulation_vector_db_api_spark.functions.ogg import _page

    ident = (
        b"\x01vorbis"
        + struct.pack("<IB I i i i", 0, 1, 44100, 0, 0, 0)
        + bytes([0xB8, 0x01])
    )
    stream = (
        _page(ident, 0, 7, 0, 0x02) + _page(b"\x00" * 8, 44101, 7, 1, 0x04)
    )
    assert parse_ogg(stream)["duration_ms"] == 1000


def test_ogg_packet_reassembly_and_flac_roundtrip():
    """ogg_packets reassembles lacing-split packets (incl. a packet
    spanning two pages via the continuation flag), and Ogg-FLAC
    decodes end-to-end through the native FLAC decoder."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.ogg import (
        build_ogg_flac,
        decode_ogg_flac,
        ogg_packets,
    )

    rng = np.random.RandomState(11)
    sig = rng.randint(-20000, 20000, 700).astype(np.int16)
    plain = build_ogg_flac(sig, rate=22050, block_size=256)
    spanned = build_ogg_flac(sig, rate=22050, block_size=256,
                             span_pages=True)
    # identical packet stream either way — pagination is transparent
    assert [p for p, _g, _s in ogg_packets(plain)] == [
        p for p, _g, _s in ogg_packets(spanned)
    ]
    assert parse_ogg(spanned)["n_pages"] == parse_ogg(plain)["n_pages"] + 1
    for stream in (plain, spanned):
        rate, dec = decode_ogg_flac(stream)
        assert rate == 22050
        assert np.array_equal(dec[:, 0], sig)  # lossless through Ogg
    meta = parse_ogg(plain)
    assert meta["codec"] == "flac" and meta["channels"] == 1
    assert meta["duration_ms"] == round(700 * 1000 / 22050)


def test_ogg_flac_corruption_contract():
    import numpy as np
    import pytest as _pytest

    from articulation_vector_db_api_spark.functions.ogg import (
        build_ogg_flac,
        decode_ogg_flac,
        ogg_packets,
    )

    sig = np.arange(300, dtype=np.int16)
    good = build_ogg_flac(sig, span_pages=False)
    with _pytest.raises(ValueError, match="not an Ogg-FLAC"):
        decode_ogg_flac(build_ogg_opus(channels=1, duration_ms=10))
    # truncating after an open (all-255) page leaves a mid-packet EOF
    spanned = bytearray(
        build_ogg_flac(
            np.random.RandomState(3)
            .randint(-20000, 20000, 400)
            .astype(np.int16),
            block_size=192,
            span_pages=True,
        )
    )
    # find the continuation page (htype bit 0x01) and cut before it
    pos = spanned.find(b"OggS", 4)
    while pos >= 0 and not spanned[pos + 5] & 0x01:
        pos = spanned.find(b"OggS", pos + 4)
    assert pos > 0
    with _pytest.raises(ValueError, match="mid-packet"):
        list(ogg_packets(bytes(spanned[:pos])))
    # flipping a payload byte breaks the page CRC before FLAC even runs
    bad = bytearray(good)
    bad[-3] ^= 0x40
    with _pytest.raises(ValueError, match="CRC"):
        decode_ogg_flac(bytes(bad))


def _split_pages(stream: bytes) -> list[bytes]:
    offs = []
    pos = 0
    while True:
        pos = stream.find(b"OggS", pos)
        if pos < 0:
            break
        offs.append(pos)
        pos += 4
    return [
        stream[a:b] for a, b in zip(offs, offs[1:] + [len(stream)])
    ]


def test_ogg_multiplexed_streams_gated_chained_probes_first_link():
    """Grouped (concurrently multiplexed) streams are an honest
    NotImplementedError — mixing serials' granules would report wrong
    durations; a CHAINED stream (new BOS after EOS, RFC 3533 §4)
    probes its first link."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.ogg import (
        decode_ogg_flac,
        ogg_packets,
    )

    opus = build_ogg_opus(channels=1, duration_ms=100, serial=1)
    vorbis = build_ogg_vorbis(channels=1, rate=16000, duration_ms=50,
                              serial=2)
    a, b = _split_pages(opus), _split_pages(vorbis)
    grouped = a[0] + b[0] + a[1] + b[1] + a[2]
    with pytest.raises(NotImplementedError, match="multiplexed"):
        parse_ogg(grouped)
    with pytest.raises(NotImplementedError, match="multiplexed"):
        list(ogg_packets(grouped))
    # chained: first link's facts, second link untouched
    chained = opus + vorbis
    meta = parse_ogg(chained)
    assert (meta["codec"], meta["duration_ms"], meta["n_pages"]) == (
        "opus", 100, 3,
    )
    # chained Ogg-FLAC decodes only its first link too
    from articulation_vector_db_api_spark.functions.ogg import build_ogg_flac

    sig = np.arange(200, dtype=np.int16)
    flac_chain = build_ogg_flac(sig, serial=7) + vorbis
    rate, dec = decode_ogg_flac(flac_chain)
    assert np.array_equal(dec[:, 0], sig)


def _toc(cfg: int, stereo: bool, code: int) -> bytes:
    return bytes([cfg << 3 | (4 if stereo else 0) | code])


def test_opus_packet_framing_codes():
    """RFC 6716 §3.1-3.2: all four frame-count codes parse with the
    Table 2 durations; the R-rules reject malformed packets."""
    from articulation_vector_db_api_spark.functions.opus import (
        parse_opus_packet,
    )

    cases = [
        (_toc(8, False, 0) + b"\x11\x22\x33", 1, 480),   # SILK WB 10ms
        (_toc(1, True, 1) + b"\xaa" * 4, 2, 1920),       # SILK NB 20ms x2
        (_toc(13, False, 0) + b"\x00", 1, 960),          # hybrid SWB 20ms
        (_toc(16, False, 3) + bytes([5]) + b"\x00" * 10, 5, 600),  # CBR
        (  # VBR + 2 padding bytes, 3x 10ms CELT frames
            _toc(18, False, 3) + bytes([0x80 | 0x40 | 3, 2])
            + bytes([1, 1]) + b"\x01\x01\x05" + b"\x00\x00",
            3, 1440,
        ),
    ]
    for pkt, frames, samples in cases:
        p = parse_opus_packet(pkt)
        assert (p.frames, p.samples48) == (frames, samples)
    assert parse_opus_packet(cases[1][0]).stereo
    assert parse_opus_packet(cases[4][0]).vbr
    bad = [
        (_toc(0, False, 1) + b"\x01" * 3, "odd"),       # R3
        (_toc(0, False, 3) + bytes([0]), "zero"),       # R5
        (_toc(3, False, 3) + bytes([3]) + b"\x00" * 3, "120"),  # R5
        (_toc(16, False, 3) + bytes([5]) + b"\x00" * 7, "evenly"),  # R6
        (_toc(16, False, 3) + bytes([0x80 | 2, 255]), "length"),
        (b"", "empty"),
    ]
    for pkt, msg in bad:
        with pytest.raises(ValueError, match=msg):
            parse_opus_packet(pkt)


def test_opus_stream_stats_roundtrip():
    from articulation_vector_db_api_spark.functions.ogg import (
        build_ogg_opus_packets,
    )
    from articulation_vector_db_api_spark.functions.opus import (
        opus_stream_stats,
    )

    packets = [
        _toc(8, False, 0) + b"\x11\x22\x33",
        _toc(1, True, 1) + b"\xaa" * 4,
        _toc(16, False, 3) + bytes([5]) + b"\x00" * 10,
    ]
    stream = build_ogg_opus_packets(packets)
    stats = opus_stream_stats(stream)
    assert stats["n_packets"] == 3 and stats["n_frames"] == 8
    assert stats["samples48"] == 480 + 1920 + 600
    assert stats["n_silk"] == 2 and stats["n_celt"] == 1
    assert stats["n_stereo_packets"] == 1
    # parse_ogg's granule duration agrees with TOC arithmetic
    assert parse_ogg(stream)["duration_ms"] == stats["duration_ms"]
    with pytest.raises(ValueError, match="not an Ogg-Opus"):
        opus_stream_stats(build_ogg_vorbis(1, 16000, 100))


def test_mp3_frame_walk():
    """ISO 11172-3/13818-3 header walk: duration/bitrate/rate facts
    across MPEG versions and layers, ID3v2/v1 envelopes, Xing
    cross-check, and the corruption contract."""
    from articulation_vector_db_api_spark.functions.mp3 import (
        build_mp3,
        parse_mp3,
    )

    m = parse_mp3(build_mp3([(9, 0)] * 5, xing=True, id3v2_bytes=64,
                            id3v1=True))
    assert m == {
        "version": "1", "layer": 3, "sample_rate": 44100,
        "channels": 1, "n_frames": 5, "samples": 5760,
        "duration_ms": 131, "bitrate_kbps": 128, "vbr": False,
        "has_id3v2": True, "has_xing": True,
    }
    # varying bitrate indices = VBR, bitrate_kbps undefined
    m = parse_mp3(build_mp3([(1, 0), (9, 1), (14, 0)]))
    assert m["vbr"] and m["bitrate_kbps"] is None and m["n_frames"] == 3
    # MPEG-2 Layer III: 576 samples/frame; Layers I/II: 384/1152
    assert parse_mp3(build_mp3([(5, 0)] * 4, version="2",
                               rate_idx=2))["samples"] == 2304
    assert parse_mp3(build_mp3([(7, 0)] * 2, layer=2))["samples"] == 2304
    assert parse_mp3(build_mp3([(7, 1)] * 2, layer=1))["samples"] == 768
    base = build_mp3([(9, 0)] * 3)
    with pytest.raises(ValueError, match="truncated"):
        parse_mp3(base[:-5])
    bad = bytearray(base)
    bad[0] = 0x00
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(bytes(bad))
    # a frame appended after the Xing count must be caught
    with pytest.raises(ValueError, match="Xing"):
        parse_mp3(build_mp3([(9, 0)] * 3, xing=True) + build_mp3([(9, 0)]))
    # Xing cannot fit an 8 kbps MPEG-2 stereo frame — builder refuses
    with pytest.raises(ValueError, match="Xing"):
        build_mp3([(1, 0)] * 2, version="2", mono=False, xing=True)
    # free-format bitrate stays gated; reserved rate index refused
    hdr = bytearray(build_mp3([(9, 0)]))
    hdr[2] &= 0x0F  # bitrate index -> 0 (free format)
    with pytest.raises(NotImplementedError, match="free-format"):
        parse_mp3(bytes(hdr))


def test_adts_frame_walk():
    """ISO 13818-7 §6.2: explicit frame lengths, raw-data-block
    sample math, profile/rate/channel pinning, corruption contract."""
    from articulation_vector_db_api_spark.functions.adts import (
        build_adts,
        parse_adts,
    )

    m = parse_adts(build_adts([100, 50, 75], profile=1, rate_idx=8,
                              channels=2, rdb=2))
    assert m == {
        "profile": "LC", "sample_rate": 16000, "channels": 2,
        "n_frames": 3, "samples": 6144, "duration_ms": 384,
        "protected": False,
    }
    base = build_adts([30] * 3)
    with pytest.raises(ValueError, match="truncated"):
        parse_adts(base[:-5])
    bad = bytearray(base)
    bad[0] = 0
    with pytest.raises(ValueError, match="sync"):
        parse_adts(bytes(bad))
    with pytest.raises(ValueError, match="change"):
        parse_adts(build_adts([30], rate_idx=8) + build_adts([30],
                                                             rate_idx=4))
    with pytest.raises(NotImplementedError, match="PCE"):
        parse_adts(build_adts([10], channels=0))


def test_mp3_crc_protected_xing_offset():
    """ADVICE r8: a CRC-protected frame carries 2 CRC bytes before the
    side info, shifting the Xing tag by 2 — the sniff must honor the
    protection bit or a real Xing header goes silently unseen."""
    from articulation_vector_db_api_spark.functions.mp3 import (
        build_mp3,
        parse_mp3,
    )

    m = parse_mp3(build_mp3([(9, 0)] * 4, xing=True, crc=True))
    assert m["has_xing"] and m["n_frames"] == 4
    # and the count cross-check still bites through the CRC offset
    with pytest.raises(ValueError, match="Xing"):
        parse_mp3(
            build_mp3([(9, 0)] * 2, xing=True, crc=True)
            + build_mp3([(9, 0)])
        )


def test_mp3_xing_reads_bounded_to_frame0():
    """ADVICE r8: a 24-byte MPEG-2 mono 8 kbps frame can hold a Xing
    tag + flags but NOT the frame-count field (offset 13+8=21, count
    would end at 25 > 24) — the count read must not alias bytes from
    frame 1."""
    from articulation_vector_db_api_spark.functions.mp3 import (
        build_mp3,
        parse_mp3,
    )

    raw = bytearray(build_mp3([(1, 0)] * 2, version="2", rate_idx=1))
    assert raw[4:28][:0] == b""  # frame length is 24
    # hand-place a Xing tag with the frames flag set at side offset 9
    raw[13:17] = b"Xing"
    raw[17:21] = (1).to_bytes(4, "big")
    m = parse_mp3(bytes(raw))
    # count field does not fit in frame 0 -> tag ignored, no crash,
    # and no garbage cross-check against bytes of frame 1
    assert m["n_frames"] == 2 and not m["has_xing"]


def test_adts_rejects_nonzero_layer():
    """ADVICE r8 / ISO 13818-7: layer must be '00'. An MPEG-1 audio
    frame shares the 12-bit sync, so an MP3 stream fed to the ADTS
    parser must fail loudly instead of yielding garbage facts."""
    from articulation_vector_db_api_spark.functions.adts import (
        build_adts,
        parse_adts,
    )
    from articulation_vector_db_api_spark.functions.mp3 import build_mp3

    raw = bytearray(build_adts([30]))
    h = int.from_bytes(raw[:7], "big") | (1 << 41)
    raw[:7] = h.to_bytes(7, "big")
    with pytest.raises(ValueError, match="layer"):
        parse_adts(bytes(raw))
    # a real MPEG-1 Layer III frame: 12-bit sync matches, layer != 0
    with pytest.raises(ValueError, match="layer"):
        parse_adts(build_mp3([(9, 0)] * 2))


def test_ogg_eos_page_ending_mid_packet_raises():
    """ADVICE r8: an EOS page whose final lacing value is 255 leaves a
    packet open that can never complete — the walk must raise, not
    silently drop the partial packet."""
    from articulation_vector_db_api_spark.functions.ogg import (
        _page,
        _page_open,
        ogg_packets,
    )

    stream = _page(b"x" * 10, 0, 7, 0, 0x02) + _page_open(
        b"y" * 255, 7, 1, htype=0x04
    )
    with pytest.raises(ValueError, match="mid-packet"):
        list(ogg_packets(stream))


def test_decode_ogg_audio_dispatch():
    """r9: the unified Ogg audio entry point routes FLAC to the
    lossless decoder, Vorbis to the perceptual decoder, and names the
    codec when gated."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.ogg import (
        build_ogg_flac,
        build_ogg_opus,
        decode_ogg_audio,
    )
    from articulation_vector_db_api_spark.functions.vorbis import (
        build_ogg_vorbis_stream,
        encode_vorbis,
    )

    sig = (np.arange(384) % 251 - 125).astype(np.int16)
    codec, rate, samples = decode_ogg_audio(
        build_ogg_flac(sig, rate=16000, block_size=192)
    )
    assert codec == "flac" and rate == 16000
    assert np.array_equal(samples.reshape(-1), sig)

    x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(1000) / 8000)
    ogg = build_ogg_vorbis_stream(*encode_vorbis(x, 8000, 256))
    codec, rate, samples = decode_ogg_audio(ogg)
    assert codec == "vorbis" and rate == 8000
    assert samples.shape == (1000, 1)
    snr = 10 * np.log10((x ** 2).sum() / ((samples[:, 0] - x) ** 2).sum())
    assert snr > 25.0

    with pytest.raises(NotImplementedError, match="Opus"):
        decode_ogg_audio(build_ogg_opus(1, 100))


def test_mkv_cluster_block_walk_and_decode():
    """Matroska Cluster/SimpleBlock walk (r10): frame payloads, track
    routing, cluster-relative timestamps, and the none/Xiph/fixed
    lacing modes (EBML lacing has its own roundtrip test); V_MJPEG
    frames decode to pixels through functions/jpeg.py."""
    import numpy as np
    import pytest

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_frames,
        mkv_frames,
        parse_ebml,
    )
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    px = [np.full((24, 32, 3), 30 + 40 * i, dtype=np.uint8) for i in range(6)]
    jp = [encode_jpeg_baseline(f, quality=90) for f in px]

    # no lacing: per-frame timestamps survive the cluster math
    mkv = build_mkv_mjpeg(
        [(i * 100, j) for i, j in enumerate(jp)], 32, 24, lacing="none"
    )
    meta, dec = decode_mkv_frames(mkv)
    assert meta["tracks"][0]["codec_id"] == "V_MJPEG"
    assert [ts for _t, ts, _f in dec] == [0, 100, 200, 300, 400, 500]
    assert all(
        np.abs(a.astype(int) - f.astype(int)).max() <= 4
        for a, (_t, _ts, f) in zip(px, dec)
    )

    # Xiph lacing: laced frames share their block's (cluster) timestamp
    mkv = build_mkv_mjpeg(
        [(i * 100, j) for i, j in enumerate(jp)], 32, 24, lacing="xiph",
        frames_per_cluster=2,
    )
    _meta, dec = decode_mkv_frames(mkv)
    assert [ts for _t, ts, _f in dec] == [0, 0, 200, 200, 400, 400]

    # fixed lacing requires equal frame sizes and splits evenly
    same = [jp[0]] * 4
    mkv = build_mkv_mjpeg(
        [(i * 40, f) for i, f in enumerate(same)], 32, 24, lacing="fixed"
    )
    assert len(mkv_frames(mkv)) == 4
    textured = np.repeat(
        ((np.arange(24)[:, None] * 7 + np.arange(32)[None, :] * 13) % 256
         ).astype(np.uint8)[:, :, None], 3, axis=2,
    )
    big = encode_jpeg_baseline(textured, quality=95)
    assert len(big) != len(jp[0])
    with pytest.raises(ValueError, match="equal frame sizes"):
        build_mkv_mjpeg([(0, jp[0]), (40, big)], 32, 24, lacing="fixed")

    # non-MJPEG CodecID gates honestly
    bad = bytearray(build_mkv_mjpeg([(0, jp[0])], 32, 24))
    at = bytes(bad).find(b"V_MJPEG")
    bad[at:at + 7] = b"V_VP9\x00\x00"
    with pytest.raises(NotImplementedError, match="V_VP9"):
        decode_mkv_frames(bytes(bad))

    # EBML lacing (flags 0b110) DECODES as of r11 (see
    # test_ebml_lacing_mode_roundtrip); a malformed EBML-laced block
    # whose declared first-frame size overruns the block still fails
    # loudly rather than mis-slicing
    from articulation_vector_db_api_spark.functions import ebml as E

    block = b"\x81" + b"\x00\x00" + bytes([0x80 | 0x06]) + b"\x01" + b"xx"
    mkv2 = E._el(E._EBML, E._el(E._DOCTYPE, b"matroska")) + E._el(
        E._SEGMENT,
        E._el(E._CLUSTER,
              E._uint_el(E._CLUSTER_TS, 0)
              + E._el(E._SIMPLE_BLOCK, block)),
    )
    with pytest.raises(ValueError, match="overruns block"):
        mkv_frames(mkv2)


def test_mkv_fuzz_contract():
    import numpy as np

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_frames,
    )
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )
    from tests.test_fuzz_contracts import _assert_contract

    px = [np.full((12, 10, 3), 40 * i + 9, dtype=np.uint8) for i in range(4)]
    mkv = build_mkv_mjpeg(
        [(i * 50, encode_jpeg_baseline(f, 90)) for i, f in enumerate(px)],
        10, 12, lacing="xiph", frames_per_cluster=2,
    )
    _assert_contract("mkv", mkv, decode_mkv_frames)


def test_mp4_sample_table_walk_and_decode():
    """ISO 14496-12 sample tables (r10): stts run expansion, stsc
    partial-chunk layout, stsz/stco slicing, and 'jpeg' sample decode
    through functions/jpeg.py; foreign codecs gate by name."""
    import numpy as np
    import pytest

    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        decode_mp4_frames,
        mp4_samples,
        parse_mp4_meta,
    )
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    px = [np.full((24, 32, 3), 30 + 40 * i, dtype=np.uint8) for i in range(5)]
    jp = [encode_jpeg_baseline(f, quality=90) for f in px]
    durs = [9000, 9000, 4500, 4500, 4500]  # two stts runs
    mp4 = build_mp4_mjpeg(list(zip(durs, jp)), 32, 24)

    meta, samples = mp4_samples(mp4)
    assert meta == {
        "codec": "jpeg", "oti": None, "decoder_config": None,
        "width": 32, "height": 24, "timescale": 90000,
        "duration_ms": 350, "n_samples": 5,
        "sample_rate": None, "channels": None,  # audio-entry fields
    }
    # run expansion: 0,100,200 then 250,300 ms
    assert [t for t, _s in samples] == [0, 9000, 18000, 22500, 27000]
    # chunking of 2 with a trailing partial chunk still slices exactly
    assert [s for _t, s in samples] == jp

    _m, dec = decode_mp4_frames(mp4)
    assert [t for t, _f in dec] == [0, 100, 200, 250, 300]
    assert all(
        np.abs(a.astype(int) - f.astype(int)).max() <= 4
        for a, (_t, f) in zip(px, dec)
    )
    # the r4 metadata walker still reads the same file
    assert parse_mp4_meta(mp4)["tracks"][0] == {
        "track_id": 1, "width": 32, "height": 24,
    }

    # foreign sample codec gates by name
    bad = bytearray(mp4)
    at = bytes(bad).find(b"jpeg", bytes(bad).find(b"stsd"))
    bad[at:at + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(bytes(bad))

    # inconsistent stsz vs stts is a hard error
    bad2 = bytearray(mp4)
    at = bytes(bad2).find(b"stts") + 4 + 4
    bad2[at:at + 4] = (1).to_bytes(4, "big")  # one run only
    with pytest.raises(ValueError):
        mp4_samples(bytes(bad2))

    # r10 ADVICE: a non-visual sample entry (audio mp4a) must NOT have
    # AudioSampleEntry bytes misread as width/height — report 0x0
    aud = bytearray(mp4)
    at = bytes(aud).find(b"jpeg", bytes(aud).find(b"stsd"))
    aud[at:at + 4] = b"mp4a"
    m_aud, _s = mp4_samples(bytes(aud))
    assert (m_aud["width"], m_aud["height"]) == (0, 0)
    with pytest.raises(NotImplementedError, match="mp4a"):
        decode_mp4_frames(bytes(aud))


def test_mp4_fuzz_contract():
    import numpy as np

    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        decode_mp4_frames,
    )
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )
    from tests.test_fuzz_contracts import _assert_contract

    px = [np.full((12, 10, 3), 40 * i + 9, dtype=np.uint8) for i in range(3)]
    mp4 = build_mp4_mjpeg(
        [(3000, encode_jpeg_baseline(f, 90)) for f in px], 10, 12
    )
    _assert_contract("mp4-samples", mp4, decode_mp4_frames)


def test_review_findings_round10_containers():
    """Pins for the r10 self-review findings: stomped MP4 table counts
    are cheap ValueErrors (never giant expansions), and mkv_frames
    honors a TimestampScale that appears AFTER the clusters."""
    import struct as S
    import time

    import numpy as np
    import pytest

    from articulation_vector_db_api_spark.functions import ebml as E
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        mp4_samples,
    )
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    px = np.full((12, 10, 3), 55, dtype=np.uint8)
    mp4 = build_mp4_mjpeg(
        [(3000, encode_jpeg_baseline(px, 90))] * 3, 10, 12
    )
    # stomp the stts first run count to 30M: must ValueError in
    # milliseconds, not build a 30M-entry list first
    bad = bytearray(mp4)
    at = bytes(bad).find(b"stts") + 4 + 4 + 4  # box id + ver + n_runs
    bad[at:at + 4] = S.pack(">I", 30_000_000)
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="stts"):
        mp4_samples(bytes(bad))
    assert time.perf_counter() - t0 < 0.2
    # stomp the stsz sample count to 0xFFFFFF: same contract
    bad = bytearray(mp4)
    at = bytes(bad).find(b"stsz") + 4 + 4 + 4  # box id + ver + fixed
    bad[at:at + 4] = S.pack(">I", 0xFFFFFF)
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="stsz"):
        mp4_samples(bytes(bad))
    assert time.perf_counter() - t0 < 0.2

    # Matroska: Info AFTER the cluster must still scale timestamps
    jp = encode_jpeg_baseline(px, 90)
    block = b"\x81" + S.pack(">h", 4) + b"\x80" + jp
    cluster = E._el(
        E._CLUSTER, E._uint_el(E._CLUSTER_TS, 6) + E._el(E._SIMPLE_BLOCK, block)
    )
    info = E._el(E._INFO, E._uint_el(E._TS_SCALE, 2_000_000))
    mkv = E._el(E._EBML, E._el(E._DOCTYPE, b"matroska")) + E._el(
        E._SEGMENT, cluster + info  # Info LAST
    )
    frames = E.mkv_frames(mkv)
    assert [ts for _t, ts, _f in frames] == [(6 + 4) * 2]  # 2 ms ticks


# ---------------------------------------------------------------------------
# Matroska audio tracks (A_MPEG/L1, A_MPEG/L2)
# ---------------------------------------------------------------------------


def _mkv_av_fixture():
    import numpy as np

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
    )
    from articulation_vector_db_api_spark.functions.mp2 import encode_mp2
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        encode_m1v,
        split_m1v_header,
    )

    yy, xx = np.mgrid[0:32, 0:48]
    frames = []
    for i in range(4):
        base = (128 + 60 * np.sin(2 * np.pi * (xx / 48 + i * 0.13))
                + 40 * np.cos(2 * np.pi * yy / 32))
        frames.append(
            np.stack([np.clip(base, 0, 255)] * 3, -1).astype(np.uint8)
        )
    es = encode_m1v(frames, qscale=4)
    private, pics = split_m1v_header(es)
    t = np.arange(4000) / 48000
    aes = encode_mp2(0.5 * np.sin(2 * np.pi * 440 * t), 48000, 192)
    blocks = [
        (k * 30, aes[k * 600 : (k + 1) * 600])
        for k in range(-(-len(aes) // 600))
    ]
    mkv = build_mkv_mjpeg(
        [(i * 40, p) for i, p in enumerate(pics)], 48, 32,
        codec_id="V_MPEG1", codec_private=private, frames_per_cluster=2,
        audio_blocks=blocks, audio_codec_id="A_MPEG/L2",
        audio_rate=48000, audio_channels=1,
    )
    return mkv, es, aes


def test_mkv_av_video_still_decodes_with_audio_interleaved():
    from articulation_vector_db_api_spark.functions.ebml import (
        decode_mkv_frames,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import decode_m1v

    mkv, es, _aes = _mkv_av_fixture()
    _meta, decoded = decode_mkv_frames(mkv)
    direct = decode_m1v(es)[1]
    assert len(decoded) == 4
    for (_t, _ts, fr), d in zip(decoded, direct):
        assert (fr == d).all()


def test_mkv_audio_extracts_bit_exact_and_decodes():
    from articulation_vector_db_api_spark.functions.ebml import (
        extract_mkv_audio,
    )
    from articulation_vector_db_api_spark.functions.mp2 import decode_mp2

    mkv, _es, aes = _mkv_av_fixture()
    fmt, audio = extract_mkv_audio(mkv)
    assert fmt["codec_id"] == "A_MPEG/L2"
    assert (fmt["rate"], fmt["channels"]) == (48000, 1)
    assert audio == aes
    rate, ch, _pcm = decode_mp2(audio)
    assert (rate, ch) == (48000, 1)


def test_mkv_audio_gates():
    import pytest

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        extract_mkv_audio,
    )

    mkv, _es, _aes = _mkv_av_fixture()
    no_audio = build_mkv_mjpeg([(0, b"\xff\xd8fakejpeg\xff\xd9")], 8, 8)
    with pytest.raises(ValueError, match="no audio track"):
        extract_mkv_audio(no_audio)
    vorbis = build_mkv_mjpeg(
        [(0, b"\xff\xd8fakejpeg\xff\xd9")], 8, 8,
        audio_blocks=[(0, b"vorbispkt")], audio_codec_id="A_VORBIS",
    )
    with pytest.raises(NotImplementedError, match="A_VORBIS"):
        extract_mkv_audio(vorbis)


def test_fuzz_mkv_audio_contract():
    from articulation_vector_db_api_spark.functions.ebml import (
        extract_mkv_audio,
    )
    from tests.test_fuzz_contracts import _assert_contract

    mkv, _es, _aes = _mkv_av_fixture()
    _assert_contract("mkv-audio", mkv, extract_mkv_audio, n=100)


def test_xiph_codec_private_lacing_roundtrip():
    from articulation_vector_db_api_spark.functions.ebml import (
        parse_xiph_private,
        xiph_lace_private,
    )

    pkts = [b"a" * 300, b"bb", b"c" * 255, b"", b"tail"]
    assert parse_xiph_private(xiph_lace_private(pkts)) == pkts
    assert parse_xiph_private(xiph_lace_private([b"only"])) == [b"only"]
    with pytest.raises(ValueError, match="empty"):
        parse_xiph_private(b"")
    with pytest.raises(ValueError, match="truncated"):
        parse_xiph_private(b"\x02\xff")  # lacing cut mid-run


def test_mkv_vorbis_audio_decodes():
    """A_VORBIS per the Matroska codec mapping: three Xiph-laced
    header packets in CodecPrivate, one audio packet per block —
    decoded through functions/vorbis.py."""
    import numpy as np

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_audio,
        xiph_lace_private,
    )
    from articulation_vector_db_api_spark.functions.vorbis import (
        encode_vorbis,
    )

    t = np.arange(6000) / 48000
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(
        2 * np.pi * 1870 * t
    )
    packets, _granules = encode_vorbis(x, 48000, 256)
    mkv = build_mkv_mjpeg(
        [(0, b"\xff\xd8fake\xff\xd9")], 8, 8,
        audio_blocks=[(k * 10, p) for k, p in enumerate(packets[3:])],
        audio_codec_id="A_VORBIS", audio_rate=48000, audio_channels=1,
        audio_codec_private=xiph_lace_private(packets[:3]),
    )
    info, rate, ch, pcm = decode_mkv_audio(mkv)
    assert (info["codec_id"], rate, ch) == ("A_VORBIS", 48000, 1)
    got = pcm[0][: len(x)]
    snr = 10 * np.log10(
        (x**2).sum() / max(((got - x) ** 2).sum(), 1e-30)
    )
    assert snr > 25.0


def test_mkv_audio_decode_mpeg_layers_and_gates():
    import numpy as np

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_audio,
    )
    from articulation_vector_db_api_spark.functions.mp2 import encode_mp1

    t = np.arange(2000) / 48000
    aes = encode_mp1(0.4 * np.sin(2 * np.pi * 330 * t), 48000, 192)
    mkv = build_mkv_mjpeg(
        [(0, b"\xff\xd8fake\xff\xd9")], 8, 8,
        audio_blocks=[(0, aes[: len(aes) // 2]),
                      (20, aes[len(aes) // 2 :])],
        audio_codec_id="A_MPEG/L1", audio_rate=48000, audio_channels=1,
    )
    info, rate, ch, pcm = decode_mkv_audio(mkv)
    assert info["codec_id"] == "A_MPEG/L1" and rate == 48000
    assert pcm.shape[1] > 0
    opus = build_mkv_mjpeg(
        [(0, b"\xff\xd8fake\xff\xd9")], 8, 8,
        audio_blocks=[(0, b"opuspkt")], audio_codec_id="A_OPUS",
    )
    with pytest.raises(NotImplementedError, match="A_OPUS"):
        decode_mkv_audio(opus)
    vorbis_no_private = build_mkv_mjpeg(
        [(0, b"\xff\xd8fake\xff\xd9")], 8, 8,
        audio_blocks=[(0, b"pkt")], audio_codec_id="A_VORBIS",
    )
    with pytest.raises(ValueError, match="CodecPrivate"):
        decode_mkv_audio(vorbis_no_private)


def test_fuzz_mkv_vorbis_audio_contract():
    import numpy as np

    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_audio,
        xiph_lace_private,
    )
    from articulation_vector_db_api_spark.functions.vorbis import (
        encode_vorbis,
    )
    from tests.test_fuzz_contracts import _assert_contract

    t = np.arange(1500) / 48000
    packets, _g = encode_vorbis(
        0.4 * np.sin(2 * np.pi * 500 * t), 48000, 256
    )
    mkv = build_mkv_mjpeg(
        [(0, b"\xff\xd8fake\xff\xd9")], 8, 8,
        audio_blocks=[(k * 10, p) for k, p in enumerate(packets[3:])],
        audio_codec_id="A_VORBIS", audio_rate=48000, audio_channels=1,
        audio_codec_private=xiph_lace_private(packets[:3]),
    )
    _assert_contract("mkv-vorbis", mkv, decode_mkv_audio, n=60)


def test_ebml_lacing_mode_roundtrip():
    """EBML lacing (RFC 9559 mode 11): unsigned-vint first size,
    signed-vint deltas — the last remaining lacing mode, now decoded
    AND written."""
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        mkv_frames,
    )

    frames = [
        (0, b"first-frame"),
        (40, b"a-much-longer-second-frame!" * 12),  # big positive delta
        (80, b"x"),                                 # big negative delta
        (120, b"tail-frame-remainder"),
    ]
    for per_cluster in (4, 2, 3):
        mkv = build_mkv_mjpeg(
            frames, 8, 8, lacing="ebml", frames_per_cluster=per_cluster
        )
        got = [f for _t, _ts, f in mkv_frames(mkv)]
        assert got == [f for _ts, f in frames]
    # malformed: truncating inside the lace header raises, not crashes
    mkv = build_mkv_mjpeg(frames, 8, 8, lacing="ebml")
    from tests.test_fuzz_contracts import _assert_contract

    _assert_contract("mkv-ebml-lace", mkv, mkv_frames, n=80)


# ---------------------------------------------------------------------------
# MP4 audio tracks (mp4a + esds objectTypeIndication 0x6B)
# ---------------------------------------------------------------------------


def _mp4_audio_fixture(layer=2):
    import numpy as np

    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_audio,
    )
    from articulation_vector_db_api_spark.functions.mp2 import (
        encode_mp1,
        encode_mp2,
    )
    from articulation_vector_db_api_spark.functions.mp3 import _parse_header

    t = np.arange(4000) / 48000
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    enc = (encode_mp1 if layer == 1 else encode_mp2)(tone, 48000, 192)
    frames = []
    i = 0
    while i < len(enc):
        ln = _parse_header(enc, i)["length"]
        frames.append(enc[i : i + ln])
        i += ln
    spf = 384 if layer == 1 else 1152
    return build_mp4_audio([(spf, f) for f in frames], 48000), enc, tone


def test_mp4_audio_roundtrip_both_layers():
    import numpy as np

    from articulation_vector_db_api_spark.functions.isobmff import (
        decode_mp4_audio,
        mp4_samples,
    )

    for layer in (1, 2):
        m4a, enc, tone = _mp4_audio_fixture(layer)
        meta, samples = mp4_samples(m4a)
        assert meta["codec"] == "mp4a" and meta["oti"] == 0x6B
        assert meta["sample_rate"] == 48000 and meta["channels"] == 1
        assert b"".join(s for _ts, s in samples) == enc  # bit-exact
        info, rate, ch, pcm = decode_mp4_audio(m4a)
        assert (info["layer"], rate, ch) == (layer, 48000, 1)
        got = pcm[0][: len(tone)]
        snr = 10 * np.log10(
            (tone**2).sum() / max(((got - tone) ** 2).sum(), 1e-30)
        )
        assert snr > 30.0


def test_mp4_audio_gates():
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_audio,
        build_mp4_mjpeg,
        decode_mp4_audio,
    )

    video = build_mp4_mjpeg([(3600, b"\xff\xd8fake\xff\xd9")], 8, 8)
    with pytest.raises(NotImplementedError, match="sample entry"):
        decode_mp4_audio(video)
    aac = build_mp4_audio([(1024, b"aacframe")], 48000, oti=0x40)
    with pytest.raises(NotImplementedError, match="0x6B MPEG-1 Audio|objectTypeIndication"):
        decode_mp4_audio(aac)
    # Layer III frames inside mp4a/0x6B: honest synthesis gate
    l3_header = bytes([0xFF, 0xFB, 0x90, 0xC4]) + bytes(413)
    l3 = build_mp4_audio([(1152, l3_header)], 44100)
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_mp4_audio(l3)


def test_fuzz_mp4_audio_contract():
    from articulation_vector_db_api_spark.functions.isobmff import (
        decode_mp4_audio,
    )
    from tests.test_fuzz_contracts import _assert_contract

    m4a, _enc, _tone = _mp4_audio_fixture(2)
    _assert_contract("mp4-audio", m4a, decode_mp4_audio, n=100)


def test_mkv_audio_outruns_video_and_equal_ts_order():
    """r11 second-review fixes: (1) audio blocks landing >32.767 s
    after the last video cluster must roll into new audio-only
    clusters instead of overflowing the signed 16-bit relative
    timestamp; (2) equal-timestamp audio blocks must keep their input
    order (a tuple sort would reorder them by payload bytes)."""
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        extract_mkv_audio,
        mkv_frames,
    )

    blocks = [
        (0, b"zz-first-despite-sort-temptation"),
        (0, b"aa-second"),
        (40_000, b"far-future-chunk"),      # > int16 ms after cluster 0
        (75_000, b"even-later"),            # > 30 s after the previous
    ]
    mkv = build_mkv_mjpeg(
        [(0, b"\xff\xd8fake\xff\xd9")], 8, 8,
        audio_blocks=blocks, audio_codec_id="A_MPEG/L2",
    )
    fmt, audio = extract_mkv_audio(mkv)
    assert fmt["n_blocks"] == 4
    assert audio == b"".join(p for _ts, p in blocks)
    got = [
        (ts, fr) for track, ts, fr in mkv_frames(mkv) if track == 2
    ]
    assert [ts for ts, _ in got] == [0, 0, 40_000, 75_000]


def test_mkv_subtitle_track_does_not_abort_pixel_walk():
    """A real MKV carries subtitle tracks (S_TEXT/UTF8) next to the
    video; the pixel walk must skip them by TrackType, not die."""
    import numpy as np

    from articulation_vector_db_api_spark.functions import ebml as E
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    jp = encode_jpeg_baseline(
        np.full((8, 8, 3), 99, dtype=np.uint8), quality=90
    )
    mkv = bytearray(E.build_mkv_mjpeg(
        [(0, jp)], 8, 8,
        audio_blocks=[(0, b"subtitle line")],
        audio_codec_id="S_TEXT/UTF8",
    ))
    # the builder wrote TrackType 2 for the second track; flip it to
    # the subtitle type (0x11) to model a real subtitle TrackEntry
    at = bytes(mkv).find(b"S_TEXT/UTF8")
    t_at = bytes(mkv).rfind(b"\x83\x81\x02", 0, at)
    mkv[t_at + 2] = 0x11
    meta, dec = E.decode_mkv_frames(bytes(mkv))
    assert len(dec) == 1  # the video frame decodes, subtitles skipped
    assert meta["tracks"][1]["type"] == 0x11


def test_avi_audio_silently_empty_guard():
    """An auds strl whose chunks are absent from movi must raise, not
    return empty audio (r11 second review)."""
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        extract_avi_audio,
    )

    vpay, aes = _mkv_av_fixture()[1:]  # reuse es bytes for payloads
    avi = bytearray(build_avi(
        [b"picture-bytes"], 16, 16, "MPG1",
        audio_payloads=[aes[:100]],
        audio_format={"tag": 0x0050, "channels": 1, "rate": 48000,
                      "block_align": 1},
    ))
    # rename the movi + idx1 audio chunks away from the declared id
    out = bytes(avi).replace(b"01wb", b"07wb")
    with pytest.raises(ValueError, match="carries none"):
        extract_avi_audio(out)


def test_mkv_audio_long_before_first_video_cluster():
    """Audio timestamped more than 32768 ms before the first video
    cluster base can't fit a SimpleBlock's signed-16-bit relative
    timestamp: it rolls into dedicated LEADING audio-only clusters
    (re-based every <=30 s) instead of crashing in struct.pack."""
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        extract_mkv_audio,
    )

    jp = b"\xff\xd8fakejpeg\xff\xd9"
    # video starts at t=70 s; audio spans t=0..65 s (both the >30 s
    # re-base split and the in-window remainder are exercised)
    blocks = [(k * 5_000, b"pkt%d" % k) for k in range(14)]
    mkv = build_mkv_mjpeg(
        [(70_000, jp)], 8, 8,
        audio_blocks=blocks, audio_codec_id="A_MPEG/L2",
        audio_rate=48000, audio_channels=1,
    )
    fmt, audio = extract_mkv_audio(mkv)
    assert fmt["codec_id"] == "A_MPEG/L2"
    assert audio == b"".join(p for _ts, p in blocks)
