"""Deterministic mutation-fuzz of every binary-parser seam.

The r9 advisory found the one exception-contract hole of the round in
Vorbis setup parsing (unvalidated book indices → IndexError/hang on
untrusted input). This suite institutionalizes the check: each format's
witness encoder produces a valid stream, a sha256-seeded mutation
engine derives byte flips / truncations / insertions / 4-byte stomps,
and the decoder seam must raise ONLY ValueError or NotImplementedError
(or succeed) — never IndexError, KeyError, struct.error, zlib.error,
ZeroDivisionError, or an unbounded loop. Mutations are deterministic,
so a future failure reproduces exactly.

Seams covered are the ones per-row fault isolation actually calls:
decode_pixels (PNG/GIF/JPEG/WebP/TIFF dispatch), decode_avi_frames,
parse_ebml, parse_ogg + decode_ogg_flac, decode_ogg_vorbis (setup +
audio decode), decode_wav (PCM/float/G.711), decode_flac, parse_mp3,
parse_adts, parse_mp4_meta, parse_opus_packet.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

N_MUTATIONS = 150
_ALLOWED = (ValueError, NotImplementedError)


def _mutations(base: bytes, n: int, seed: int):
    for k in range(n):
        h = hashlib.sha256(f"{seed}:{k}".encode()).digest()
        pos = int.from_bytes(h[:4], "big") % max(1, len(base))
        kind = h[4] % 5
        b = bytearray(base)
        if kind == 0:
            b[pos] ^= h[5] or 1
        elif kind == 1:
            b = b[:pos]
        elif kind == 2:
            b[pos:pos] = h[5 : 5 + (h[6] % 8) + 1]
        elif kind == 3:
            b[pos : pos + 4] = h[5:9]
        else:
            # allocation bomb: stomp a huge count where a length/count
            # field might live — random flips rarely produce the
            # 0xFFFFFFFF-class values that trigger unbounded expansion
            # (the r10 MP4 stts/stsz finding)
            bomb = (b"\xff\xff\xff\xff", b"\x7f\xff\xff\xff",
                    b"\x00\xff\xff\xff")[h[5] % 3]
            b[pos : pos + 4] = bomb if h[6] & 1 else bomb[::-1]
        yield k, bytes(b)


def _assert_contract(name: str, base: bytes, parse, n: int = N_MUTATIONS):
    leaks = []
    for k, m in _mutations(base, n, seed=sum(name.encode())):
        try:
            parse(m)
        except _ALLOWED:
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append((k, type(exc).__name__, str(exc)[:80]))
    assert not leaks, f"{name}: contract leaks {leaks[:5]}"


def _img():
    return (np.arange(12 * 10 * 3).reshape(12, 10, 3) * 7 % 256).astype(
        np.uint8
    )


def test_fuzz_pixel_formats():
    from articulation_vector_db_api_spark.functions import pixels as P
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )
    from articulation_vector_db_api_spark.functions.tiff import encode_tiff
    from articulation_vector_db_api_spark.functions.vp8l import encode_vp8l

    img = _img()
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    _assert_contract("png", P.encode_png(img), P.decode_pixels)
    _assert_contract(
        "gif", P.encode_gif(img[:, :, 0].copy(), pal), P.decode_pixels
    )
    _assert_contract(
        "jpeg", encode_jpeg_baseline(img, 85), P.decode_pixels
    )
    _assert_contract(
        "tiff", encode_tiff(img, compression="lzw"), P.decode_pixels
    )
    _assert_contract("webp", encode_vp8l(img), P.decode_pixels)


def test_fuzz_avi():
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        decode_avi_frames,
        encode_dib_frame,
    )
    from articulation_vector_db_api_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    frames = [_img() for _ in range(3)]
    _assert_contract(
        "avi-dib",
        build_avi([encode_dib_frame(f) for f in frames], 10, 12, "DIB"),
        decode_avi_frames,
    )
    _assert_contract(
        "avi-mjpg",
        build_avi(
            [encode_jpeg_baseline(f, 90) for f in frames], 10, 12, "MJPG"
        ),
        decode_avi_frames,
    )


def test_fuzz_containers():
    from articulation_vector_db_api_spark.functions.ebml import (
        build_webm,
        parse_ebml,
    )
    from articulation_vector_db_api_spark.functions.isobmff import (
        parse_mp4_meta,
    )
    from articulation_vector_db_api_spark.functions.ogg import (
        build_ogg_flac,
        decode_ogg_flac,
        parse_ogg,
    )

    _assert_contract("ebml", build_webm(320, 240, 4000), parse_ebml)

    def box(t, p):
        return struct.pack(">I", len(p) + 8) + t + p

    mvhd = box(
        b"mvhd",
        bytes(12) + struct.pack(">II", 1000, 5000) + bytes(80),
    )
    tkhd = box(b"tkhd", bytes(80) + struct.pack(">II", 320 << 16, 240 << 16))
    mp4 = box(b"ftyp", b"isom" + bytes(8)) + box(
        b"moov", mvhd + box(b"trak", tkhd)
    )
    _assert_contract("mp4", mp4, parse_mp4_meta)

    sig = (np.arange(384) % 251 - 125).astype(np.int16)
    ogg = build_ogg_flac(sig, rate=16000, block_size=192)
    _assert_contract("ogg-parse", ogg, parse_ogg)
    _assert_contract("ogg-flac", ogg, decode_ogg_flac)


def test_fuzz_audio_codecs():
    from articulation_vector_db_api_spark.functions import audio as A
    from articulation_vector_db_api_spark.functions.adts import (
        build_adts,
        parse_adts,
    )
    from articulation_vector_db_api_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )
    from articulation_vector_db_api_spark.functions.mp3 import (
        build_mp3,
        parse_mp3,
    )

    sig = (np.arange(256) % 251 - 125).astype(np.int16)
    _assert_contract("wav16", A.encode_wav(sig, 16000), A.decode_wav)
    _assert_contract(
        "wav-float",
        A.encode_wav_float(sig.astype(np.float64) / 32767, 16000),
        A.decode_wav,
    )
    _assert_contract(
        "wav-g711",
        A.encode_wav_g711((sig % 256).astype(np.uint8), "ulaw", 8000),
        A.decode_wav,
    )
    _assert_contract(
        "flac", encode_flac(sig.astype(np.int32), 16000, 64), decode_flac
    )
    _assert_contract("mp3", build_mp3([(5, 0)] * 6), parse_mp3)
    _assert_contract("adts", build_adts([64] * 6), parse_adts)


def test_fuzz_vorbis_end_to_end():
    from articulation_vector_db_api_spark.functions.vorbis import (
        build_ogg_vorbis_stream,
        decode_ogg_vorbis,
        encode_vorbis,
    )

    t = np.arange(512) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 300 * t)
    stream = build_ogg_vorbis_stream(*encode_vorbis(x, 8000, 256))
    _assert_contract("vorbis", stream, decode_ogg_vorbis, n=120)


def test_fuzz_mp2_full_decode():
    from articulation_vector_db_api_spark.functions.mp2 import (
        decode_mp2,
        encode_mp2,
    )

    t = np.arange(1152 * 2) / 44100.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    _assert_contract("mp2", encode_mp2(x, 44100, 64), decode_mp2, n=120)


def test_fuzz_mpeg1_video():
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        decode_m1v,
        encode_m1v,
    )

    img = (np.arange(32 * 32 * 3).reshape(32, 32, 3) * 11 % 256).astype(
        np.uint8
    )
    stream = encode_m1v([img, img[::-1].copy()], fps_code=5, qscale=4)
    _assert_contract("m1v", stream, decode_m1v, n=120)

    # the container-wrapped seams: AVI 'MPG1' and Matroska V_MPEG1
    from articulation_vector_db_api_spark.functions.avi import (
        build_avi,
        decode_avi_frames,
    )
    from articulation_vector_db_api_spark.functions.ebml import (
        build_mkv_mjpeg,
        decode_mkv_frames,
    )
    from articulation_vector_db_api_spark.functions.mpeg1 import (
        split_m1v_frames,
        split_m1v_header,
    )

    avi = build_avi(split_m1v_frames(stream), 32, 32, "MPG1", fps_rate=30)
    _assert_contract("avi-mpg1", avi, decode_avi_frames, n=80)
    private, pics = split_m1v_header(stream)
    mkv = build_mkv_mjpeg(
        [(i * 33, p) for i, p in enumerate(pics)],
        32, 32, codec_id="V_MPEG1", codec_private=private,
    )
    _assert_contract("mkv-mpeg1", mkv, decode_mkv_frames, n=80)
    from articulation_vector_db_api_spark.functions.isobmff import (
        build_mp4_mjpeg,
        decode_mp4_frames,
    )

    mp4 = build_mp4_mjpeg(
        [(3600, p) for p in pics], 32, 32,
        codec="mp4v", decoder_config=private,
    )
    _assert_contract("mp4-mpeg1", mp4, decode_mp4_frames, n=80)


def test_fuzz_opus_packets():
    from articulation_vector_db_api_spark.functions.opus import (
        parse_opus_packet,
    )

    _assert_contract(
        "opus-c2", bytes([0b00011010, 1, 2, 3, 4]), parse_opus_packet
    )
    _assert_contract(
        "opus-c3",
        bytes([0b00011011, 0x83, 2, 1, 2, 3]) + bytes(10),
        parse_opus_packet,
    )


def test_mutation_engine_is_deterministic():
    a = [m for _, m in _mutations(b"hello world", 10, seed=3)]
    b = [m for _, m in _mutations(b"hello world", 10, seed=3)]
    assert a == b
    with pytest.raises(AssertionError):
        _assert_contract("boom", b"xx", lambda _b: (_ for _ in ()).throw(KeyError("k")), n=3)


def test_fuzz_source_containers(tmp_path):
    """The source-reader seams parse untrusted bytes too: the Avro
    object-container read path (header + block walk + row decode,
    incl. the schema JSON inside the header metadata) and the WARC
    member-range reader must keep the ValueError contract under
    mutation."""
    import json

    from articulation_vector_db_api_spark.sources import avro as AV
    from articulation_vector_db_api_spark.sources import warc as W

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "s", "type": ["null", "string"]},
                {"name": "v", "type": ["int", "double"]},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
            ],
        }
    )
    rows = [
        (i, f"s{i}" if i % 3 else None, float(i) / 2 if i % 2 else i,
         [f"t{i}", "x"])
        for i in range(40)
    ]
    apath = str(tmp_path / "f.avro")
    AV.write_container(apath, schema, rows, codec="deflate",
                       records_per_block=16)
    abase = (tmp_path / "f.avro").read_bytes()
    fz = str(tmp_path / "f.avro.fz")

    def parse_avro(b):
        with open(fz, "wb") as f:
            f.write(b)
        AV.read_header(fz)
        for off, _ln in AV.block_offsets(fz):
            list(AV.read_block(fz, off))

    _assert_contract("avro-container", abase, parse_avro)

    wpath = str(tmp_path / "f.warc.gz")
    W.write_warc(
        wpath,
        [
            ("response", f"http://x/{i}",
             b"HTTP/1.1 200 OK\r\n\r\n" + b"body" * i)
            for i in range(12)
        ],
    )
    wbase = (tmp_path / "f.warc.gz").read_bytes()
    n = len(W.read_index(wpath))
    wfz = str(tmp_path / "g.warc.gz")

    def parse_warc(b):
        with open(wfz, "wb") as f:
            f.write(b)
        list(W.read_members_range(wfz, 0, len(b), n))

    _assert_contract("warc-members", wbase, parse_warc)


def test_fuzz_text_extractors():
    """The reference-parity extraction seams (PDF O2 path, HTML main
    text) keep the contract under mutation too."""
    import glob

    from articulation_vector_db_api_spark.functions.htmltext import (
        extract_main_text,
    )
    from articulation_vector_db_api_spark.functions.pdftext import (
        extract_pdf_text,
    )

    pdfs = sorted(glob.glob("/root/reference/pdfs/*.pdf"))
    if pdfs:
        base = open(pdfs[0], "rb").read()[:40000]
        _assert_contract("pdftext", base, extract_pdf_text)
    html = (
        b"<html><head><title>t</title><style>x{}</style></head><body>"
        b"<nav>menu</nav><p>Real paragraph one with words.</p>"
        b"<p>Two <a href='u'>link</a>.</p><script>junk</script>"
        b"</body></html>"
    )
    _assert_contract(
        "htmltext", html,
        lambda b: extract_main_text(b.decode("utf-8", "replace")),
    )


def test_fuzz_r14_formats():
    """r14 parser seams keep the ValueError-only contract under
    mutation: AES-CBC decrypt, EPUB, EML/mbox, RTF, encrypted HLS
    (playlist text AND ciphertext), and the archive exploder — which
    must never raise at all (it IS the fault boundary)."""
    from articulation_vector_db_api_spark.functions.aes import (
        aes128_cbc_decrypt,
        aes128_cbc_encrypt,
    )
    from articulation_vector_db_api_spark.functions.epub import (
        build_epub,
    )
    from articulation_vector_db_api_spark.functions.hls import (
        build_hls,
        demux_hls,
    )
    from articulation_vector_db_api_spark.functions.mailtext import (
        build_eml,
        build_mbox,
        extract_eml,
        extract_mbox_text,
    )
    from articulation_vector_db_api_spark.functions.mpegts import (
        VIDEO_STREAM_0,
    )
    from articulation_vector_db_api_spark.functions.rtftext import (
        build_rtf,
        extract_rtf_text,
    )
    from articulation_vector_db_api_spark.operators.ingest import (
        _explode_one,
        _extract_one,
    )

    key = bytes(range(16))
    iv = bytes(16)
    ct = aes128_cbc_encrypt(b"payload " * 20, key, iv)
    _assert_contract(
        "aes_cbc", ct, lambda b: aes128_cbc_decrypt(b, key, iv)
    )

    epub = build_epub([["chapter one line", "two"], ["ch2"]])
    _assert_contract(
        "epub", epub,
        lambda b: _extract_one("f.epub", b),
        n=100,
    )
    # dispatch-level never raises; direct extractor keeps ValueError
    from articulation_vector_db_api_spark.functions.epub import (
        extract_epub_text,
    )

    _assert_contract("epub_direct", epub, extract_epub_text, n=100)

    eml = build_eml("subject here", "body line\nsecond line")
    _assert_contract("eml", eml, extract_eml, n=100)
    mbox = build_mbox([eml, build_eml("s2", "b2")])
    _assert_contract("mbox", mbox, extract_mbox_text, n=100)

    rtf = build_rtf(["para one", "ünïcode — two", "{braces}"])
    _assert_contract("rtf", rtf, extract_rtf_text, n=100)

    pl, files = build_hls(
        [{VIDEO_STREAM_0: bytes(range(256)) * 2}], key=key,
        byterange=True,
    )
    _assert_contract(
        "hls_playlist", pl.encode(),
        lambda b: demux_hls(b.decode("utf-8", "replace"), files),
        n=100,
    )
    _assert_contract(
        "hls_ciphertext", files["media.bin"],
        lambda b: demux_hls(pl, {**files, "media.bin": b}),
        n=100,
    )

    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        info = tarfile.TarInfo("a.txt")
        data = b"member text " * 10
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    leaks = []
    for k, m in _mutations(buf.getvalue(), 100, seed=77):
        try:
            rows = _explode_one("c.tar.gz", m)
            assert isinstance(rows, list) and rows
        except Exception as exc:  # noqa: BLE001
            leaks.append((k, type(exc).__name__, str(exc)[:60]))
    assert not leaks, f"explode_one must never raise: {leaks[:5]}"
