"""Ogg container walk (RFC 3533) with Opus (RFC 7845) and Vorbis
(Xiph.org spec) identification headers — stdlib only.

The metadata-walk counterpart of functions/isobmff.py for the audio
world: Ogg is how Opus/Vorbis speech and music corpora arrive, and a
curation pipeline needs codec / channels / sample-rate / duration
BEFORE committing to a (gated) perceptual decode. Pages are
structurally verified — capture pattern, version, lacing, and the Ogg
CRC-32 (polynomial 0x04C11DB7, unreflected, init 0, crc field zeroed)
— so a truncated or corrupt stream raises ValueError instead of
returning wrong facts. The audio payload itself is never decoded
(Opus/Vorbis are perceptual codecs, honestly gated like MP3/AAC).

The encoder builds spec-conformant streams (real CRCs, BOS/EOS flags,
granule positions) as test vectors, the encode_png/encode_tiff role.
"""

from __future__ import annotations

import struct


def _crc_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 24
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if crc & 0x80000000
                else (crc << 1) & 0xFFFFFFFF
            )
        table.append(crc)
    return table


_OGG_CRC_TABLE = _crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ byte]
    return crc


def _pages(b: bytes):
    """Yield (header_type, granule, serial, payload, lacing) per page,
    with structural + CRC verification."""
    pos = 0
    while pos < len(b):
        if b[pos : pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if pos + 27 > len(b):
            raise ValueError("truncated Ogg page header")
        version, htype = b[pos + 4], b[pos + 5]
        if version != 0:
            raise ValueError(f"unknown Ogg version {version}")
        granule, serial, _seq, crc, nsegs = struct.unpack_from(
            "<qIIIB", b, pos + 6
        )
        lacing = b[pos + 27 : pos + 27 + nsegs]
        if len(lacing) != nsegs:
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(lacing)
        page_len = 27 + nsegs + body_len
        page = bytearray(b[pos : pos + page_len])
        if len(page) != page_len:
            raise ValueError("truncated Ogg page body")
        page[22:26] = b"\x00" * 4
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        yield (
            htype,
            granule,
            serial,
            b[pos + 27 + nsegs : pos + page_len],
            lacing,
        )
        pos += page_len


def ogg_packets(b: bytes):
    """Page→packet reassembly (RFC 3533 §5): a lacing value of 255
    continues the current packet — possibly onto the next page, whose
    header must then carry the continuation flag — and a value < 255
    ends it. Yields (packet_bytes, granule, serial) where granule is
    the granule position of the page the packet ENDS on (-1 when no
    packet ends on a page, per spec). This is the layer any Ogg
    payload codec drops in behind: per-packet decode with per-packet
    fault isolation.

    Single-logical-stream walk: follows the serial of the FIRST page.
    A foreign-serial page before that stream's EOS means grouped
    (concurrently multiplexed) streams — NotImplementedError, that
    needs a demuxer. Pages after the EOS (chained stream links) are
    not walked; a chain's later links are separate documents."""
    cur = bytearray()
    open_packet = False
    target = None
    for htype, granule, serial, payload, lacing in _pages(b):
        if target is None:
            target = serial
        if serial != target:
            raise NotImplementedError(
                "grouped (multiplexed) Ogg streams need a demuxer"
            )
        if bool(htype & 0x01) != open_packet:
            raise ValueError(
                "Ogg continuation flag inconsistent with lacing"
            )
        pos = 0
        for v in lacing:
            cur += payload[pos : pos + v]
            pos += v
            if v < 255:
                yield bytes(cur), granule, serial
                cur = bytearray()
                open_packet = False
            else:
                open_packet = True
        if htype & 0x04:  # target stream EOS: chained links follow
            if open_packet:
                # the EOS page's own lacing is already consumed, so a
                # still-open packet here can never be completed
                raise ValueError("Ogg stream ends mid-packet")
            return
    if open_packet:
        raise ValueError("Ogg stream ends mid-packet")


def _flac_streaminfo_facts(si: bytes) -> tuple[int, int, int]:
    """STREAMINFO body -> (sample_rate, channels, total_samples)."""
    if len(si) != 34:
        raise ValueError("bad Ogg-FLAC STREAMINFO size")
    rate = si[10] << 12 | si[11] << 4 | si[12] >> 4
    channels = ((si[12] >> 1) & 0x07) + 1
    total = (si[13] & 0x0F) << 32 | int.from_bytes(si[14:18], "big")
    if rate == 0:
        raise ValueError("Ogg-FLAC STREAMINFO sample rate 0")
    return rate, channels, total


def parse_ogg(payload: bytes) -> dict:
    """Walk an Ogg stream → {codec, channels, sample_rate,
    duration_ms, n_pages}. Duration comes from the final page's
    granule position: Opus granules are 48 kHz minus pre-skip
    (RFC 7845 §4/§5.1); Vorbis and FLAC granules are sample counts at
    the declared rate (Ogg-FLAC mapping 1.0 §6).

    Probes the FIRST logical bitstream: a foreign-serial page before
    its EOS means grouped multiplexing (NotImplementedError — mixing
    streams' granules would report wrong facts); a CHAINED stream's
    later links are separate documents and are not walked, so n_pages
    and duration describe link 1."""
    b = bytes(payload)
    first = None
    target = None
    last_granule = None
    n_pages = 0
    saw_eos = False
    for htype, granule, serial, body, _lacing in _pages(b):
        if first is None:
            if not htype & 0x02:
                raise ValueError("first Ogg page is not BOS")
            first = body
            target = serial
        elif serial != target:
            raise NotImplementedError(
                "grouped (multiplexed) Ogg streams need a demuxer"
            )
        n_pages += 1
        if granule >= 0:
            last_granule = granule
        if htype & 0x04:
            saw_eos = True
            break  # chained links beyond the first are not this probe
    if first is None:
        raise ValueError("empty Ogg stream")
    if not saw_eos:
        raise ValueError("Ogg stream has no EOS page")
    if first[:8] == b"OpusHead":
        if first[8] >> 4 != 0:  # major version per RFC 7845 §5.1
            raise ValueError("unknown OpusHead version")
        channels = first[9]
        (pre_skip,) = struct.unpack_from("<H", first, 10)
        (input_rate,) = struct.unpack_from("<I", first, 12)
        samples = max(0, (last_granule or 0) - pre_skip)
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": input_rate,
            # Granules are 48 kHz; RFC 6716 frames (e.g. 2.5 ms = 120
            # samples) legally end off ms boundaries, so round rather
            # than reject.
            "duration_ms": (samples + 24) // 48,
            "n_pages": n_pages,
        }
    if first[:7] == b"\x01vorbis":
        (version,) = struct.unpack_from("<I", first, 7)
        if version != 0:
            raise ValueError("unknown Vorbis version")
        channels = first[11]
        (rate,) = struct.unpack_from("<I", first, 12)
        if rate == 0:
            raise ValueError("Vorbis rate 0")
        samples = last_granule or 0
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            # Vorbis streams routinely end off ms boundaries (any
            # sample count is legal) — round, never reject.
            "duration_ms": (samples * 1000 + rate // 2) // rate,
            "n_pages": n_pages,
        }
    if first[:5] == b"\x7fFLAC":
        if first[5] != 1:
            raise NotImplementedError(
                f"Ogg-FLAC mapping major version {first[5]}"
            )
        if first[9:13] != b"fLaC":
            raise ValueError("Ogg-FLAC header packet missing fLaC magic")
        rate, channels, total = _flac_streaminfo_facts(first[17:51])
        samples = total or max(0, last_granule or 0)
        return {
            "codec": "flac",
            "channels": channels,
            "sample_rate": rate,
            "duration_ms": (samples * 1000 + rate // 2) // rate,
            "n_pages": n_pages,
        }
    raise NotImplementedError("unrecognized Ogg codec (Opus/Vorbis/FLAC)")


def decode_ogg_flac(payload: bytes) -> tuple:
    """Ogg-FLAC full decode → (sample_rate, int array (n, ch)).

    The Ogg mapping (Xiph Ogg-FLAC mapping 1.0) wraps a native FLAC
    stream: the first packet is ``0x7F "FLAC" major minor nheaders``
    followed by the native ``fLaC`` magic + STREAMINFO block, any
    further header packets are native metadata blocks verbatim, and
    every audio packet is exactly one native FLAC frame. So decode =
    reassemble packets (ogg_packets — the CRC-checked, continuation-
    aware layer) and hand the concatenation to decode_flac, which
    re-verifies every frame CRC and the stream MD5. All the whole-byte
    depths decode_flac handles (8/16/24/32-bit) work through here."""
    from .flac import decode_flac

    packets = ogg_packets(bytes(payload))
    head = next(packets, None)
    if head is None:
        raise ValueError("empty Ogg stream")
    p0 = head[0]
    if p0[:5] != b"\x7fFLAC":
        raise ValueError("not an Ogg-FLAC stream")
    if p0[5] != 1:
        raise NotImplementedError(f"Ogg-FLAC mapping major version {p0[5]}")
    if p0[9:13] != b"fLaC":
        raise ValueError("Ogg-FLAC header packet missing fLaC magic")
    native = bytearray(p0[9:])
    for packet, _granule, _serial in packets:
        native += packet
    return decode_flac(bytes(native))


def decode_ogg_audio(payload: bytes) -> tuple:
    """Codec-dispatched Ogg audio decode → (codec, sample_rate,
    samples[(n, ch)]). The one entry point a pipeline calls after
    triage: FLAC payloads return lossless integer samples
    (decode_ogg_flac), Vorbis payloads return perceptual float64 in
    [-1, 1) (functions/vorbis.py — the r9 decoder), and still-gated
    codecs (Opus, Speex, Theora) raise NotImplementedError with the
    codec name so routing stays honest."""
    packets = ogg_packets(bytes(payload))
    head = next(packets, None)
    if head is None:
        raise ValueError("empty Ogg stream")
    first = head[0]
    if first[:5] == b"\x7fFLAC":
        rate, samples = decode_ogg_flac(payload)
        return "flac", rate, samples
    if first[:7] == b"\x01vorbis":
        from .vorbis import decode_ogg_vorbis

        rate, _ch, pcm = decode_ogg_vorbis(bytes(payload))
        return "vorbis", rate, pcm.T
    if first[:8] == b"OpusHead":
        raise NotImplementedError(
            "Opus payload decode (CELT/SILK synthesis) is gated"
        )
    raise NotImplementedError(
        f"Ogg payload codec {first[:8]!r} has no decoder"
    )


def _page(
    body: bytes, granule: int, serial: int, seq: int, htype: int
) -> bytes:
    lacing = bytearray()
    n = len(body)
    while n >= 255:
        lacing.append(255)
        n -= 255
    lacing.append(n)  # final short (possibly 0) segment ends the packet
    head = (
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<qIII", granule, serial, seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    crc = _ogg_crc(head + body)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body


def _page_packets(
    packets: list[bytes], granule: int, serial: int, seq: int, htype: int
) -> bytes:
    """A page carrying several COMPLETE packets (lacing runs
    concatenated) — the layout real Vorbis files use for the
    comment+setup header page."""
    lacing = bytearray()
    body = bytearray()
    for pk in packets:
        n = len(pk)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += pk
    if len(lacing) > 255:
        raise ValueError("page lacing overflow (split packets across pages)")
    head = (
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<qIII", granule, serial, seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    crc = _ogg_crc(head + bytes(body))
    return head[:22] + struct.pack("<I", crc) + head[26:] + bytes(body)


def build_ogg_opus(
    channels: int,
    duration_ms: int,
    pre_skip: int = 312,
    input_rate: int = 48000,
    serial: int = 1,
) -> bytes:
    """Minimal spec-conformant Ogg-Opus stream: OpusHead (BOS),
    OpusTags, one (opaque) audio page carrying the EOS granule."""
    head = (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<HIhB", pre_skip, input_rate, 0, 0)
    )
    tags = b"OpusTags" + struct.pack("<I", 6) + b"engine" + struct.pack("<I", 0)
    granule = pre_skip + duration_ms * 48
    return (
        _page(head, 0, serial, 0, 0x02)
        + _page(tags, 0, serial, 1, 0x00)
        + _page(b"\xfc" * 20, granule, serial, 2, 0x04)
    )


def _page_open(body255: bytes, serial: int, seq: int, htype: int = 0) -> bytes:
    """A page whose single lacing value is 255, leaving the packet
    OPEN for the next (continuation-flagged) page; granule is -1
    because no packet ends here (RFC 3533 §6)."""
    if len(body255) != 255:
        raise ValueError("open page body must be exactly 255 bytes")
    head = (
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<qIII", -1, serial, seq, 0)
        + bytes([1, 255])
    )
    crc = _ogg_crc(head + body255)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body255


def build_ogg_flac(
    samples,
    rate: int = 16000,
    block_size: int = 256,
    serial: int = 3,
    span_pages: bool = False,
) -> bytes:
    """Spec-conformant Ogg-FLAC stream (Xiph Ogg-FLAC mapping 1.0):
    header packet = ``0x7F "FLAC" 1 0 nheaders=0`` + native fLaC magic
    + STREAMINFO (BOS page), then ONE audio packet per FLAC frame,
    page granules carrying the cumulative sample count, EOS on the
    last page. ``span_pages=True`` splits the first audio packet
    across two pages (all-255 lacing + continuation flag) to exercise
    the reassembly path real muxers hit on large frames."""
    from .flac import encode_flac_parts

    header, frames, counts = encode_flac_parts(
        samples, rate=rate, block_size=block_size
    )
    first = b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 0) + header
    pages = [_page(first, 0, serial, 0, 0x02)]
    seq = 1
    got = 0
    for i, (frame, cnt) in enumerate(zip(frames, counts)):
        got += cnt
        eos = 0x04 if i == len(frames) - 1 else 0x00
        if span_pages and i == 0 and len(frame) > 255:
            pages.append(_page_open(frame[:255], serial, seq))
            pages.append(_page(frame[255:], got, serial, seq + 1, 0x01 | eos))
            seq += 2
        else:
            pages.append(_page(frame, got, serial, seq, eos))
            seq += 1
    return b"".join(pages)


def build_ogg_opus_packets(
    packets: list[bytes],
    channels: int = 1,
    pre_skip: int = 0,
    input_rate: int = 48000,
    serial: int = 4,
) -> bytes:
    """Ogg-Opus stream carrying REAL audio packets (one per page, per
    RFC 7845 §3 one-packet-per-frame normal form): OpusHead (BOS),
    OpusTags, then each packet on its own page with the granule
    accumulating the TOC-derived sample count — the test-vector
    generator for the RFC 6716 packet-layer parser."""
    from .opus import parse_opus_packet

    head = (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<HIhB", pre_skip, input_rate, 0, 0)
    )
    tags = b"OpusTags" + struct.pack("<I", 6) + b"engine" + struct.pack("<I", 0)
    pages = [
        _page(head, 0, serial, 0, 0x02),
        _page(tags, 0, serial, 1, 0x00),
    ]
    granule = pre_skip
    for k, packet in enumerate(packets):
        granule += parse_opus_packet(packet).samples48
        eos = 0x04 if k == len(packets) - 1 else 0x00
        pages.append(_page(packet, granule, serial, 2 + k, eos))
    return b"".join(pages)


def build_ogg_vorbis(
    channels: int, rate: int, duration_ms: int, serial: int = 2
) -> bytes:
    """Minimal Ogg-Vorbis stream: identification header (BOS) + one
    opaque audio page carrying the EOS granule."""
    ident = (
        b"\x01vorbis"
        + struct.pack("<IB I i i i", 0, channels, rate, 0, 0, 0)
        + bytes([0xB8, 0x01])  # blocksizes + framing bit
    )
    granule = duration_ms * rate // 1000
    return (
        _page(ident, 0, serial, 0, 0x02)
        + _page(b"\x00" * 16, granule, serial, 1, 0x04)
    )
