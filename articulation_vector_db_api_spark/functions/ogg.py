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
    """Yield (header_type, granule, serial, payload) per page, with
    structural + CRC verification."""
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
        yield htype, granule, serial, b[pos + 27 + nsegs : pos + page_len]
        pos += page_len


def parse_ogg(payload: bytes) -> dict:
    """Walk an Ogg stream → {codec, channels, sample_rate,
    duration_ms, n_pages}. Duration comes from the final page's
    granule position: Opus granules are 48 kHz minus pre-skip
    (RFC 7845 §4/§5.1); Vorbis granules are sample counts at the
    declared rate."""
    b = bytes(payload)
    first = None
    last_granule = None
    n_pages = 0
    saw_eos = False
    for htype, granule, _serial, body in _pages(b):
        n_pages += 1
        if first is None:
            if not htype & 0x02:
                raise ValueError("first Ogg page is not BOS")
            first = body
        if granule >= 0:
            last_granule = granule
        if htype & 0x04:
            saw_eos = True
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
    raise NotImplementedError("unrecognized Ogg codec (Opus/Vorbis only)")


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
