"""MP3 (MPEG-1/2/2.5 audio) frame-header walk — ISO/IEC 11172-3 /
13818-3 header layout (public), stdlib only.

MP3 is how crowd-sourced speech corpora actually ship (Common Voice),
so the triage layer meets it right after Ogg/Opus. Frame SYNTHESIS
(polyphase filterbank + IMDCT + Huffman spectral decode) is a
perceptual-codec undertaking that stays honestly gated; the header
walk alone yields the facts a pipeline routes on: exact duration (each
frame's sample count is fixed by version+layer), bitrate (and whether
the stream is CBR or VBR), sample rate, channel mode, and structural
validation — every frame's sync, version, layer, and sample rate must
agree with the first frame's, so a truncated or corrupt file fails
loudly instead of reporting wrong facts.

Handles the real-world envelope: a leading ID3v2 tag (syncsafe size),
a trailing ID3v1 tag (128-byte "TAG"), the Xing/Info VBR header
(frame-count field), padding bits, and the free-format bitrate gate.
"""

from __future__ import annotations

# bitrate tables in kbps, index 1..14 (0 = free format, 15 = invalid):
# (version_group, layer) -> tuple. version_group: 1 = MPEG-1,
# 2 = MPEG-2/2.5 (they share tables).
_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}

# sample-rate tables by version: index 0..2 (3 = reserved)
_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _skip_id3v2(b: bytes) -> int:
    """Returns the offset past a leading ID3v2 tag (syncsafe size),
    or 0 when none is present."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = 0
    for byte in b[6:10]:
        if byte & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe")
        size = (size << 7) | byte
    footer = 10 if b[5] & 0x10 else 0
    return 10 + size + footer


def _parse_header(b: bytes, i: int) -> dict:
    """One 4-byte frame header -> facts + frame byte length."""
    h = int.from_bytes(b[i : i + 4], "big")
    if h >> 21 != 0x7FF:
        raise ValueError("bad MP3 frame sync")
    vbits = (h >> 19) & 0x03
    if vbits == 1:
        raise ValueError("reserved MPEG version")
    version = {0: "2.5", 2: "2", 3: "1"}[vbits]
    lbits = (h >> 17) & 0x03
    if lbits == 0:
        raise ValueError("reserved MPEG layer")
    layer = 4 - lbits  # 1/2/3
    bidx = (h >> 12) & 0x0F
    if bidx == 15:
        raise ValueError("invalid MP3 bitrate index")
    if bidx == 0:
        raise NotImplementedError("free-format MP3 bitrate")
    ridx = (h >> 10) & 0x03
    if ridx == 3:
        raise ValueError("reserved MP3 sample-rate index")
    group = 1 if version == "1" else 2
    bitrate = _BITRATES[(group, layer)][bidx - 1] * 1000
    rate = _RATES[version][ridx]
    padding = (h >> 9) & 0x01
    crc = 0 if (h >> 16) & 0x01 else 2  # protection bit 0 -> 16-bit CRC
    mode = (h >> 6) & 0x03
    channels = 1 if mode == 3 else 2
    if layer == 1:
        samples = 384
        length = (12 * bitrate // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or version == "1") else 576
        per = 144 if (layer == 2 or version == "1") else 72
        length = per * bitrate // rate + padding
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "rate": rate,
        "channels": channels,
        "samples": samples,
        "length": length,
        "crc": crc,
    }


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame -> {version, layer, sample_rate, channels,
    n_frames, samples, duration_ms, bitrate_kbps (None when VBR),
    vbr, has_id3v2, has_xing}.

    Every frame's version/layer/sample-rate must match the first
    frame's (a corrupt byte that still syncs would otherwise change
    the duration math mid-stream); bitrate may vary — that IS VBR.
    A Xing/Info header in frame 0, when present, must agree with the
    walked frame count."""
    b = bytes(payload)
    i = _skip_id3v2(b)
    has_id3 = i > 0
    end = len(b)
    if end - i >= 128 and b[end - 128 : end - 125] == b"TAG":
        end -= 128  # trailing ID3v1
    if i >= end:
        raise ValueError("MP3 has no audio frames")
    first = None
    n_frames = 0
    samples = 0
    bitrates = set()
    xing_frames = None
    while i < end:
        f = _parse_header(b, i)
        if first is None:
            first = f
            # Xing/Info header sits after the side info of frame 0
            side = (
                (17 if f["channels"] == 1 else 32)
                if f["version"] == "1"
                else (9 if f["channels"] == 1 else 17)
            )
            # CRC-protected frames carry 2 CRC bytes before the side
            # info; bound every read to frame 0's own length so a
            # short first frame can't alias bytes from frame 1.
            off = i + 4 + f["crc"] + side
            if off + 8 <= i + f["length"]:
                tag = b[off : off + 4]
                if tag in (b"Xing", b"Info"):
                    flags = int.from_bytes(b[off + 4 : off + 8], "big")
                    if flags & 0x01 and off + 12 <= i + f["length"]:
                        xing_frames = int.from_bytes(
                            b[off + 8 : off + 12], "big"
                        )
        elif (f["version"], f["layer"], f["rate"]) != (
            first["version"],
            first["layer"],
            first["rate"],
        ):
            raise ValueError("MP3 frame parameters change mid-stream")
        if i + f["length"] > end:
            raise ValueError("truncated MP3 frame")
        bitrates.add(f["bitrate"])
        n_frames += 1
        samples += f["samples"]
        i += f["length"]
    vbr = len(bitrates) > 1
    if xing_frames is not None and xing_frames != n_frames:
        raise ValueError("Xing frame count disagrees with the stream")
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "samples": samples,
        "duration_ms": (samples * 1000 + first["rate"] // 2)
        // first["rate"],
        "bitrate_kbps": None if vbr else first["bitrate"] // 1000,
        "vbr": vbr,
        "has_id3v2": has_id3,
        "has_xing": xing_frames is not None,
    }


def build_mp3(
    frames: list[tuple[int, int]],
    version: str = "1",
    layer: int = 3,
    rate_idx: int = 0,
    mono: bool = True,
    id3v2_bytes: int = 0,
    xing: bool = False,
    id3v1: bool = False,
    crc: bool = False,
) -> bytes:
    """Spec-conformant MP3 frame stream as the parser's roundtrip
    witness: ``frames`` is [(bitrate_index 1-14, padding 0/1), ...];
    payloads are deterministic filler at each header's computed frame
    length. Optional leading ID3v2 (syncsafe size), Xing frame-count
    header in frame 0, trailing ID3v1."""
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
             size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + b"\x00" * size
    for k, (bidx, padding) in enumerate(frames):
        h = (
            (0x7FF << 21)
            | (vbits << 19)
            | ((4 - layer) << 17)
            | ((0 if crc else 1) << 16)  # protection bit
            | (bidx << 12)
            | (rate_idx << 10)
            | (padding << 9)
            | ((3 if mono else 0) << 6)
        )
        hdr = h.to_bytes(4, "big")
        f = _parse_header(hdr, 0)
        body = bytearray(b"\x00" * (f["length"] - 4))
        if k == 0 and xing:
            side = f["crc"] + (
                (17 if f["channels"] == 1 else 32)
                if version == "1"
                else (9 if f["channels"] == 1 else 17)
            )
            if side + 12 > len(body):
                raise ValueError(
                    "frame 0 too small for a Xing header — use a "
                    "higher bitrate index"
                )
            body[side : side + 4] = b"Xing"
            body[side + 4 : side + 8] = (1).to_bytes(4, "big")
            body[side + 8 : side + 12] = len(frames).to_bytes(4, "big")
        out += hdr + body
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)
