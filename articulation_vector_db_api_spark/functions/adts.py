"""AAC ADTS frame-header walk — ISO/IEC 13818-7 §6.2 (public),
stdlib only.

ADTS is the streamable AAC envelope podcast and broadcast corpora
arrive in. AAC SYNTHESIS (filterbank + Huffman spectral decode) stays
honestly gated like MP3/Opus/Vorbis; the header walk yields the
routing facts: exact duration (1024 samples per AAC frame, times the
header's raw-data-block count), sample rate and channel configuration,
profile, and structural validation — every frame carries an explicit
byte length, so truncation and mid-stream parameter changes fail
loudly rather than skewing duration math.
"""

from __future__ import annotations

# samplingFrequencyIndex -> Hz (ISO 14496-3 Table 1.18; 13..14
# reserved, 15 = explicit/forbidden in ADTS)
_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)

_PROFILES = ("Main", "LC", "SSR", "LTP")


def parse_adts(payload: bytes) -> dict:
    """Walk every ADTS frame -> {profile, sample_rate, channels,
    n_frames, samples, duration_ms, protected}.

    Each header: 12-bit sync, MPEG id, profile, sampling index,
    channel configuration, 13-bit frame length (header + optional CRC
    + raw data blocks), and the number_of_raw_data_blocks field (each
    block is 1024 samples). Version/profile/rate/channels must match
    frame 0's."""
    b = bytes(payload)
    if len(b) < 7:
        raise ValueError("ADTS stream shorter than one header")
    i = 0
    first = None
    protected = False
    n_frames = 0
    blocks = 0
    while i < len(b):
        if i + 7 > len(b):
            raise ValueError("truncated ADTS header")
        h = int.from_bytes(b[i : i + 7], "big")  # 56 header bits
        if h >> 44 != 0xFFF:
            raise ValueError("bad ADTS frame sync")
        if (h >> 41) & 0x03 != 0:
            # ISO 13818-7: layer must be '00'. MPEG-1 audio frames
            # share the 12-bit sync, so without this check an MP3
            # stream can be misparsed as ADTS with garbage facts.
            raise ValueError("ADTS layer field must be 0")
        crc_absent = (h >> 40) & 0x01
        profile = (h >> 38) & 0x03
        ridx = (h >> 34) & 0x0F
        if ridx >= len(_ADTS_RATES):
            raise ValueError(f"reserved ADTS sampling index {ridx}")
        channels = (h >> 30) & 0x07
        if channels == 0:
            raise NotImplementedError(
                "ADTS channel config 0 (PCE-defined) needs the payload"
            )
        length = (h >> 13) & 0x1FFF
        rdb = (h & 0x03) + 1  # number_of_raw_data_blocks_in_frame + 1
        min_len = 7 + (0 if crc_absent else 2)
        if length < min_len:
            raise ValueError("ADTS frame length smaller than its header")
        if i + length > len(b):
            raise ValueError("truncated ADTS frame")
        facts = (profile, ridx, channels)
        if first is None:
            first = facts
            protected = not crc_absent
        elif facts != first:
            raise ValueError("ADTS frame parameters change mid-stream")
        n_frames += 1
        blocks += rdb
        i += length
    rate = _ADTS_RATES[first[1]]
    samples = 1024 * blocks
    return {
        "profile": _PROFILES[first[0]],
        "sample_rate": rate,
        "channels": first[2],
        "n_frames": n_frames,
        "samples": samples,
        "duration_ms": (samples * 1000 + rate // 2) // rate,
        "protected": protected,
    }


def build_adts(
    frames: list[int],
    profile: int = 1,
    rate_idx: int = 8,
    channels: int = 1,
    rdb: int = 1,
) -> bytes:
    """ADTS stream witness: ``frames`` is a list of raw-data byte
    lengths; each frame gets a spec-conformant 7-byte header (CRC
    absent) with the explicit total length and raw-data-block count."""
    if not 1 <= rdb <= 4:
        raise ValueError("raw data blocks per frame must be 1..4")
    out = bytearray()
    for nbytes in frames:
        length = 7 + nbytes
        h = (
            (0xFFF << 44)
            | (0 << 43)  # MPEG-4 id
            | (0 << 41)  # layer 00
            | (1 << 40)  # protection_absent
            | ((profile & 0x03) << 38)
            | ((rate_idx & 0x0F) << 34)
            | (0 << 33)  # private
            | ((channels & 0x07) << 30)
            | (0 << 28)  # orig/home
            | (0 << 26)  # copyright bits
            | ((length & 0x1FFF) << 13)
            | (0x7FF << 2)  # buffer fullness: VBR sentinel
            | (rdb - 1)
        )
        out += h.to_bytes(7, "big") + bytes(nbytes)
    return bytes(out)
