"""MPEG-1 SYSTEM stream (ISO/IEC 11172-1, public spec) — the ``.mpg``
program-stream container: witness muxer + demuxer, stdlib only.

This is the capstone over the round's elementary-stream decoders: a
real archival ``.mpg`` file is a SYSTEM stream — packs (with a 33-bit
system clock reference), an optional system header, and packets of
stream 0xE0-0xEF (video) / 0xC0-0xDF (MPEG audio) whose payloads
concatenate back into the elementary streams functions/mpeg1.py
(I/P/B/D video) and functions/mp2.py (Layer I/II audio) decode.

Layout facts implemented (all from the public spec):
- pack header (§2.4.3.2): '0010' + SCR[32:30] + marker + SCR[29:15] +
  marker + SCR[14:0] + marker + marker + mux_rate(22) + marker —
  8 bytes after the 0x000001BA start code;
- system header (§2.4.3.2): 16-bit length, rate/audio/video bounds,
  then (stream_id, '11', STD_buffer_bound_scale, STD_buffer_size_bound)
  triples;
- packet (§2.4.3.3): 16-bit packet_length, any number of 0xFF
  stuffing bytes, optional '01'+STD buffer field, then '0010'+PTS /
  '0011'+PTS+DTS / 0x0F (no timestamp), then payload. Timestamps are
  33-bit 90 kHz values in the marker-interleaved 5-byte layout;
- packet payloads are bounded by packet_length alone — start-code
  emulation inside payloads is legal in the system layer, so the
  demuxer must never scan for start codes inside a packet (this is
  the classic .mpg-demux bug; test-pinned).

The demuxer is strict (ValueError on any malformed marker/length —
per-row fault isolation catches it); the witness muxer interleaves
round-robin with PTS on each stream's first packet of every pack.

r12: the 13818-1 MPEG-2 PROGRAM stream (the DVD-era .vob/.mpg
layout) muxes and demuxes alongside: '01'-marked pack headers with
SCR base+extension and pack stuffing, '10'-marked PES headers with
PTS_DTS_flags and PES_header_data_length-bounded optional fields.
The demuxer detects the version per pack (mixing versions raises)
and reports it as ``mpeg_version``.

Reference behavior parity: the reference (/root/reference/main.py) is
PDF-only; system-stream demux is engine frontier surface for
video-corpus curation (every classic ``.mpg`` is a program stream).
"""

from __future__ import annotations

PACK_START = b"\x00\x00\x01\xba"
SYSTEM_START = b"\x00\x00\x01\xbb"
END_CODE = b"\x00\x00\x01\xb9"
VIDEO_STREAM_0 = 0xE0
AUDIO_STREAM_0 = 0xC0
_CLOCK = 90_000  # 90 kHz system clock


def _ts_bytes(prefix: int, ts: int) -> bytes:
    """33-bit timestamp in the spec's marker-interleaved 5 bytes:
    prefix(4) ts[32:30] 1 ts[29:15] 1 ts[14:0] 1."""
    if not 0 <= ts < (1 << 33):
        raise ValueError("MPEG-PS timestamp out of 33-bit range")
    b0 = (prefix << 4) | (((ts >> 30) & 0x7) << 1) | 1
    b12 = (((ts >> 15) & 0x7FFF) << 1) | 1
    b34 = ((ts & 0x7FFF) << 1) | 1
    return bytes([b0, b12 >> 8, b12 & 0xFF, b34 >> 8, b34 & 0xFF])


def _read_ts(b: bytes, at: int, prefix: int) -> int:
    if at + 5 > len(b):
        raise ValueError("truncated MPEG-PS timestamp")
    b0, b1, b2, b3, b4 = b[at : at + 5]
    if b0 >> 4 != prefix:
        raise ValueError("bad MPEG-PS timestamp prefix")
    if not (b0 & 1 and b2 & 1 and b4 & 1):
        raise ValueError("MPEG-PS timestamp marker bit missing")
    return (
        (((b0 >> 1) & 0x7) << 30)
        | (((b1 << 8 | b2) >> 1) << 15)
        | ((b3 << 8 | b4) >> 1)
    )


def _pack_header(scr: int, mux_rate: int) -> bytes:
    """12-byte pack: start code + '0010'-prefixed SCR + 22-bit
    mux_rate (in 50 B/s units), all marker bits set."""
    if not 1 <= mux_rate < (1 << 22):
        raise ValueError("MPEG-PS mux_rate out of range")
    body = _ts_bytes(0b0010, scr)
    return PACK_START + body + bytes(
        [0x80 | (mux_rate >> 15), (mux_rate >> 7) & 0xFF,
         ((mux_rate & 0x7F) << 1) | 1]
    )


def _system_header(stream_ids: list[int], mux_rate: int) -> bytes:
    audio_bound = sum(1 for s in stream_ids if 0xC0 <= s <= 0xDF)
    video_bound = sum(1 for s in stream_ids if 0xE0 <= s <= 0xEF)
    body = bytearray()
    body.append(0x80 | (mux_rate >> 15))
    body.append((mux_rate >> 7) & 0xFF)
    body.append(((mux_rate & 0x7F) << 1) | 1)
    body.append((audio_bound << 2) | 0b01)  # fixed=0, CSPS=1
    body.append(0x20 | video_bound)  # locks=0, marker, video_bound(5)
    body.append(0xFF)  # reserved
    for sid in sorted(stream_ids):
        scale = 1 if sid >= 0xE0 else 0
        size = 40 if sid >= 0xE0 else 4  # ×1024 / ×128 bytes
        body += bytes(
            [sid, 0xC0 | (scale << 5) | (size >> 8), size & 0xFF]
        )
    return SYSTEM_START + len(body).to_bytes(2, "big") + bytes(body)


def build_mpeg_ps(
    streams: dict[int, bytes],
    packet_size: int = 2048,
    mux_rate: int = 3528,
    pts_step: int = 3600,
) -> bytes:
    """Witness program-stream muxer: {stream_id: elementary_stream} ->
    a .mpg byte string. Packets interleave round-robin (one per live
    stream per pack); each stream's first packet in a pack carries a
    PTS that advances ``pts_step`` (90 kHz units) per pack."""
    if not streams:
        raise ValueError("MPEG-PS needs at least one stream")
    for sid in streams:
        if not (0xC0 <= sid <= 0xDF or 0xE0 <= sid <= 0xEF):
            raise ValueError(f"unsupported MPEG-PS stream id {sid:#x}")
    cursors = {sid: 0 for sid in streams}
    out = bytearray()
    pack_no = 0
    first = True
    while any(cursors[s] < len(streams[s]) for s in streams):
        # 13818-1/11172-1 timestamps are mod-2^33 COUNTERS: long
        # content wraps at ~26.5 h (and at ~4.7 GB of ES with the
        # default packet/step sizes) — wrap, don't crash (r13)
        scr = (pack_no * pts_step) & ((1 << 33) - 1)
        out += _pack_header(scr, mux_rate)
        if first:
            out += _system_header(sorted(streams), mux_rate)
            first = False
        for sid in sorted(streams):
            at = cursors[sid]
            es = streams[sid]
            if at >= len(es):
                continue
            chunk = es[at : at + packet_size]
            cursors[sid] = at + len(chunk)
            pts = _ts_bytes(0b0010, (scr + pts_step) & ((1 << 33) - 1))
            payload_len = len(pts) + len(chunk)
            out += b"\x00\x00\x01" + bytes([sid])
            out += payload_len.to_bytes(2, "big")
            out += pts + chunk
        pack_no += 1
    out += END_CODE
    return bytes(out)


def _pack_header2(scr_base: int, scr_ext: int, mux_rate: int) -> bytes:
    """13818-1 §2.4.3.3 pack header: '01' + SCR base(33)/ext(9) with
    markers + program_mux_rate(22) + '11' + reserved + zero
    stuffing_length — 10 bytes after the start code."""
    if not 0 <= scr_base < (1 << 33) or not 0 <= scr_ext < 300:
        raise ValueError("MPEG-2 PS SCR out of range")
    v = 0

    def put(val: int, bits: int) -> None:
        nonlocal v
        v = (v << bits) | (val & ((1 << bits) - 1))

    put(0b01, 2)
    put(scr_base >> 30, 3)
    put(1, 1)
    put((scr_base >> 15) & 0x7FFF, 15)
    put(1, 1)
    put(scr_base & 0x7FFF, 15)
    put(1, 1)
    put(scr_ext, 9)
    put(1, 1)
    put(mux_rate, 22)
    put(0b11, 2)
    put(0b11111, 5)
    put(0, 3)  # pack_stuffing_length
    return PACK_START + v.to_bytes(10, "big")


def _pes_packet2(sid: int, payload: bytes, pts: int | None) -> bytes:
    """13818-1 §2.4.3.6 PES packet: '10' flags byte, PTS_DTS_flags,
    PES_header_data_length, optional PTS."""
    header = bytes([0b10000000])  # '10', no scrambling/priority/...
    if pts is None:
        header += bytes([0x00, 0x00])
    else:
        header += bytes([0b10000000, 5]) + _ts_bytes(0b0010, pts)
    body = header + payload
    return (
        b"\x00\x00\x01" + bytes([sid])
        + len(body).to_bytes(2, "big") + body
    )


def build_mpeg2_ps(
    streams: dict[int, bytes],
    packet_size: int = 2048,
    mux_rate: int = 3528,
    pts_step: int = 3600,
) -> bytes:
    """Witness MPEG-2 PROGRAM stream muxer (13818-1 — the .vob/.mpg
    layout of the DVD era): same round-robin interleave as
    build_mpeg_ps but with the '01'-marked pack header (SCR base+ext)
    and '10'-marked PES packet headers."""
    if not streams:
        raise ValueError("MPEG-PS needs at least one stream")
    for sid in streams:
        if not (0xC0 <= sid <= 0xDF or 0xE0 <= sid <= 0xEF):
            raise ValueError(f"unsupported MPEG-PS stream id {sid:#x}")
    cursors = {sid: 0 for sid in streams}
    out = bytearray()
    pack_no = 0
    first = True
    while any(cursors[s] < len(streams[s]) for s in streams):
        scr = (pack_no * pts_step) & ((1 << 33) - 1)  # mod-2^33 counter
        out += _pack_header2(scr, 0, mux_rate)
        if first:
            out += _system_header(sorted(streams), mux_rate)
            first = False
        for sid in sorted(streams):
            at = cursors[sid]
            es = streams[sid]
            if at >= len(es):
                continue
            chunk = es[at : at + packet_size]
            cursors[sid] = at + len(chunk)
            out += _pes_packet2(
                sid, chunk, (scr + pts_step) & ((1 << 33) - 1)
            )
        pack_no += 1
    out += END_CODE
    return bytes(out)


def parse_mpeg_ps(b: bytes) -> dict:
    """Strict walk -> {n_packs, mux_rate, scr_first, scr_last,
    streams: {id: {n_packets, n_bytes, pts: [..]}}} without keeping
    payloads (metadata-only pass)."""
    meta = demux_mpeg_ps(b, keep_payload=False)
    return meta


def demux_mpeg_ps(
    b: bytes, keep_payload: bool = True
) -> dict:
    """Demultiplex a program stream. -> {n_packs, mux_rate, scr_first,
    scr_last, streams: {stream_id: {n_packets, n_bytes, pts: [...],
    data: bytes (when keep_payload)}}}.

    Packet payloads are consumed by LENGTH, never by start-code scan —
    elementary-stream bytes may legally contain 0x000001 sequences."""
    data = bytes(b)
    if len(data) < 12 or not data.startswith(PACK_START):
        raise ValueError("not an MPEG-1 program stream (no pack header)")
    pos = 0
    n_packs = 0
    version = None
    mux_rate = None
    scr_first = scr_last = None
    streams: dict[int, dict] = {}
    while pos < len(data):
        if data[pos : pos + 3] != b"\x00\x00\x01":
            raise ValueError("MPEG-PS start code expected")
        code = data[pos + 3]
        pos += 4
        if code == 0xBA:
            if pos >= len(data):
                raise ValueError("truncated MPEG-PS pack header")
            this_ver = 2 if data[pos] >> 6 == 0b01 else 1
            if version is None:
                version = this_ver
            elif version != this_ver:
                raise ValueError("MPEG-PS pack-header version changes")
            if this_ver == 1:
                scr = _read_ts(data, pos, 0b0010)
                if pos + 8 > len(data):
                    raise ValueError("truncated MPEG-PS pack header")
                r0, r1, r2 = data[pos + 5 : pos + 8]
                if not (r0 & 0x80) or not (r2 & 1):
                    raise ValueError("MPEG-PS mux_rate marker missing")
                rate = ((r0 & 0x7F) << 15) | (r1 << 7) | (r2 >> 1)
                pos += 8
            else:
                # 13818-1: '01' + SCR base/ext with markers (6 bytes),
                # mux_rate+'11' (3), reserved+stuffing_length (1)
                if pos + 10 > len(data):
                    raise ValueError("truncated MPEG-2 PS pack header")
                v = int.from_bytes(data[pos : pos + 10], "big")
                bits = 80

                def take(n: int) -> int:
                    nonlocal bits
                    bits -= n
                    return (v >> bits) & ((1 << n) - 1)

                take(2)
                scr = take(3) << 30
                if not take(1):
                    raise ValueError("MPEG-2 PS SCR marker missing")
                scr |= take(15) << 15
                if not take(1):
                    raise ValueError("MPEG-2 PS SCR marker missing")
                scr |= take(15)
                if not take(1):
                    raise ValueError("MPEG-2 PS SCR marker missing")
                take(9)  # SCR extension (27 MHz fraction)
                if not take(1):
                    raise ValueError("MPEG-2 PS SCR marker missing")
                rate = take(22)
                if take(2) != 0b11:
                    raise ValueError("MPEG-2 PS mux_rate marker missing")
                take(5)
                stuff = take(3)
                pos += 10 + stuff
            if mux_rate is None:
                mux_rate = rate
            scr_last = scr
            if scr_first is None:
                scr_first = scr
            n_packs += 1
            continue
        if code == 0xB9:
            break
        if code == 0xBB:
            if pos + 2 > len(data):
                raise ValueError("truncated MPEG-PS system header")
            ln = int.from_bytes(data[pos : pos + 2], "big")
            if pos + 2 + ln > len(data):
                raise ValueError("truncated MPEG-PS system header")
            pos += 2 + ln
            continue
        if 0xBD <= code <= 0xEF:
            if pos + 2 > len(data):
                raise ValueError("truncated MPEG-PS packet")
            ln = int.from_bytes(data[pos : pos + 2], "big")
            pos += 2
            end = pos + ln
            if end > len(data):
                raise ValueError("MPEG-PS packet length beyond stream")
            if code == 0xBE:  # padding stream: all-0xFF payload, no
                pos = end     # header byte — skip it entirely (§2.4.3.3)
                continue
            if code == 0xBF:  # private_stream_2: payload starts right
                at = pos      # after packet_length, no flag byte
                rec = streams.setdefault(
                    code,
                    {"n_packets": 0, "n_bytes": 0, "pts": [],
                     **({"data": bytearray()} if keep_payload else {})},
                )
                rec["n_packets"] += 1
                rec["n_bytes"] += end - at
                if keep_payload:
                    rec["data"] += data[at:end]
                pos = end
                continue
            at = pos
            if at < end and data[at] >> 6 == 0b10:
                # 13818-1 PES header: '10' flags + flags2 + length,
                # PTS/DTS validated, other optional fields skipped by
                # PES_header_data_length (which bounds them by spec)
                if at + 3 > end:
                    raise ValueError("truncated MPEG-2 PES header")
                flags2 = data[at + 1]
                hdl = data[at + 2]
                p = at + 3
                hdr_end = p + hdl
                if hdr_end > end:
                    raise ValueError(
                        "MPEG-2 PES header beyond packet length"
                    )
                pts = None
                # §2.4.3.7: the optional fields live INSIDE
                # PES_header_data_length — a PTS flagged but not
                # covered by hdl would silently parse payload bytes
                # as a timestamp (r13 self-review)
                need = {0b10: 5, 0b11: 10}.get(flags2 >> 6, 0)
                if p + need > hdr_end:
                    raise ValueError(
                        "MPEG-2 PES header_data_length too small "
                        "for its PTS/DTS flags"
                    )
                if flags2 >> 6 == 0b10:
                    pts = _read_ts(data, p, 0b0010)
                elif flags2 >> 6 == 0b11:
                    pts = _read_ts(data, p, 0b0011)
                    _dts = _read_ts(data, p + 5, 0b0001)
                elif flags2 >> 6 == 0b01:
                    raise ValueError("MPEG-2 PES with DTS but no PTS")
                rec = streams.setdefault(
                    code,
                    {"n_packets": 0, "n_bytes": 0, "pts": [],
                     **({"data": bytearray()} if keep_payload else {})},
                )
                rec["n_packets"] += 1
                rec["n_bytes"] += end - hdr_end
                if pts is not None:
                    rec["pts"].append(pts)
                if keep_payload:
                    rec["data"] += data[hdr_end:end]
                pos = end
                continue
            while at < end and data[at] == 0xFF:  # stuffing
                at += 1
            if at >= end:
                raise ValueError("MPEG-PS packet with no header byte")
            if data[at] >> 6 == 0b01:  # STD buffer field
                at += 2
                if at >= end:
                    raise ValueError("truncated MPEG-PS STD field")
            pts = None
            top = data[at] >> 4
            if top == 0b0010:
                pts = _read_ts(data, at, 0b0010)
                at += 5
            elif top == 0b0011:
                pts = _read_ts(data, at, 0b0011)
                at += 5
                _dts = _read_ts(data, at, 0b0001)
                at += 5
            else:
                if data[at] != 0x0F:
                    raise ValueError(
                        "MPEG-PS packet header flag byte invalid"
                    )
                at += 1
            if at > end:
                raise ValueError("MPEG-PS packet header beyond length")
            rec = streams.setdefault(
                code,
                {"n_packets": 0, "n_bytes": 0, "pts": [],
                 **({"data": bytearray()} if keep_payload else {})},
            )
            rec["n_packets"] += 1
            rec["n_bytes"] += end - at
            if pts is not None:
                rec["pts"].append(pts)
            if keep_payload:
                rec["data"] += data[at:end]
            pos = end
            continue
        raise ValueError(f"unexpected MPEG-PS start code {code:#x}")
    else:
        raise ValueError("MPEG-PS stream without end code")
    if keep_payload:
        for rec in streams.values():
            rec["data"] = bytes(rec["data"])
    return {
        "n_packs": n_packs,
        "mpeg_version": version,
        "mux_rate": mux_rate,
        "scr_first": scr_first,
        "scr_last": scr_last,
        "streams": streams,
    }
