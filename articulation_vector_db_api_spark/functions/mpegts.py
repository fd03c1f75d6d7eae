"""MPEG-2 TRANSPORT STREAM (ISO/IEC 13818-1 §2.4.3.2) mux + demux —
the broadcast-capture container: .ts files from DVB/ATSC recordings
and the segment format of HLS. Everything here is fixed-layout
structure from the public spec — 188-byte packets, 13-bit PIDs,
PAT/PMT program-specific information with CRC-32/MPEG-2, PES
reassembly on payload_unit_start_indicator — no literal spec tables
beyond the CRC polynomial 0x04C11DB7 (whose published check value for
b"123456789", 0x0376E6E7, is pinned in tests/test_mpegts.py).

The PES layer is shared with the program stream
(functions/mpegps.py:_pes_packet2 writes, the same '10'-flagged
header parse reads), so the TS demux hands back the identical
elementary streams decode_m2v / decode_m1v / decode_mp2 consume.

Demux policy matches demux_mpeg_ps: strict, length-bounded,
ValueError for malformed packets (per-row fault isolation upstream),
with continuity-counter verification — a gap means bytes were lost
and the ES cannot be trusted.

Reference behavior parity: the reference (/root/reference/main.py)
has no media path; this is engine frontier surface for video-corpus
curation alongside mpegps.py.
"""

from __future__ import annotations

from .mpegps import _pes_packet2, _read_ts

__all__ = ["build_mpeg_ts", "demux_mpeg_ts", "crc32_mpeg"]

TS_PACKET = 188
SYNC_BYTE = 0x47
PAT_PID = 0x0000
PMT_PID = 0x1000
NULL_PID = 0x1FFF
VIDEO_STREAM_0 = 0xE0
AUDIO_STREAM_0 = 0xC0

# stream_type values (13818-1 Table 2-29)
ST_MPEG1_VIDEO = 0x01
ST_MPEG2_VIDEO = 0x02
ST_MPEG1_AUDIO = 0x03

# CRC-32/MPEG-2: polynomial 0x04C11DB7, init 0xFFFFFFFF, MSB-first,
# no reflection, no final xor. The 256-entry table is DERIVED from
# the polynomial at import — computed, not transcribed.
_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
    _CRC_TABLE.append(_c & 0xFFFFFFFF)


def crc32_mpeg(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def _psi_packet(pid: int, section: bytes, cc: int) -> bytes:
    """One TS packet carrying a complete PSI section (pointer_field
    0), stuffed to 188 with 0xFF per §2.4.4.1."""
    payload = bytes([0]) + section
    if len(payload) > TS_PACKET - 4:
        raise ValueError("PSI section too long for one TS packet")
    header = bytes([
        SYNC_BYTE,
        0x40 | (pid >> 8),  # payload_unit_start_indicator
        pid & 0xFF,
        0x10 | (cc & 0xF),  # payload only
    ])
    return header + payload + b"\xff" * (TS_PACKET - 4 - len(payload))


def _section(table_id: int, table_id_ext: int, body: bytes) -> bytes:
    """PSI section wrapper: header + body + CRC-32/MPEG-2 over both."""
    length = 5 + len(body) + 4  # after section_length, incl. CRC
    head = bytes([
        table_id,
        0xB0 | (length >> 8),  # section_syntax=1, '0', reserved '11'
        length & 0xFF,
        table_id_ext >> 8,
        table_id_ext & 0xFF,
        0xC1,  # reserved '11', version 0, current_next 1
        0x00,  # section_number
        0x00,  # last_section_number
    ])
    crc = crc32_mpeg(head + body)
    return head + body + crc.to_bytes(4, "big")


def _sniff_stream_type(sid: int, es: bytes) -> int:
    """Video: MPEG-2 iff a sequence_extension (0xB5) follows the
    sequence header; audio: MPEG-1 Layer I/II (Table 2-29)."""
    if 0xE0 <= sid <= 0xEF:
        at = es.find(b"\x00\x00\x01\xb3")
        nxt = es.find(b"\x00\x00\x01", at + 4) if at >= 0 else -1
        if nxt >= 0 and es[nxt + 3] == 0xB5:
            return ST_MPEG2_VIDEO
        return ST_MPEG1_VIDEO
    return ST_MPEG1_AUDIO


def _pcr_field(base: int) -> bytes:
    """program_clock_reference: base(33) + reserved '111111' + ext(9),
    6 bytes (§2.4.3.4)."""
    base &= (1 << 33) - 1
    v = (base << 15) | (0x3F << 9)  # extension 0
    return v.to_bytes(6, "big")


def build_mpeg_ts(
    streams: dict[int, bytes],
    pes_chunk: int = 4096,
    pts_step: int = 3600,
    pts_start: int = 0,
) -> bytes:
    """Witness transport-stream muxer: {PES stream_id (0xC0/0xE0
    family): elementary_stream} -> a .ts byte string.

    One program: PAT (PID 0) -> PMT (PID 0x1000) -> elementary PIDs
    0x0100 + k in sorted-stream_id order. Each stream is cut into
    PES packets of ``pes_chunk`` payload bytes with a PTS advancing
    ``pts_step`` (90 kHz) per packet, round-robin interleaved; every
    PES packet starts a fresh TS packet (payload_unit_start), the
    tail packet is stuffed via the adaptation field, and the first
    TS packet of each VIDEO PES carries a PCR (the PMT's PCR_PID is
    the first video PID). Timestamps wrap mod 2^33."""
    if not streams:
        raise ValueError("MPEG-TS needs at least one stream")
    for sid in streams:
        if not (0xC0 <= sid <= 0xDF or 0xE0 <= sid <= 0xEF):
            raise ValueError(f"unsupported MPEG-TS stream id {sid:#x}")
    if not 1 <= pes_chunk <= 65500:
        raise ValueError("MPEG-TS pes_chunk out of PES length range")

    sids = sorted(streams)
    pids = {sid: 0x0100 + k for k, sid in enumerate(sids)}
    types = {sid: _sniff_stream_type(sid, streams[sid]) for sid in sids}
    video_pids = [pids[s] for s in sids if 0xE0 <= s <= 0xEF]
    pcr_pid = video_pids[0] if video_pids else pids[sids[0]]

    out = bytearray()
    cc = {PAT_PID: 0, PMT_PID: 0, **{pid: 0 for pid in pids.values()}}

    # PAT: program_number 1 -> PMT_PID
    pat_body = bytes([0x00, 0x01, 0xE0 | (PMT_PID >> 8), PMT_PID & 0xFF])
    out += _psi_packet(PAT_PID, _section(0x00, 1, pat_body), cc[PAT_PID])
    cc[PAT_PID] = (cc[PAT_PID] + 1) & 0xF

    # PMT: PCR_PID + one es_info row per stream (no descriptors)
    pmt_body = bytearray([
        0xE0 | (pcr_pid >> 8), pcr_pid & 0xFF,
        0xF0, 0x00,  # program_info_length 0
    ])
    for sid in sids:
        pid = pids[sid]
        pmt_body += bytes([
            types[sid], 0xE0 | (pid >> 8), pid & 0xFF, 0xF0, 0x00,
        ])
    out += _psi_packet(
        PMT_PID, _section(0x02, 1, bytes(pmt_body)), cc[PMT_PID]
    )
    cc[PMT_PID] = (cc[PMT_PID] + 1) & 0xF

    def emit_pes(pid: int, pes: bytes, pcr: int | None) -> None:
        at = 0
        first = True
        while at < len(pes):
            room = TS_PACKET - 4
            af = b""
            if first and pcr is not None:
                af = bytes([7, 0x10]) + _pcr_field(pcr)  # length, PCR flag
                room -= len(af) + 0  # af includes its length byte
            take = min(len(pes) - at, room)
            if take < room:
                # stuff the shortfall through the adaptation field
                need = room - take
                if af:
                    af = (
                        bytes([af[0] + need]) + af[1:]
                        + b"\xff" * need
                    )
                elif need == 1:
                    af = bytes([0])  # single-byte AF: length 0
                else:
                    af = bytes([need - 1, 0x00]) + b"\xff" * (need - 2)
            afc = 0x30 if af else 0x10
            header = bytes([
                SYNC_BYTE,
                (0x40 if first else 0x00) | (pid >> 8),
                pid & 0xFF,
                afc | (cc[pid] & 0xF),
            ])
            out.extend(header + af + pes[at : at + take])
            cc[pid] = (cc[pid] + 1) & 0xF
            at += take
            first = False
            pcr = None

    cursors = {sid: 0 for sid in sids}
    n = 0
    while any(cursors[s] < len(streams[s]) for s in sids):
        # pts_start lets HLS-style segment muxes keep ONE continuous
        # 90 kHz timeline across segments (r13)
        pts = (pts_start + (n + 1) * pts_step) & ((1 << 33) - 1)
        for sid in sids:
            at = cursors[sid]
            es = streams[sid]
            if at >= len(es):
                continue
            chunk = es[at : at + pes_chunk]
            cursors[sid] = at + len(chunk)
            pid = pids[sid]
            emit_pes(
                pid,
                _pes_packet2(sid, chunk, pts),
                pts if pid == pcr_pid else None,
            )
        n += 1
    return bytes(out)


def _mask_pcr(pkt: bytes) -> bytes:
    """§2.4.3.3: a duplicate packet must be byte-identical EXCEPT the
    PCR value may be updated — zero the 6 PCR bytes before comparing."""
    if len(pkt) < 6 or not (pkt[3] >> 4) & 0x2:
        return pkt
    alen = pkt[4]
    if alen < 7 or not pkt[5] & 0x10:
        return pkt
    return pkt[:6] + bytes(6) + pkt[12:]


def _parse_section(payload: bytes, expect_table: int) -> bytes:
    """pointer_field-led PSI payload -> section body (after the 8-byte
    header, excluding CRC), with the CRC verified."""
    if not payload:
        raise ValueError("empty MPEG-TS PSI payload")
    at = 1 + payload[0]  # pointer_field
    if at + 3 > len(payload):
        raise ValueError("truncated MPEG-TS PSI section")
    if payload[at] != expect_table:
        raise ValueError(
            f"MPEG-TS PSI table_id {payload[at]:#x}, "
            f"expected {expect_table:#x}"
        )
    if not payload[at + 1] & 0x80:
        raise ValueError("MPEG-TS PSI without section_syntax_indicator")
    length = ((payload[at + 1] & 0x0F) << 8) | payload[at + 2]
    end = at + 3 + length
    if end > len(payload):
        # section_length may legally reach 1021 — sections spanning
        # multiple TS packets (very wide PATs/PMTs) are an honest
        # gate, not a parse error
        raise NotImplementedError(
            "MPEG-TS PSI section spanning multiple packets"
        )
    section = payload[at:end]
    if crc32_mpeg(section[:-4]) != int.from_bytes(section[-4:], "big"):
        raise ValueError("MPEG-TS PSI CRC mismatch")
    return section[8:-4]


def demux_mpeg_ts(b: bytes, keep_payload: bool = True) -> dict:
    """Demultiplex a transport stream (single- or multi-program\n    PAT; every PMT is followed, NIT entries skipped) ->
    {n_packets, n_psi, program_number, pcr_pid, pcr: [...],
    streams: {stream_id: {pid, stream_type, n_pes, n_bytes,
    pts: [...], data: bytes (when keep_payload)}}}.

    Strict walk: every packet must sync on 0x47, continuity counters
    must be gapless per PID (a gap means lost ES bytes), PSI CRCs
    must verify, and PES payloads are consumed by length/PUSI — never
    by start-code scan."""
    data = bytes(b)
    if not data or len(data) % TS_PACKET:
        raise ValueError("MPEG-TS length is not a multiple of 188")
    pmt_pids: set[int] = set()
    program_number = None
    pcr_pid = None
    es_types: dict[int, int] = {}  # pid -> stream_type
    cc_last: dict[int, int] = {}
    pkt_last: dict[int, bytes] = {}  # for duplicate verification
    dup_run: dict[int, int] = {}
    pcrs: list[int] = []
    bufs: dict[int, bytearray] = {}
    recs: dict[int, dict] = {}  # keyed by PES stream_id
    pid_sid: dict[int, int] = {}
    n_psi = 0

    def close_pes(pid: int) -> None:
        buf = bufs.get(pid)
        if not buf:
            return
        if buf[:3] != b"\x00\x00\x01":
            raise ValueError("MPEG-TS PES without start code")
        sid = buf[3]
        ln = int.from_bytes(buf[4:6], "big")
        end = 6 + ln if ln else len(buf)
        if end > len(buf):
            raise ValueError("MPEG-TS PES shorter than its length")
        at = 6
        if at >= end or buf[at] >> 6 != 0b10:
            raise ValueError("MPEG-TS PES without the '10' flags byte")
        flags2 = buf[at + 1]
        hdl = buf[at + 2]
        at += 3
        hdr_end = at + hdl
        if hdr_end > end:
            raise ValueError("MPEG-TS PES header beyond packet")
        need = {0b10: 5, 0b11: 10}.get(flags2 >> 6, 0)
        if at + need > hdr_end:
            raise ValueError(
                "MPEG-TS PES header_data_length too small for PTS/DTS"
            )
        pts = None
        if flags2 >> 6 == 0b10:
            pts = _read_ts(bytes(buf), at, 0b0010)
        elif flags2 >> 6 == 0b11:
            pts = _read_ts(bytes(buf), at, 0b0011)
        rec = recs.setdefault(
            sid,
            {
                "pid": pid,
                "stream_type": es_types.get(pid),
                "n_pes": 0, "n_bytes": 0, "pts": [],
                **({"data": bytearray()} if keep_payload else {}),
            },
        )
        rec["n_pes"] += 1
        rec["n_bytes"] += end - hdr_end
        if pts is not None:
            rec["pts"].append(pts)
        if keep_payload:
            rec["data"] += buf[hdr_end:end]
        pid_sid[pid] = sid
        bufs[pid] = bytearray()

    for off in range(0, len(data), TS_PACKET):
        pkt = data[off : off + TS_PACKET]
        if pkt[0] != SYNC_BYTE:
            raise ValueError("MPEG-TS sync byte lost")
        if pkt[1] & 0x80:
            raise ValueError("MPEG-TS transport_error_indicator set")
        pusi = bool(pkt[1] & 0x40)
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        afc = (pkt[3] >> 4) & 0x3
        cc = pkt[3] & 0xF
        if pid == NULL_PID:
            continue
        at = 4
        discontinuity = False
        if afc & 0x2:  # adaptation field
            alen = pkt[at]
            at += 1
            if at + alen > TS_PACKET:
                raise ValueError("MPEG-TS adaptation field beyond packet")
            if alen:
                flags = pkt[at]
                discontinuity = bool(flags & 0x80)
                if flags & 0x10:  # PCR
                    if alen < 7:
                        raise ValueError("MPEG-TS PCR field truncated")
                    v = int.from_bytes(pkt[at + 1 : at + 7], "big")
                    pcrs.append(v >> 15)  # 33-bit base
                at += alen
        if not afc & 0x1:
            continue  # no payload
        if pid in cc_last and not discontinuity:
            # §2.4.3.3: the continuity check is waived on a packet
            # whose adaptation field declares discontinuity_indicator
            # (r14 self-review F1 — this used to raise on legal
            # splice points)
            if cc == cc_last[pid]:
                # §2.4.3.3 allows ONE duplicate, and a duplicate must
                # be byte-identical — a different payload under the
                # same counter is corruption, not a duplicate (r14
                # self-review F2: silently dropping it loses ES bytes)
                if dup_run.get(pid, 0) >= 1:
                    raise ValueError(
                        f"MPEG-TS more than one duplicate packet on "
                        f"PID {pid:#x}"
                    )
                if _mask_pcr(pkt) != _mask_pcr(pkt_last.get(pid, b"")):
                    raise ValueError(
                        f"MPEG-TS same continuity counter with "
                        f"different payload on PID {pid:#x}"
                    )
                dup_run[pid] = dup_run.get(pid, 0) + 1
                continue
            if cc != (cc_last[pid] + 1) & 0xF:
                raise ValueError(
                    f"MPEG-TS continuity gap on PID {pid:#x}"
                )
        cc_last[pid] = cc
        pkt_last[pid] = pkt
        dup_run[pid] = 0
        payload = pkt[at:]
        if pid == PAT_PID:
            if pusi:
                body = _parse_section(payload, 0x00)
                # real captures carry MULTI-program PATs plus NIT
                # entries (program_number 0) — walk every 4-byte row,
                # skip the NIT, follow every PMT (r13; the first cut
                # read only the first entry)
                progs: dict[int, int] = {}
                for p in range(0, len(body) - 3, 4):
                    num = int.from_bytes(body[p : p + 2], "big")
                    ppid = ((body[p + 2] & 0x1F) << 8) | body[p + 3]
                    if num:
                        progs[num] = ppid
                if not progs:
                    raise ValueError("MPEG-TS PAT with no programs")
                if program_number is None:
                    program_number = min(progs)
                pmt_pids.update(progs.values())
                n_psi += 1
            continue
        if pid in pmt_pids:
            if pusi:
                body = _parse_section(payload, 0x02)
                if len(body) < 4:
                    raise ValueError("MPEG-TS PMT truncated")
                if pcr_pid is None:
                    pcr_pid = ((body[0] & 0x1F) << 8) | body[1]
                pil = ((body[2] & 0x0F) << 8) | body[3]
                p = 4 + pil
                while p + 5 <= len(body):
                    st = body[p]
                    epid = ((body[p + 1] & 0x1F) << 8) | body[p + 2]
                    eil = ((body[p + 3] & 0x0F) << 8) | body[p + 4]
                    es_types[epid] = st
                    p += 5 + eil
                n_psi += 1
            continue
        if pid in es_types:
            if pusi:
                close_pes(pid)
            buf = bufs.setdefault(pid, bytearray())
            if not pusi and not buf and pid not in pid_sid:
                raise ValueError(
                    f"MPEG-TS PES continuation before start on "
                    f"PID {pid:#x}"
                )
            buf += payload
            continue
        raise ValueError(f"MPEG-TS packet on undeclared PID {pid:#x}")
    for pid in list(bufs):
        close_pes(pid)
    if keep_payload:
        for rec in recs.values():
            rec["data"] = bytes(rec["data"])
    return {
        "n_packets": len(data) // TS_PACKET,
        "n_psi": n_psi,
        "program_number": program_number,
        "pcr_pid": pcr_pid,
        "pcr": pcrs,
        "streams": recs,
    }
