"""Fragmented MP4 (ISO/IEC 14496-12 §8.8) — the CMAF/DASH delivery
layout: an INIT segment (ftyp + moov whose sample tables are empty
and whose mvex/trex carries track defaults) followed by MEDIA
segments (styp + moof(mfhd, traf(tfhd, tfdt, trun)) + mdat). Together
with functions/hls.py this closes the web-delivery matrix:
progressive MP4 (r10), HLS-over-TS (r13), and DASH/CMAF fMP4 (r13).

Implemented flag surface (what real packagers emit):
- tfhd: base-data-offset(0x01), sample-description-index(0x02),
  default-sample-duration(0x08), default-sample-size(0x10),
  default-sample-flags(0x20), default-base-is-moof(0x20000) — all
  parsed; the writer emits default-base-is-moof.
- trun: data-offset(0x01), first-sample-flags(0x04), per-sample
  duration(0x100)/size(0x200)/flags(0x400)/composition-time-
  offset(0x800), versions 0 and 1 (signed cts in v1).
- tfdt versions 0/1; decode-time continuity across segments is
  VERIFIED (a gap means lost samples).

Box plumbing (walk_boxes, _box/_full, the VisualSampleEntry) is
shared with functions/isobmff.py. Demux is strict: ValueError for
malformed segments, NotImplementedError for multi-track fragments.

Reference behavior parity: the reference (/root/reference/main.py)
has no media path; frontier surface alongside isobmff.py/hls.py.
"""

from __future__ import annotations

import struct

from .isobmff import _box, _full, build_esds, walk_boxes

__all__ = ["build_fmp4_mjpeg", "demux_fmp4"]


def _visual_sample_entry(
    width: int, height: int, codec: str, decoder_config: bytes,
    oti: int,
) -> bytes:
    esds = build_esds(oti, decoder_config) if codec == "mp4v" else b""
    return (
        struct.pack(">I", 86 + len(esds))
        + codec.encode("ascii")
        + bytes(6)
        + struct.pack(">H", 1)
        + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + bytes(4)
        + struct.pack(">H", 1)
        + bytes(32)
        + struct.pack(">Hh", 24, -1)
        + esds
    )


def build_fmp4_mjpeg(
    segments: list[list[tuple[int, bytes]]],
    width: int,
    height: int,
    timescale: int = 90000,
    codec: str = "jpeg",
    decoder_config: bytes = b"",
    oti: int = 0x6A,
) -> tuple[bytes, list[bytes]]:
    """[[(duration_ticks, sample_bytes), ...] per media segment] ->
    (init_segment, [media_segment, ...]), one video track (ID 1)."""
    if codec not in ("jpeg", "mp4v"):
        raise NotImplementedError(f"fMP4 writer codec {codec!r}")
    if not segments or any(not seg for seg in segments):
        raise ValueError("fMP4 needs at least one sample per segment")

    # ---- init segment: ftyp + moov(mvhd, trak(empty stbl), mvex)
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5dash")
    stsd = _full(
        b"stsd", 0,
        struct.pack(">I", 1)
        + _visual_sample_entry(width, height, codec, decoder_config, oti),
    )
    empty = (
        _full(b"stts", 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, struct.pack(">I", 0))
    )
    stbl = _box(b"stbl", stsd + empty)
    dinf = _box(
        b"dinf",
        _full(
            b"dref", 0,
            struct.pack(">I", 1) + _box(b"url ", struct.pack(">I", 1)),
        ),
    )
    vmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"vide" + bytes(12) + b"mjpeg\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, 0)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),
    )
    trex = _full(
        b"trex", 0, struct.pack(">IIIII", 1, 1, 0, 0, 0)
    )
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
    init = ftyp + moov

    # ---- media segments
    out = []
    decode_time = 0
    for k, seg in enumerate(segments):
        styp = _box(b"styp", b"msdh" + struct.pack(">I", 0) + b"msdhmsix")
        mfhd = _full(b"mfhd", 0, struct.pack(">I", k + 1))
        tfhd = _box(
            b"tfhd",
            struct.pack(">I", 0x20000)  # default-base-is-moof
            + struct.pack(">I", 1),     # track_ID
        )
        tfdt = _box(
            b"tfdt",
            struct.pack(">I", 1 << 24) + struct.pack(">Q", decode_time),
        )
        trun_rows = b"".join(
            struct.pack(">II", d, len(s)) for d, s in seg
        )
        # trun payload with the data_offset patched after sizing
        trun_flags = 0x000301  # data-offset + duration + size
        trun_wo_off = (
            struct.pack(">I", trun_flags)
            + struct.pack(">I", len(seg))
        )
        trun_size = 8 + len(trun_wo_off) + 4 + len(trun_rows)
        traf_size = 8 + len(tfhd) + len(tfdt) + trun_size
        moof_size = 8 + len(mfhd) + traf_size
        data_offset = moof_size + 8  # into mdat payload, from moof start
        trun = _box(
            b"trun",
            trun_wo_off + struct.pack(">i", data_offset) + trun_rows,
        )
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        assert len(moof) == moof_size
        mdat = _box(b"mdat", b"".join(s for _d, s in seg))
        out.append(styp + moof + mdat)
        decode_time += sum(d for d, _s in seg)
    return init, out


def _parse_init(init: bytes) -> dict:
    """walk_boxes yields (type, payload_start, payload_end, depth)
    and recurses into moov/trak/mdia/minf/stbl itself; mvex is a
    leaf there, so its trex child gets a nested walk."""
    meta = {"track_id": None, "timescale": None, "codec": None,
            "width": None, "height": None,
            "trex": (0, 0, 0)}  # default duration, size, flags
    for btype, ps, pe, _d in walk_boxes(init):
        if btype == b"mvex":
            for t2, p2, e2, _d2 in walk_boxes(init, ps, pe):
                if t2 == b"trex":
                    tid, _sdi, dd, ds, df = struct.unpack_from(
                        ">IIIII", init, p2 + 4
                    )
                    meta["track_id"] = tid
                    meta["trex"] = (dd, ds, df)
        elif btype == b"mdhd":
            ver = init[ps]
            meta["timescale"] = struct.unpack_from(
                ">I", init, ps + (20 if ver else 12)
            )[0]
        elif btype == b"stsd":
            body = init[ps + 8 :pe]  # skip version/flags + entry_count
            if len(body) >= 36:
                meta["codec"] = body[4:8].decode("latin1")
                meta["width"], meta["height"] = struct.unpack_from(
                    ">HH", body, 32
                )
    if meta["track_id"] is None or meta["timescale"] is None:
        raise ValueError("fMP4 init segment missing moov/mvex/trex")
    return meta


def _need(ps: int, pe: int, n: int, what: str) -> None:
    """Bounds guard for fixed fragment-box fields: struct.unpack_from
    keeps reading past pe into the NEXT box's bytes without an error,
    so every fixed read is size-validated first (r14 self-review F5)."""
    if pe - ps < n:
        raise ValueError(f"fMP4 {what} box truncated")


def demux_fmp4(
    init: bytes, segments: list[bytes]
) -> tuple[dict, list[tuple[int, bytes]]]:
    """(init, [media segments]) -> (meta, [(duration_ticks,
    sample_bytes)]), with mfhd sequence and tfdt decode-time
    continuity verified across segments."""
    meta = _parse_init(init)
    samples: list[tuple[int, bytes]] = []
    expected_dt = 0
    n_frag = 0
    try:
        for seg in segments:
            seg = bytes(seg)
            frag = None
            for btype, ps, pe, _d in walk_boxes(seg):
                if btype == b"moof":
                    if frag is not None:
                        raise ValueError("fMP4 moof without its mdat")
                    frag = {
                        "start": ps - 8, "seq": None, "track_id": None,
                        "tfdt": None, "base": None,
                        # one (data_offset | None, rows) run per trun:
                        # real packagers emit MULTIPLE truns per traf
                        # (per-GOP runs), each with its own offset —
                        # a single overwritten offset read trun 1's
                        # samples at trun N's position (r14 second
                        # self-review pass, pinned)
                        "runs": [],
                        "dd": meta["trex"][0], "ds": meta["trex"][1],
                    }
                elif btype == b"mfhd" and frag is not None:
                    _need(ps, pe, 8, "mfhd")
                    frag["seq"] = struct.unpack_from(">I", seg, ps + 4)[0]
                elif btype == b"tfhd" and frag is not None:
                    if frag["track_id"] is not None:
                        raise NotImplementedError(
                            "fMP4 multi-track fragment"
                        )
                    _need(ps, pe, 8, "tfhd")
                    flags = struct.unpack_from(">I", seg, ps)[0] & 0xFFFFFF
                    frag["track_id"] = struct.unpack_from(
                        ">I", seg, ps + 4
                    )[0]
                    # fixed fields sized by flags, validated BEFORE any
                    # read — unpack_from would otherwise silently read
                    # the NEXT box's bytes (r14 self-review F5)
                    _need(
                        ps, pe,
                        8
                        + 8 * bool(flags & 0x01)
                        + 4 * (
                            bool(flags & 0x02) + bool(flags & 0x08)
                            + bool(flags & 0x10) + bool(flags & 0x20)
                        ),
                        "tfhd",
                    )
                    p = ps + 8
                    if flags & 0x01:
                        frag["base"] = struct.unpack_from(">Q", seg, p)[0]
                        p += 8
                    if flags & 0x02:
                        p += 4
                    if flags & 0x08:
                        frag["dd"] = struct.unpack_from(">I", seg, p)[0]
                        p += 4
                    if flags & 0x10:
                        frag["ds"] = struct.unpack_from(">I", seg, p)[0]
                        p += 4
                    if flags & 0x20:
                        p += 4
                    if frag["base"] is None and flags & 0x20000:
                        frag["base"] = frag["start"]
                elif btype == b"tfdt" and frag is not None:
                    _need(ps, pe, 4, "tfdt")
                    ver = seg[ps]
                    _need(ps, pe, 12 if ver else 8, "tfdt")
                    frag["tfdt"] = (
                        struct.unpack_from(">Q", seg, ps + 4)[0]
                        if ver
                        else struct.unpack_from(">I", seg, ps + 4)[0]
                    )
                elif btype == b"trun" and frag is not None:
                    _need(ps, pe, 8, "trun")
                    flags = struct.unpack_from(">I", seg, ps)[0] & 0xFFFFFF
                    count = struct.unpack_from(">I", seg, ps + 4)[0]
                    _need(
                        ps, pe,
                        8 + 4 * (bool(flags & 0x01) + bool(flags & 0x04)),
                        "trun",
                    )
                    p = ps + 8
                    run_offset = None
                    if flags & 0x01:
                        run_offset = struct.unpack_from(
                            ">i", seg, p
                        )[0]
                        p += 4
                    if flags & 0x04:
                        p += 4  # first_sample_flags
                    # Validate the declared row count BEFORE looping: a
                    # malformed count (up to 2^32) would otherwise iterate
                    # until struct.unpack_from ran off the segment —
                    # escaping the ValueError contract and burning memory
                    # on the rows list first (ADVICE r13).
                    row_w = 4 * (
                        bool(flags & 0x100)
                        + bool(flags & 0x200)
                        + bool(flags & 0x400)
                        + bool(flags & 0x800)
                    )
                    if (row_w and count * row_w > pe - p) or count > len(seg):
                        raise ValueError(
                            "fMP4 trun sample count beyond box"
                        )
                    rows = []
                    for _ in range(count):
                        dur, size = frag["dd"], frag["ds"]
                        if flags & 0x100:
                            dur = struct.unpack_from(">I", seg, p)[0]
                            p += 4
                        if flags & 0x200:
                            size = struct.unpack_from(">I", seg, p)[0]
                            p += 4
                        if flags & 0x400:
                            p += 4  # per-sample flags
                        if flags & 0x800:
                            p += 4  # cts offset (signed in version 1)
                        if p > pe:
                            raise ValueError("fMP4 trun rows beyond box")
                        rows.append((dur, size))
                    frag["runs"].append((run_offset, rows))
                elif btype == b"mdat":
                    if frag is None:
                        raise ValueError("fMP4 mdat before any moof")
                    if frag["track_id"] is None:
                        raise ValueError("fMP4 moof without tfhd")
                    if frag["track_id"] != meta["track_id"]:
                        raise NotImplementedError(
                            "fMP4 fragment for a second track"
                        )
                    n_frag += 1
                    if frag["seq"] != n_frag:
                        raise ValueError(
                            "fMP4 fragment sequence number gap"
                        )
                    if frag["tfdt"] is not None and frag["tfdt"] != expected_dt:
                        raise ValueError(
                            "fMP4 baseMediaDecodeTime discontinuity"
                        )
                    base = frag["base"] if frag["base"] is not None else 0
                    at = base
                    for run_offset, rows in frag["runs"]:
                        if run_offset is not None:
                            at = base + run_offset
                        # a run without its own offset continues
                        # where the previous run ended (§8.8.8)
                        if at < 0:
                            # r14 self-review F4: a negative trun
                            # data_offset would otherwise slice from
                            # the SEGMENT END via Python negative
                            # indexing and return wrong bytes silently
                            raise ValueError(
                                "fMP4 sample offset before segment"
                            )
                        for dur, size in rows:
                            if not size:
                                raise ValueError(
                                    "fMP4 sample with no size"
                                )
                            if at + size > len(seg):
                                raise ValueError(
                                    "fMP4 sample beyond segment end"
                                )
                            samples.append((dur, seg[at : at + size]))
                            at += size
                            expected_dt += dur
                    frag = None  # fragment fully consumed by its mdat
            if frag is not None:
                # r14 self-review F3: a trailing moof with no mdat used to
                # be dropped silently (its samples lost without an error)
                raise ValueError("fMP4 moof without its mdat")
    except struct.error as exc:
        # r14 self-review F5: a truncated mfhd/tfhd/tfdt/trun
        # box must surface as the module's ValueError contract,
        # not a bare struct.error
        raise ValueError(f"fMP4 box truncated: {exc}") from exc
    if not samples:
        raise ValueError("fMP4 stream with no samples")
    meta["n_fragments"] = n_frag
    meta["duration"] = expected_dt
    return meta, samples
