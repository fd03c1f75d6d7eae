"""ISOBMFF (ISO/IEC 14496-12) box walker — the container structure
under MP4/MOV video and AVIF/HEIF images.

Pure header parsing, no codec: boxes are (uint32 size, 4cc type
[, uint64 largesize]) records, containers nest child boxes in their
payload. That is enough to read the metadata a 100 TB video/image
curation pipeline filters on BEFORE any decode — MP4 duration and
track dimensions (mvhd/tkhd), AVIF pixel dimensions (meta → iprp →
ipco → ispe) — closing the one container family
operators/multimodal.py:decode_image previously could not walk.
Sample data (mdat) is never touched; the walk cost is the box tree,
bytes of it, not the media.
"""

from __future__ import annotations

import struct

# containers whose payload is a sequence of child boxes; meta is a
# FullBox container (4-byte version/flags prefix before children)
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"iprp", b"ipco",
    b"moof", b"traf", b"edts",
}
_FULLBOX_CONTAINERS = {b"meta"}


def walk_boxes(b: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end, depth) over the box
    tree, recursing into known containers. Tolerates the 64-bit
    largesize form and size=0 (box extends to end of enclosure)."""
    end = len(b) if end is None else end
    stack = [(start, end, 0)]
    while stack:
        i, stop, depth = stack.pop()
        while i + 8 <= stop:
            (size,) = struct.unpack_from(">I", b, i)
            btype = b[i + 4 : i + 8]
            payload = i + 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", b, i + 8)
                payload = i + 16
            elif size == 0:
                size = stop - i
            if size < 8 or i + size > stop:
                raise ValueError(f"malformed box {btype!r} at {i}")
            body_start = payload
            if btype in _FULLBOX_CONTAINERS:
                body_start += 4  # version/flags
            yield btype, payload, i + size, depth
            if btype in _CONTAINERS or btype in _FULLBOX_CONTAINERS:
                # children first (depth-first), then continue siblings
                stack.append((i + size, stop, depth))
                i, stop, depth = body_start, i + size, depth + 1
                continue
            i += size


def parse_mp4_meta(b: bytes) -> dict:
    """Duration and per-track dimensions from moov — the pre-decode
    facts (length, resolution, track count) a video curation filter
    needs. Handles mvhd/tkhd versions 0 (32-bit) and 1 (64-bit)."""
    out: dict = {"duration_sec": None, "tracks": []}
    if b[4:8] != b"ftyp":
        raise ValueError("not an ISOBMFF stream (no ftyp)")
    for btype, p, q, _d in walk_boxes(b):
        if btype == b"mvhd":
            ver = b[p]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", b, p + 20)
            else:
                ts, dur = struct.unpack_from(">II", b, p + 12)
            out["duration_sec"] = dur / ts if ts else None
        elif btype == b"tkhd":
            ver = b[p]
            # track_ID follows version/flags + creation/modification
            # times (4+4 bytes in v0, 8+8 in v1)
            base = p + (20 if ver == 1 else 12)
            # width/height are 16.16 fixed point at the box tail
            w, h = struct.unpack_from(">II", b, q - 8)
            (track_id,) = struct.unpack_from(">I", b, base)
            out["tracks"].append(
                {"track_id": track_id, "width": w >> 16, "height": h >> 16}
            )
    if out["duration_sec"] is None and not out["tracks"]:
        raise ValueError("ISOBMFF stream has no moov metadata")
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + payload)


def _mpeg4_descriptor(tag: int, payload: bytes) -> bytes:
    """MPEG-4 systems (ISO 14496-1 §8.3.3) expandable-size descriptor:
    tag byte + 7-bits-per-byte length (MSB = continuation) + payload."""
    n = len(payload)
    size = bytes([n & 0x7F])
    n >>= 7
    while n:
        size = bytes([0x80 | (n & 0x7F)]) + size
        n >>= 7
    return bytes([tag]) + size + payload


def build_esds(
    oti: int, decoder_config: bytes, stream_type: int = 4
) -> bytes:
    """'esds' box: ES_Descriptor(3) > DecoderConfigDescriptor(4)
    [objectTypeIndication, streamType] > DecoderSpecificInfo(5)
    + SLConfigDescriptor(6, predefined=2). OTI 0x6A = MPEG-1 Visual,
    0x6B = MPEG-1 Audio (ISO 14496-1 Table 5); stream_type 4 = visual,
    5 = audio. For MPEG-1 video decoder_config carries the sequence
    header + GOP; MPEG-1 audio needs none."""
    dcd = _mpeg4_descriptor(
        4,
        bytes([oti, (stream_type << 2) | 1])
        + b"\x00\x00\x00"           # bufferSizeDB (24-bit)
        + struct.pack(">II", 0, 0)  # max/avg bitrate: unspecified
        + (
            _mpeg4_descriptor(5, decoder_config)
            if decoder_config
            else b""
        ),
    )
    es = _mpeg4_descriptor(
        3, struct.pack(">HB", 1, 0) + dcd + _mpeg4_descriptor(6, b"\x02")
    )
    return _full(b"esds", 0, es)


def _sample_table_boxes(
    samples: list[tuple[int, bytes]],
    samples_per_chunk: int,
    mdat_payload_start: int,
) -> tuple[bytes, bytes, bytes, bytes, bytes]:
    """The shared stbl machinery -> (mdat, stts, stsc, stsz, stco):
    samples group into mdat chunks of ``samples_per_chunk`` (a
    trailing partial chunk gets its own stsc run), stts compresses
    equal-duration runs, stco carries absolute chunk offsets."""
    sizes = [len(s) for _d, s in samples]
    chunks: list[list[int]] = [
        list(range(i, min(i + samples_per_chunk, len(samples))))
        for i in range(0, len(samples), samples_per_chunk)
    ]
    mdat_payload = b"".join(s for _d, s in samples)
    offsets = []
    pos = mdat_payload_start
    for ch in chunks:
        offsets.append(pos)
        pos += sum(sizes[k] for k in ch)
    mdat = _box(b"mdat", mdat_payload)
    # stts: run-length over durations
    runs: list[tuple[int, int]] = []
    for d, _s in samples:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts", 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", n, d) for n, d in runs),
    )
    # stsc: one entry per distinct samples-per-chunk run (1-based)
    stsc_rows: list[tuple[int, int]] = []
    for ci, ch in enumerate(chunks, start=1):
        if not stsc_rows or stsc_rows[-1][1] != len(ch):
            stsc_rows.append((ci, len(ch)))
    stsc = _full(
        b"stsc", 0,
        struct.pack(">I", len(stsc_rows))
        + b"".join(struct.pack(">III", fc, n, 1) for fc, n in stsc_rows),
    )
    stsz = _full(
        b"stsz", 0,
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco", 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    return mdat, stts, stsc, stsz, stco


def build_mp4_mjpeg(
    samples: list[tuple[int, bytes]],
    width: int,
    height: int,
    timescale: int = 90000,
    samples_per_chunk: int = 2,
    codec: str = "jpeg",
    decoder_config: bytes = b"",
    oti: int = 0x6A,
) -> bytes:
    """MP4 with ONE video track: ``samples`` is
    [(duration_in_timescale_ticks, payload_bytes)]. Layout
    ftyp|mdat|moov; samples group into mdat chunks of
    ``samples_per_chunk`` (a trailing partial chunk gets its own stsc
    run), stts compresses equal-duration runs, stco carries absolute
    chunk offsets — the full sample-table machinery, not a one-chunk
    shortcut. Default codec 'jpeg' (QuickTime Motion-JPEG); 'mp4v'
    appends an esds box whose objectTypeIndication is ``oti``
    (default 0x6A MPEG-1 Visual; pass 0x61 for 13818-2 Main) and
    whose DecoderSpecificInfo is ``decoder_config`` (the sequence
    header + extensions + GOP), samples being the per-picture access
    units."""
    if codec not in ("jpeg", "mp4v"):
        raise NotImplementedError(f"MP4 writer codec {codec!r}")
    if not samples:
        raise ValueError("MP4 needs at least one sample")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat, stts, stsc, stsz, stco = _sample_table_boxes(
        samples, samples_per_chunk, len(ftyp) + 8
    )
    # VisualSampleEntry (86 bytes incl. header, plus esds for mp4v)
    esds = build_esds(oti, decoder_config) if codec == "mp4v" else b""
    vse = (
        struct.pack(">I", 86 + len(esds))
        + codec.encode("ascii")
        + bytes(6)                      # reserved
        + struct.pack(">H", 1)          # data_reference_index
        + bytes(16)                     # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4)                      # reserved
        + struct.pack(">H", 1)          # frame_count
        + bytes(32)                     # compressorname
        + struct.pack(">Hh", 24, -1)    # depth, pre_defined
        + esds
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + vse)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    # one self-contained 'url ' entry (flags=1: data in this file)
    dinf = _box(
        b"dinf",
        _full(
            b"dref", 0,
            struct.pack(">I", 1) + _box(b"url ", struct.pack(">I", 1)),
        ),
    )
    total = sum(d for d, _s in samples)
    vmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIIIHH", 0, 0, timescale, total, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"vide" + bytes(12) + b"mjpeg\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, total)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _read_descriptor(b: bytes, pos: int) -> tuple[int, int, int]:
    """-> (tag, payload_start, payload_end) for one expandable-size
    MPEG-4 descriptor; bounds-checked ValueError on truncation."""
    if pos >= len(b):
        raise ValueError("truncated MPEG-4 descriptor")
    tag = b[pos]
    pos += 1
    size = 0
    for _ in range(4):  # spec caps the size field at 4 bytes
        if pos >= len(b):
            raise ValueError("truncated MPEG-4 descriptor size")
        byte = b[pos]
        pos += 1
        size = (size << 7) | (byte & 0x7F)
        if not byte & 0x80:
            break
    else:
        raise ValueError("MPEG-4 descriptor size field overlong")
    if pos + size > len(b):
        raise ValueError("MPEG-4 descriptor overruns its box")
    return tag, pos, pos + size


def _parse_esds(body: bytes) -> tuple[int | None, bytes | None]:
    """esds payload (after FullBox version/flags) -> (oti,
    decoder_specific_info). Walks ES_Descriptor(3) >
    DecoderConfigDescriptor(4) > DecoderSpecificInfo(5)."""
    tag, p, q = _read_descriptor(body, 0)
    if tag != 3:
        raise ValueError(f"esds does not start with ES_Descriptor ({tag})")
    if q - p < 3:
        raise ValueError("short ES_Descriptor")
    flags = body[p + 2]
    p += 3
    if flags & 0x80:  # streamDependenceFlag: depends_on_ES_ID
        p += 2
    if flags & 0x40:  # URL_Flag: length-prefixed URL string
        if p >= q:
            raise ValueError("truncated ES_Descriptor URL")
        p += 1 + body[p]
    if flags & 0x20:  # OCRstreamFlag
        p += 2
    oti = dsi = None
    while p < q:
        tag, dp, dq = _read_descriptor(body, p)
        if tag == 4:
            if dq - dp < 13:
                raise ValueError("short DecoderConfigDescriptor")
            oti = body[dp]
            sp = dp + 13
            while sp < dq:
                stag, ip, iq = _read_descriptor(body, sp)
                if stag == 5:
                    dsi = body[ip:iq]
                    break
                sp = iq
        p = dq
    return oti, dsi


def mp4_samples(b: bytes) -> tuple[dict, list[tuple[int, bytes]]]:
    """Sample-table walk (ISO 14496-12 §8.5-8.7): stsd codec +
    dimensions, stts run expansion to per-sample timestamps, stsc
    chunk-run → per-chunk sample counts, stsz sizes, stco offsets →
    sample byte ranges. -> ({codec, width, height, timescale,
    duration_ms, n_samples}, [(ts_ticks, sample_bytes)]). Malformed
    tables raise ValueError (struct/bounds errors are converted —
    the per-row fault-isolation contract)."""
    try:
        return _mp4_samples(b)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt ISOBMFF sample table: {exc}") from exc


def _mp4_samples(b: bytes) -> tuple[dict, list[tuple[int, bytes]]]:
    if b[4:8] != b"ftyp":
        raise ValueError("not an ISOBMFF stream (no ftyp)")
    stsd = stts = stsc = stsz = stco = None
    timescale = None
    for btype, p, q, _d in walk_boxes(b):
        if btype == b"mdhd" and timescale is None:
            ver = b[p]
            timescale = struct.unpack_from(
                ">I", b, p + (20 if ver == 1 else 12)
            )[0]
        elif btype == b"stsd" and stsd is None:
            stsd = (p, q)
        elif btype == b"stts" and stts is None:
            stts = (p, q)
        elif btype == b"stsc" and stsc is None:
            stsc = (p, q)
        elif btype == b"stsz" and stsz is None:
            stsz = (p, q)
        elif btype in (b"stco", b"co64") and stco is None:
            stco = (btype, p, q)
    if not all((stsd, stts, stsc, stsz, stco, timescale)):
        raise ValueError("ISOBMFF stream lacks a complete sample table")
    p, _q = stsd
    (n_entries,) = struct.unpack_from(">I", b, p + 4)
    if n_entries < 1:
        raise ValueError("empty stsd")
    codec = b[p + 12 : p + 16].decode("ascii", "replace")
    # width/height live at fixed VisualSampleEntry offsets — they only
    # exist for VISUAL sample entries. For audio entries (mp4a, Opus…)
    # those bytes are samplerate/channel fields; reading them as
    # dimensions yields garbage metadata (r10 ADVICE), so gate on the
    # known visual fourccs and report 0x0 otherwise.
    _VISUAL = {"jpeg", "mjpa", "mjpb", "avc1", "avc3", "hvc1", "hev1",
               "vp08", "vp09", "av01", "mp4v", "encv", "raw "}
    if codec in _VISUAL:
        width, height = struct.unpack_from(">HH", b, p + 8 + 8 + 24)
    else:
        width = height = 0
    # mp4v sample entries carry an esds box after the 86 fixed
    # VisualSampleEntry bytes: objectTypeIndication selects the actual
    # codec (0x6A = MPEG-1 Visual), DecoderSpecificInfo carries its
    # config (the MPEG-1 sequence header + GOP)
    oti = decoder_config = None
    sample_rate = channels = None
    if codec in ("mp4v", "mp4a"):
        # mp4v: esds after the 86 fixed VisualSampleEntry bytes;
        # mp4a: esds after the 36-byte AudioSampleEntry, whose fixed
        # fields carry channelcount/samplesize/samplerate (16.16)
        (entry_size,) = struct.unpack_from(">I", b, p + 8)
        entry_end = min(p + 8 + entry_size, _q)
        skip = 86 if codec == "mp4v" else 36
        if codec == "mp4a" and p + 8 + 36 <= entry_end:
            channels, _ssz = struct.unpack_from(">HH", b, p + 8 + 24)
            sample_rate = struct.unpack_from(">I", b, p + 8 + 32)[0] >> 16
        try:
            for etype, ep, eq, _d in walk_boxes(b, p + 8 + skip, entry_end):
                if etype == b"esds":
                    oti, decoder_config = _parse_esds(b[ep + 4 : eq])
                    break
        except ValueError:
            # a sample entry without a well-formed esds (or a
            # mislabeled entry whose fixed fields aren't boxes) keeps
            # oti None — the decode paths gate on that, the metadata
            # pass must not die here
            oti = decoder_config = None
    # stsz — bound the declared count BEFORE any expansion: counts are
    # attacker-controlled, and a stomped 0xFFFFFFFF must be a cheap
    # ValueError, never a multi-GB list build (the Vorbis-hang lesson)
    p, q = stsz
    fixed, n_samples = struct.unpack_from(">II", b, p + 4)
    if n_samples > len(b):
        raise ValueError(
            f"stsz declares {n_samples} samples in a {len(b)}-byte file"
        )
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if p + 12 + 4 * n_samples > q:
            raise ValueError("truncated stsz")
        sizes = list(struct.unpack_from(f">{n_samples}I", b, p + 12))
    # stts -> per-sample timestamps; run counts must stay within the
    # declared sample total at every step (no expansion past it)
    p, q = stts
    (n_runs,) = struct.unpack_from(">I", b, p + 4)
    if p + 8 + 8 * n_runs > q:
        raise ValueError("truncated stts")
    ts: list[int] = []
    t = 0
    for r in range(n_runs):
        cnt, delta = struct.unpack_from(">II", b, p + 8 + 8 * r)
        if len(ts) + cnt > n_samples:
            raise ValueError(
                f"stts covers more than the {n_samples} stsz samples"
            )
        for _ in range(cnt):
            ts.append(t)
            t += delta
    if len(ts) != n_samples:
        raise ValueError(
            f"stts covers {len(ts)} samples, stsz declares {n_samples}"
        )
    # stsc runs -> samples per chunk
    p, q = stsc
    (n_sc,) = struct.unpack_from(">I", b, p + 4)
    if p + 8 + 12 * n_sc > q:
        raise ValueError("truncated stsc")
    sc = [
        struct.unpack_from(">III", b, p + 8 + 12 * r)[:2]
        for r in range(n_sc)
    ]
    # stco offsets
    ctype, p, q = stco
    (n_chunks,) = struct.unpack_from(">I", b, p + 4)
    if ctype == b"stco":
        offs = list(struct.unpack_from(f">{n_chunks}I", b, p + 8))
    else:
        offs = list(struct.unpack_from(f">{n_chunks}Q", b, p + 8))
    # expand chunk runs and slice samples
    out: list[tuple[int, bytes]] = []
    si = 0
    for ci in range(1, n_chunks + 1):
        spc = None
        for fc, n in sc:
            if fc <= ci:
                spc = n
        if spc is None:
            raise ValueError("stsc does not cover chunk 1")
        pos = offs[ci - 1]
        for _ in range(spc):
            if si >= n_samples:
                break
            size = sizes[si]
            if pos + size > len(b):
                raise ValueError("sample range overruns file")
            out.append((ts[si], b[pos : pos + size]))
            pos += size
            si += 1
    if si != n_samples:
        raise ValueError(
            f"chunk layout yields {si} samples, stsz declares {n_samples}"
        )
    total = t
    return (
        {
            "codec": codec,
            "oti": oti,
            "sample_rate": sample_rate,
            "channels": channels,
            "decoder_config": decoder_config,
            "width": width,
            "height": height,
            "timescale": timescale,
            "duration_ms": total * 1000 // timescale,
            "n_samples": n_samples,
        },
        out,
    )


def decode_mp4_frames(b: bytes):
    """Full pixel decode through the MP4 seam: sample-table walk +
    per-sample codec dispatch — 'jpeg' (QuickTime Motion-JPEG) rides
    functions/jpeg.py; 'mp4v' with objectTypeIndication 0x6A (MPEG-1
    Visual) reconstitutes the elementary stream from the esds
    DecoderSpecificInfo (sequence header + GOP) plus the per-picture
    samples and rides functions/mpeg1.py; other codecs
    (avc1/hvc1/vp09/av01, other OTIs) raise NotImplementedError.
    -> (meta, [(ts_ms, (h, w, ch) uint8)])."""
    from .jpeg import decode_jpeg

    meta, samples = mp4_samples(b)
    scale = meta["timescale"]
    if meta["codec"] == "jpeg":
        return meta, [
            (ts * 1000 // scale, decode_jpeg(s)) for ts, s in samples
        ]
    if meta["codec"] == "mp4v":
        from .mpeg1 import decode_m1v
        from .mpeg2 import decode_m2v

        # ISO 14496-1 Table 5: 0x6A = MPEG-1 Visual; 0x60/0x61 =
        # 13818-2 Simple/Main (the engine's progressive frame-picture
        # subset); the other 13818-2 OTIs (SNR/Spatial/High/422) gate
        if meta["oti"] == 0x6A:
            decode_es = decode_m1v
        elif meta["oti"] in (0x60, 0x61):
            decode_es = decode_m2v
        else:
            raise NotImplementedError(
                f"MP4 mp4v objectTypeIndication {meta['oti']!r} "
                "(engine decodes 0x6A MPEG-1 / 0x60-0x61 MPEG-2)"
            )
        if not meta["decoder_config"]:
            raise ValueError(
                "MP4 MPEG video track without DecoderSpecificInfo "
                "(sequence header expected there)"
            )
        es = meta["decoder_config"] + b"".join(s for _ts, s in samples)
        if not es.endswith(b"\x00\x00\x01\xb7"):
            es += b"\x00\x00\x01\xb7"
        _m1meta, frames = decode_es(es)
        if len(frames) != len(samples):
            raise ValueError(
                f"MPEG-1 picture count {len(frames)} != "
                f"MP4 sample count {len(samples)}"
            )
        if _m1meta["n_b"]:
            # stts carries DECODE timestamps; presentation times for
            # B-bearing tracks need ctts composition offsets, which
            # this walker does not parse — refuse rather than pair
            # decode-order times with the display-order frames
            raise NotImplementedError(
                "MP4 MPEG-1 track with B pictures (presentation "
                "timing needs the ctts box)"
            )
        return meta, [
            (ts * 1000 // scale, fr)
            for (ts, _s), fr in zip(samples, frames)
        ]
    raise NotImplementedError(f"MP4 sample codec {meta['codec']!r}")


def avif_dimensions(b: bytes) -> tuple[int, int]:
    """AVIF/HEIF pixel dimensions from the ispe property (ISO 23008-12
    §6.5.3: FullBox with uint32 width, height) — found by walking
    meta → iprp → ipco. The codec payload (av1C/mdat) is never read."""
    for btype, p, _q, _d in walk_boxes(b):
        if btype == b"ispe":
            w, h = struct.unpack_from(">II", b, p + 4)
            return w, h
    raise ValueError("no ispe property (not an AVIF/HEIF still?)")


def tiff_dimensions(b: bytes) -> tuple[int, int]:
    """TIFF dimension decode (TIFF 6.0 spec): endian header, first IFD
    walk, ImageWidth (256) / ImageLength (257) tags as SHORT or LONG.
    Pure directory parsing — strips/tiles are never read. Also the
    carrier format of EXIF metadata blocks."""
    if b[:4] == b"II*\x00":
        endian = "little"
    elif b[:4] == b"MM\x00*":
        endian = "big"
    else:
        raise ValueError("not a TIFF stream")

    def u(off: int, size: int) -> int:
        chunk = b[off : off + size]
        if len(chunk) < size:
            raise ValueError("truncated TIFF")
        return int.from_bytes(chunk, endian)

    ifd = u(4, 4)
    n = u(ifd, 2)
    width = height = None
    for k in range(n):
        e = ifd + 2 + 12 * k
        tag, dtype = u(e, 2), u(e + 2, 2)
        if tag in (256, 257):
            # value fits inline: SHORT (3) reads 2 bytes, LONG (4)
            # reads 4 — both left-justified in the value field
            if dtype == 3:
                val = u(e + 8, 2)
            elif dtype == 4:
                val = u(e + 8, 4)
            else:
                raise ValueError(f"unexpected TIFF dim type {dtype}")
            if tag == 256:
                width = val
            else:
                height = val
    if width is None or height is None:
        raise ValueError("TIFF IFD lacks dimension tags")
    return width, height


def build_mp4_audio(
    samples: list[tuple[int, bytes]],
    rate: int,
    channels: int = 1,
    timescale: int | None = None,
    samples_per_chunk: int = 3,
    oti: int = 0x6B,
) -> bytes:
    """Audio-only MP4 (.m4a layout): an 'mp4a' AudioSampleEntry whose
    esds declares objectTypeIndication ``oti`` (0x6B = MPEG-1 Audio —
    Layers I/II/III — per ISO 14496-1 Table 5; 14496-14 §5.6 maps it
    onto mp4a), samples being whole MPEG audio frames. Same
    sample-table machinery as the video writer."""
    if not samples:
        raise ValueError("MP4 needs at least one sample")
    timescale = rate if timescale is None else timescale
    ftyp = _box(b"ftyp", b"M4A " + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat, stts, stsc, stsz, stco = _sample_table_boxes(
        samples, samples_per_chunk, len(ftyp) + 8
    )
    esds = build_esds(oti, b"", stream_type=5)
    ase = (
        struct.pack(">I", 36 + len(esds))
        + b"mp4a"
        + bytes(6)                       # reserved
        + struct.pack(">H", 1)           # data_reference_index
        + bytes(8)                       # reserved
        + struct.pack(">HH", channels, 16)  # channelcount, samplesize
        + bytes(4)                       # pre_defined/reserved
        + struct.pack(">I", rate << 16)  # samplerate 16.16
        + esds
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + ase)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(
        b"dinf",
        _full(
            b"dref", 0,
            struct.pack(">I", 1) + _box(b"url ", struct.pack(">I", 1)),
        ),
    )
    total = sum(d for d, _s in samples)
    smhd = _full(b"smhd", 0, struct.pack(">HH", 0, 0))
    minf = _box(b"minf", smhd + dinf + stbl)
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIIIHH", 0, 0, timescale, total, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"soun" + bytes(12) + b"audio\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, total)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)  # volume 1.0
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0)
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def decode_mp4_audio(b: bytes):
    """Full AUDIO decode through the MP4 seam -> (info, rate,
    channels, pcm [ch, samples]): the sample-table walk yields the
    MPEG audio frames of an mp4a track whose esds declares
    objectTypeIndication 0x6B (MPEG-1 Audio); concatenating them
    reproduces the elementary stream and the frame header's layer
    routes to the Layer I/II decoders (Layer III synthesis stays
    honestly gated, like everywhere else in the engine). Other
    sample-entry codecs or OTIs raise NotImplementedError."""
    meta, samples = mp4_samples(b)
    if meta["codec"] != "mp4a":
        raise NotImplementedError(
            f"MP4 audio decode for sample entry {meta['codec']!r}"
        )
    if meta["oti"] != 0x6B:
        raise NotImplementedError(
            f"MP4 mp4a objectTypeIndication {meta['oti']!r} "
            "(engine decodes 0x6B MPEG-1 Audio)"
        )
    es = b"".join(s for _ts, s in samples)
    from .mp3 import _parse_header

    layer = _parse_header(es, 0)["layer"]
    from .mp2 import decode_mp1, decode_mp2

    if layer == 1:
        rate, ch, pcm = decode_mp1(es)
    elif layer == 2:
        rate, ch, pcm = decode_mp2(es)
    else:
        raise NotImplementedError(
            "MP4 MPEG-1 Layer III sample synthesis"
        )
    info = {
        "codec": "mp4a",
        "oti": meta["oti"],
        "layer": layer,
        "sample_rate": meta["sample_rate"],
        "channels": meta["channels"],
        "n_samples": len(samples),
    }
    return info, rate, ch, pcm
