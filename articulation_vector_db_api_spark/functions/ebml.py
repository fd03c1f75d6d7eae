"""EBML walk (RFC 8794) for Matroska/WebM metadata — stdlib only.

The video-container counterpart of functions/isobmff.py: WebM/MKV is
how web-scraped video arrives, and a curation pipeline needs doctype /
duration / per-track dimensions / audio facts BEFORE committing to a
(gated) perceptual decode. Only the element tree is read — Cluster
payloads (the encoded video) are skipped by their declared size.

Covers the RFC 8794 varint machinery (element IDs keep their marker
bit, sizes strip it, all-ones sizes mean "unknown — extends to the
parent's end"), the EBML header DocType, Segment > Info
(TimestampScale, float Duration) and Segment > Tracks > TrackEntry
(TrackType, Video PixelWidth/PixelHeight, Audio SamplingFrequency/
Channels). The encoder emits minimal spec-conformant streams as test
vectors.
"""

from __future__ import annotations

import struct

_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_TRACK_NUMBER = 0xD7
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

# containers whose children we descend into
_MASTERS = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO}


def _read_vint(b: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    if pos >= len(b):
        raise ValueError("truncated EBML varint")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML varint lead byte 0")
    length = 9 - first.bit_length()  # leading zeros + 1
    if pos + length > len(b):
        raise ValueError("truncated EBML varint")
    v = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        v = (v << 8) | b[pos + i]
    return v, pos + length


def _is_unknown_size(size: int, nbytes: int) -> bool:
    return size == (1 << (7 * nbytes)) - 1


def _walk(b: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for each element in
    [pos, end); recursion is the caller's choice via _MASTERS."""
    while pos < end:
        start = pos
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size_start = pos
        size, pos = _read_vint(b, pos, keep_marker=False)
        if _is_unknown_size(size, pos - size_start):
            body_end = end  # unknown size: extends to the parent's end
        else:
            body_end = pos + size
        if body_end > end:
            raise ValueError(f"EBML element {eid:#x} overruns its parent")
        yield eid, pos, body_end
        pos = body_end
        if start == pos:
            raise ValueError("EBML walk made no progress")


def _uint(b: bytes, p: int, q: int) -> int:
    return int.from_bytes(b[p:q], "big")


def _float(b: bytes, p: int, q: int) -> float:
    if q - p == 4:
        return struct.unpack(">f", b[p:q])[0]
    if q - p == 8:
        return struct.unpack(">d", b[p:q])[0]
    raise ValueError(f"EBML float of width {q - p}")


def parse_ebml(payload: bytes) -> dict:
    """Walk a Matroska/WebM stream → {doctype, duration_ms, video:
    [(w, h)...], audio: [(rate_hz, channels)...], tracks:
    [{number, codec_id, width, height}...]}. duration_ms is rounded
    from TimestampScale (ns per tick, default 1e6) × the float
    Duration."""
    b = bytes(payload)
    if b[:4] != _EBML.to_bytes(4, "big"):
        raise ValueError("not an EBML stream")
    doctype = None
    ts_scale = 1_000_000
    duration_ticks = None
    video: list[tuple[int, int]] = []
    audio: list[tuple[int, int]] = []
    tracks: list[dict] = []
    for eid, p, q in _walk(b, 0, len(b)):
        if eid == _EBML:
            for cid, cp, cq in _walk(b, p, q):
                if cid == _DOCTYPE:
                    doctype = b[cp:cq].split(b"\x00")[0].decode("ascii")
        elif eid == _SEGMENT:
            for cid, cp, cq in _walk(b, p, q):
                if cid == _INFO:
                    for iid, ip, iq in _walk(b, cp, cq):
                        if iid == _TS_SCALE:
                            ts_scale = _uint(b, ip, iq)
                        elif iid == _DURATION:
                            duration_ticks = _float(b, ip, iq)
                elif cid == _TRACKS:
                    for tid, tp, tq in _walk(b, cp, cq):
                        if tid != _TRACK_ENTRY:
                            continue
                        w = h = rate = ch = ttype = None
                        number = codec_id = codec_private = None
                        for fid, fp, fq in _walk(b, tp, tq):
                            if fid == _TRACK_NUMBER:
                                number = _uint(b, fp, fq)
                            elif fid == _TRACK_TYPE:
                                ttype = _uint(b, fp, fq)
                            elif fid == _CODEC_ID:
                                codec_id = (
                                    b[fp:fq].split(b"\x00")[0].decode("ascii")
                                )
                            elif fid == _CODEC_PRIVATE:
                                codec_private = b[fp:fq]
                            elif fid == _VIDEO:
                                for vid, vp, vq in _walk(b, fp, fq):
                                    if vid == _PIX_W:
                                        w = _uint(b, vp, vq)
                                    elif vid == _PIX_H:
                                        h = _uint(b, vp, vq)
                            elif fid == _AUDIO:
                                for aid, ap, aq in _walk(b, fp, fq):
                                    if aid == _SAMPLE_FREQ:
                                        rate = round(_float(b, ap, aq))
                                    elif aid == _CHANNELS:
                                        ch = _uint(b, ap, aq)
                        if w is not None and h is not None:
                            video.append((w, h))
                        if rate is not None:
                            audio.append((rate, ch if ch is not None else 1))
                        tracks.append(
                            {
                                "number": number,
                                "codec_id": codec_id,
                                "codec_private": codec_private,
                                "width": w,
                                "height": h,
                                "rate": rate,
                                "channels": ch,
                                "type": ttype,
                            }
                        )
    if doctype is None:
        raise ValueError("EBML header lacks DocType")
    duration_ms = (
        None
        if duration_ticks is None
        else round(duration_ticks * ts_scale / 1_000_000)
    )
    return {
        "doctype": doctype,
        "duration_ms": duration_ms,
        "video": video,
        "audio": audio,
        "tracks": tracks,
        "_ts_scale": ts_scale,
    }


def mkv_frames(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Cluster/SimpleBlock walk → [(track_number, timestamp_ms,
    frame_bytes)] in stream order.

    Implements the Matroska block layout (RFC 9559): per Cluster a
    Timestamp element plus SimpleBlocks; each SimpleBlock carries the
    track number as an EBML vint, a signed 16-bit big-endian
    timestamp relative to the cluster, a flags byte, and one or more
    laced frames. All four lacing modes decode: none (00), Xiph (01),
    fixed-size (10), and EBML (11 — unsigned-vint first size plus
    signed-vint deltas per RFC 9559); the witness encoder emits all
    four as well."""
    b = bytes(payload)
    if b[:4] != _EBML.to_bytes(4, "big"):
        raise ValueError("not an EBML stream")
    # pass 1: TimestampScale — Matroska does NOT mandate Info before
    # Clusters (seek-head layouts place it after), so the scale must
    # be resolved before any cluster timestamp is converted
    ts_scale = 1_000_000
    for eid, p, q in _walk(b, 0, len(b)):
        if eid != _SEGMENT:
            continue
        for cid, cp, cq in _walk(b, p, q):
            if cid == _INFO:
                for iid, ip, iq in _walk(b, cp, cq):
                    if iid == _TS_SCALE:
                        ts_scale = _uint(b, ip, iq)
    out: list[tuple[int, int, bytes]] = []
    for eid, p, q in _walk(b, 0, len(b)):
        if eid != _SEGMENT:
            continue
        for cid, cp, cq in _walk(b, p, q):
            if cid != _CLUSTER:
                continue
            cluster_ts = 0
            for kid, kp, kq in _walk(b, cp, cq):
                if kid == _CLUSTER_TS:
                    cluster_ts = _uint(b, kp, kq)
                elif kid == _SIMPLE_BLOCK:
                    out.extend(
                        _parse_simple_block(
                            b, kp, kq, cluster_ts, ts_scale
                        )
                    )
    return out


def _parse_simple_block(
    b: bytes, p: int, q: int, cluster_ts: int, ts_scale: int
) -> list[tuple[int, int, bytes]]:
    track, p = _read_vint(b, p, keep_marker=False)
    if p + 3 > q:
        raise ValueError("truncated Matroska SimpleBlock header")
    rel = struct.unpack(">h", b[p : p + 2])[0]
    flags = b[p + 2]
    p += 3
    lacing = (flags >> 1) & 0x03
    ts_ms = (cluster_ts + rel) * ts_scale // 1_000_000
    if lacing == 0:
        return [(track, ts_ms, b[p:q])]
    if p >= q:
        raise ValueError("truncated Matroska lacing header")
    n = b[p] + 1
    p += 1
    sizes: list[int] = []
    if lacing == 1:  # Xiph: 255-run sums for the first n-1 frames
        for _ in range(n - 1):
            size = 0
            while True:
                if p >= q:
                    raise ValueError("truncated Xiph lacing sizes")
                size += b[p]
                stop = b[p] != 255
                p += 1
                if stop:
                    break
            sizes.append(size)
    elif lacing == 3:
        # EBML lacing (RFC 9559 §10): unsigned vint first size, then
        # n-2 SIGNED vint deltas (raw - (2^(7*len-1) - 1)) against the
        # previous size; the last frame is the block remainder
        if n > 1:
            size, p2 = _read_vint(b, p, keep_marker=False)
            if p2 > q:
                raise ValueError("truncated EBML lacing sizes")
            p = p2
            sizes.append(size)
            for _ in range(n - 2):
                raw, p2 = _read_vint(b, p, keep_marker=False)
                if p2 > q:
                    raise ValueError("truncated EBML lacing sizes")
                delta = raw - ((1 << (7 * (p2 - p) - 1)) - 1)
                p = p2
                size += delta
                if size < 0:
                    raise ValueError("negative EBML-laced frame size")
                sizes.append(size)
    else:  # fixed-size: remainder must split evenly
        if (q - p) % n:
            raise ValueError("Matroska fixed lacing does not split evenly")
        sizes = [(q - p) // n] * (n - 1)
    frames = []
    for s in sizes:
        if p + s > q:
            raise ValueError("Matroska laced frame overruns block")
        frames.append((track, ts_ms, b[p : p + s]))
        p += s
    frames.append((track, ts_ms, b[p:q]))  # last frame = remainder
    return frames


def decode_mkv_frames(payload: bytes):
    """Full pixel decode through the Matroska seam: parse the track
    table, walk Clusters, and decode each video frame by CodecID —
    V_MJPEG rides functions/jpeg.py, V_MPEG1 and V_MPEG2
    reconstitute the elementary stream (CodecPrivate carries the
    sequence header + extensions + GOP, blocks carry pictures — the
    Matroska codec-mapping convention) and ride functions/mpeg1.py /
    functions/mpeg2.py; anything else raises
    NotImplementedError (honest gate: VP8/VP9/AV1 are perceptual
    codecs). -> (meta, [(track, ts_ms, (h, w, ch) uint8 array)])."""
    from .jpeg import decode_jpeg

    meta = parse_ebml(payload)
    tracks_by_num = {
        t["number"]: t for t in meta["tracks"] if t["number"] is not None
    }
    out = []
    mpeg1_blocks: dict[int, list[tuple[int, bytes]]] = {}
    for track, ts_ms, frame in mkv_frames(payload):
        t = tracks_by_num.get(track)
        if t is None:
            raise ValueError(f"Matroska block for unknown track {track}")
        codec = t["codec_id"]
        if codec == "V_MJPEG":
            out.append((track, ts_ms, decode_jpeg(frame)))
        elif codec in ("V_MPEG1", "V_MPEG2"):
            mpeg1_blocks.setdefault(track, []).append((ts_ms, frame))
        elif (
            (t["type"] is not None and t["type"] != 1)
            or (codec is not None and not codec.startswith("V_"))
        ):
            # audio/subtitle/other tracks ride their own extractors
            # (extract_mkv_audio / subtitle parsers), not the pixel
            # walk; only an unknown VIDEO codec is a hard gate
            continue
        else:
            raise NotImplementedError(f"Matroska codec {codec}")
    for track, blocks in mpeg1_blocks.items():
        from .mpeg1 import decode_m1v
        from .mpeg2 import decode_m2v

        codec = tracks_by_num[track]["codec_id"]
        decode_es = decode_m1v if codec == "V_MPEG1" else decode_m2v
        private = tracks_by_num[track]["codec_private"]
        if not private:
            raise ValueError(
                f"Matroska {codec} track without CodecPrivate "
                "(sequence header expected there)"
            )
        es = private + b"".join(fr for _ts, fr in blocks)
        if not es.endswith(b"\x00\x00\x01\xb7"):
            es += b"\x00\x00\x01\xb7"
        _m1meta, frames = decode_es(es)
        if len(frames) != len(blocks):
            raise ValueError(
                f"MPEG-1 picture count {len(frames)} != "
                f"Matroska block count {len(blocks)}"
            )
        # Matroska block timestamps are PRESENTATION times while the
        # blocks sit in decode order; decode_m1v returns frames in
        # DISPLAY order (B pictures reordered), so the display-order
        # frame list pairs with the sorted timestamps — identical for
        # I/P-only streams, correct for streams with B pictures
        out.extend(
            (track, ts_ms, fr)
            for ts_ms, fr in zip(
                sorted(ts for ts, _payload in blocks), frames
            )
        )
    return meta, out


def _svint(delta: int) -> bytes:
    """Signed EBML vint (RFC 9559 lace deltas): raw = delta + bias,
    bias = 2^(7*len-1) - 1, shortest length that fits."""
    for nbytes in range(1, 9):
        bias = (1 << (7 * nbytes - 1)) - 1
        raw = delta + bias
        if 0 <= raw < (1 << (7 * nbytes)) - 1:
            return (raw | (1 << (7 * nbytes))).to_bytes(nbytes, "big")
    raise ValueError("EBML signed vint overflow")


def _vint_size(size: int) -> bytes:
    for nbytes in range(1, 9):
        if size < (1 << (7 * nbytes)) - 1:  # all-ones is reserved
            v = size | (1 << (7 * nbytes))
            return v.to_bytes(nbytes, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    nbytes = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nbytes, "big") + _vint_size(len(body)) + body


def _uint_el(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def build_mkv_mjpeg(
    frames: list[tuple[int, bytes]],
    width: int,
    height: int,
    lacing: str = "none",
    frames_per_cluster: int = 4,
    codec_id: str = "V_MJPEG",
    codec_private: bytes = b"",
    audio_blocks: list[tuple[int, bytes]] | None = None,
    audio_codec_id: str = "A_MPEG/L2",
    audio_rate: int = 48000,
    audio_channels: int = 1,
    audio_codec_private: bytes = b"",
) -> bytes:
    """Matroska file with ONE video track: ``frames`` is
    [(timestamp_ms, payload_bytes)]. Frames group into Clusters of
    ``frames_per_cluster``; each cluster's Timestamp is its first
    frame's, SimpleBlocks carry signed relative offsets. ``lacing``:
    "none" (one block per frame), "xiph" or "fixed" (one laced block
    per cluster; "fixed" requires equal frame sizes). Default codec is
    V_MJPEG (payloads are JPEG streams); V_MPEG1 puts the sequence
    header + GOP in ``codec_private`` (the Matroska codec-mapping
    convention) with per-picture payloads in the blocks.

    With ``audio_blocks`` ([(timestamp_ms, payload)]) a second
    TrackEntry (number 2, type 2, ``audio_codec_id`` — A_MPEG/L1 and
    A_MPEG/L2 blocks carry raw MPEG-audio frames per the Matroska
    codec mapping) is written and the audio SimpleBlocks interleave
    into each cluster by timestamp. Without it the output is
    byte-identical to the single-track writer."""
    if not frames:
        raise ValueError("Matroska clip needs at least one frame")
    if lacing not in ("none", "xiph", "fixed", "ebml"):
        raise ValueError(f"unknown lacing {lacing!r}")
    track_num = 1
    header = _el(_EBML, _el(_DOCTYPE, b"matroska"))
    last_ms = frames[-1][0]
    info = _el(
        _INFO,
        _uint_el(_TS_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", float(last_ms + 100))),
    )
    vtrack = _el(
        _TRACK_ENTRY,
        _uint_el(_TRACK_NUMBER, track_num)
        + _uint_el(_TRACK_TYPE, 1)
        + _el(_CODEC_ID, codec_id.encode("ascii"))
        + (_el(_CODEC_PRIVATE, codec_private) if codec_private else b"")
        + _el(_VIDEO, _uint_el(_PIX_W, width) + _uint_el(_PIX_H, height)),
    )
    tracks_body = vtrack
    if audio_blocks is not None:
        tracks_body += _el(
            _TRACK_ENTRY,
            _uint_el(_TRACK_NUMBER, 2)
            + _uint_el(_TRACK_TYPE, 2)
            + _el(_CODEC_ID, audio_codec_id.encode("ascii"))
            + (
                _el(_CODEC_PRIVATE, audio_codec_private)
                if audio_codec_private
                else b""
            )
            + _el(
                _AUDIO,
                _el(_SAMPLE_FREQ, struct.pack(">f", float(audio_rate)))
                + _uint_el(_CHANNELS, audio_channels),
            ),
        )
    clusters = b""
    vint_track = (0x80 | track_num).to_bytes(1, "big")
    vint_audio = (0x80 | 2).to_bytes(1, "big")
    # ts-only sort: a tuple sort would reorder equal-timestamp blocks
    # by payload bytes, corrupting the reassembled stream order
    pending_audio = sorted(audio_blocks or [], key=lambda x: x[0])
    n_groups = -(-len(frames) // frames_per_cluster)
    for gi, c0 in enumerate(range(0, len(frames), frames_per_cluster)):
        group = frames[c0 : c0 + frames_per_cluster]
        cts = group[0][0]
        # audio timestamped more than 32768 ms BEFORE this cluster's
        # base can't fit the SimpleBlock's signed-16-bit relative
        # field either (struct.error, not the module's ValueError):
        # roll it into dedicated leading audio-only clusters re-based
        # every <=30 s, mirroring the tail rollover below
        while pending_audio and pending_audio[0][0] - cts < -32768:
            acts = pending_audio[0][0]
            take = [
                (ts, a) for ts, a in pending_audio
                if ts - acts <= 30_000 and ts - cts < -32768
            ]
            pending_audio = pending_audio[len(take):]
            abody = _uint_el(_CLUSTER_TS, acts)
            for ts, a in take:
                abody += _el(
                    _SIMPLE_BLOCK,
                    vint_audio + struct.pack(">h", ts - acts) + b"\x80" + a,
                )
            clusters += _el(_CLUSTER, abody)
        body = _uint_el(_CLUSTER_TS, cts)
        if lacing == "none":
            for ts, fr in group:
                body += _el(
                    _SIMPLE_BLOCK,
                    vint_track + struct.pack(">h", ts - cts) + b"\x80" + fr,
                )
        else:
            flags = 0x80 | {"xiph": 0x02, "fixed": 0x04,
                            "ebml": 0x06}[lacing]
            head = vint_track + struct.pack(">h", 0) + bytes([flags])
            head += bytes([len(group) - 1])
            payload = b"".join(fr for _ts, fr in group)
            if lacing == "xiph":
                for _ts, fr in group[:-1]:
                    size = len(fr)
                    head += b"\xff" * (size // 255) + bytes([size % 255])
            elif lacing == "ebml":
                if len(group) > 1:
                    head += _vint_size(len(group[0][1]))
                    prev = len(group[0][1])
                    for _ts, fr in group[1:-1]:
                        head += _svint(len(fr) - prev)
                        prev = len(fr)
            else:
                sizes = {len(fr) for _ts, fr in group}
                if len(sizes) != 1:
                    raise ValueError("fixed lacing needs equal frame sizes")
            body += _el(_SIMPLE_BLOCK, head + payload)
        if pending_audio:
            next_cts = (
                frames[c0 + frames_per_cluster][0]
                if gi + 1 < n_groups
                else None
            )
            # a SimpleBlock's relative timestamp is a SIGNED 16-bit
            # field: audio in this cluster's range must also fit it;
            # later audio (e.g. audio outrunning the video) rolls over
            # into dedicated audio-only clusters below
            take = [
                (ts, a) for ts, a in pending_audio
                if (next_cts is None or ts < next_cts)
                and ts - cts <= 32767
            ]
            pending_audio = pending_audio[len(take):]
            for ts, a in take:
                body += _el(
                    _SIMPLE_BLOCK,
                    vint_audio + struct.pack(">h", ts - cts) + b"\x80" + a,
                )
        clusters += _el(_CLUSTER, body)
    # audio tail past the last video cluster's int16 window: new
    # audio-only clusters, re-based every <=30 s
    while pending_audio:
        cts = pending_audio[0][0]
        take = [
            (ts, a) for ts, a in pending_audio if ts - cts <= 30_000
        ]
        pending_audio = pending_audio[len(take):]
        body = _uint_el(_CLUSTER_TS, cts)
        for ts, a in take:
            body += _el(
                _SIMPLE_BLOCK,
                vint_audio + struct.pack(">h", ts - cts) + b"\x80" + a,
            )
        clusters += _el(_CLUSTER, body)
    segment = _el(_SEGMENT, info + _el(_TRACKS, tracks_body) + clusters)
    return header + segment


def build_webm(
    width: int,
    height: int,
    duration_ms: int,
    audio_rate: int = 48000,
    audio_channels: int = 2,
    doctype: str = "webm",
) -> bytes:
    """Minimal spec-conformant WebM/Matroska skeleton: EBML header
    with DocType, Segment > Info (default TimestampScale, float64
    Duration in ms ticks) and one video + one audio TrackEntry."""
    header = _el(_EBML, _el(_DOCTYPE, doctype.encode("ascii")))
    info = _el(
        _INFO,
        _uint_el(_TS_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", float(duration_ms))),
    )
    vtrack = _el(
        _TRACK_ENTRY,
        _uint_el(_TRACK_TYPE, 1)
        + _el(_VIDEO, _uint_el(_PIX_W, width) + _uint_el(_PIX_H, height)),
    )
    atrack = _el(
        _TRACK_ENTRY,
        _uint_el(_TRACK_TYPE, 2)
        + _el(
            _AUDIO,
            _el(_SAMPLE_FREQ, struct.pack(">f", float(audio_rate)))
            + _uint_el(_CHANNELS, audio_channels),
        ),
    )
    segment = _el(_SEGMENT, info + _el(_TRACKS, vtrack + atrack))
    return header + segment


def _first_audio_track_blocks(payload: bytes):
    """-> (track_dict, [(ts, payload)] ts-sorted, info dict) for the
    first audio track; ValueError when none exists or it is empty."""
    meta = parse_ebml(payload)
    atrack = next(
        (
            t for t in meta["tracks"]
            if (t["type"] == 2)
            or (t["codec_id"] is not None
                and t["codec_id"].startswith("A_"))
        ),
        None,
    )
    if atrack is None:
        raise ValueError("Matroska file carries no audio track")
    blocks = [
        (ts, fr)
        for track, ts, fr in mkv_frames(payload)
        if track == atrack["number"]
    ]
    if not blocks:
        raise ValueError("Matroska audio track has no blocks")
    blocks.sort(key=lambda x: x[0])
    info = {
        "codec_id": atrack["codec_id"],
        "rate": atrack["rate"],
        "channels": atrack["channels"],
        "n_blocks": len(blocks),
    }
    return atrack, blocks, info


def extract_mkv_audio(payload: bytes) -> tuple[dict, bytes]:
    """Extract the first AUDIO track -> ({codec_id, rate, channels,
    n_blocks}, elementary-stream bytes).

    Per the Matroska codec mapping, A_MPEG/L1 and A_MPEG/L2 blocks
    carry raw MPEG-audio frames, so concatenating them in timestamp
    order reproduces the elementary stream functions/mp2.py decodes;
    other audio codecs raise NotImplementedError (honest gate:
    A_VORBIS needs the Xiph-laced CodecPrivate headers and rides
    decode_mkv_audio, A_OPUS a perceptual decoder). Raises ValueError
    when the file has no audio track."""
    _atrack, blocks, info = _first_audio_track_blocks(payload)
    if info["codec_id"] not in ("A_MPEG/L1", "A_MPEG/L2"):
        raise NotImplementedError(
            f"Matroska audio codec {info['codec_id']}"
        )
    return info, b"".join(fr for _ts, fr in blocks)


def xiph_lace_private(packets: list[bytes]) -> bytes:
    """Xiph-lace packets into a CodecPrivate blob (the Matroska
    A_VORBIS convention: count-1 byte, 255-run sizes for all but the
    last packet, then the packets)."""
    if len(packets) < 1 or len(packets) > 256:
        raise ValueError("Xiph CodecPrivate takes 1..256 packets")
    out = bytearray([len(packets) - 1])
    for p in packets[:-1]:
        size = len(p)
        out += b"\xff" * (size // 255) + bytes([size % 255])
    for p in packets:
        out += p
    return bytes(out)


def parse_xiph_private(b: bytes) -> list[bytes]:
    """Inverse of xiph_lace_private -> the packet list."""
    if not b:
        raise ValueError("empty Xiph CodecPrivate")
    n = b[0] + 1
    at = 1
    sizes = []
    for _ in range(n - 1):
        size = 0
        while True:
            if at >= len(b):
                raise ValueError("truncated Xiph CodecPrivate lacing")
            v = b[at]
            at += 1
            size += v
            if v != 255:
                break
        sizes.append(size)
    packets = []
    for size in sizes:
        if at + size > len(b):
            raise ValueError("Xiph CodecPrivate packet overruns blob")
        packets.append(b[at : at + size])
        at += size
    packets.append(b[at:])
    return packets


def decode_mkv_audio(payload: bytes):
    """Full AUDIO decode through the Matroska seam -> (info, rate,
    channels, pcm [ch, samples]).

    A_MPEG/L1 / A_MPEG/L2 blocks concatenate into the MPEG elementary
    stream (functions/mp2.py); A_VORBIS reassembles the three Xiph-
    laced CodecPrivate header packets plus one audio packet per block
    and rides functions/vorbis.py:decode_vorbis_packets. Other audio
    codecs raise NotImplementedError (honest gate: A_OPUS/A_AAC are
    perceptual codecs this engine gates by name)."""
    atrack, blocks, info = _first_audio_track_blocks(payload)
    codec = info["codec_id"]
    if codec in ("A_MPEG/L1", "A_MPEG/L2"):
        from .mp2 import decode_mp1, decode_mp2

        es = b"".join(fr for _ts, fr in blocks)
        rate, ch, pcm = (
            decode_mp1(es) if codec == "A_MPEG/L1" else decode_mp2(es)
        )
        return info, rate, ch, pcm
    if codec == "A_VORBIS":
        from .vorbis import decode_vorbis_packets

        private = atrack["codec_private"]
        if not private:
            raise ValueError(
                "Matroska A_VORBIS track without CodecPrivate headers"
            )
        headers = parse_xiph_private(private)
        if len(headers) != 3:
            raise ValueError(
                f"A_VORBIS CodecPrivate carries {len(headers)} packets, "
                "expected 3"
            )
        rate, ch, pcm = decode_vorbis_packets(
            headers + [fr for _ts, fr in blocks]
        )
        return info, rate, ch, pcm
    raise NotImplementedError(f"Matroska audio codec {codec}")
