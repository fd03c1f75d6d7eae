"""HLS (HTTP Live Streaming, RFC 8216) media playlists over MPEG-TS
segments — build + parse + stitch. This is how a huge share of web
video actually arrives in a crawl: an .m3u8 text manifest naming
.ts segments, each an independently-decodable transport stream
(own PAT/PMT, continuity counters starting fresh) on ONE continuous
90 kHz presentation timeline.

The stitcher (`demux_hls`) demuxes every segment with
functions/mpegts.py and concatenates the elementary streams per PES
stream id — the MPEG-2 video result is a multi-sequence ES
(sequence header per segment), which decode_m2v handles since the
r13 repeated-sequence-header work; MP2/MP1 audio frames concatenate
directly.

Playlist surface implemented: #EXTM3U, #EXT-X-VERSION,
#EXT-X-TARGETDURATION, #EXT-X-MEDIA-SEQUENCE, #EXTINF (duration +
optional title), segment URIs, #EXT-X-ENDLIST. Unknown #EXT-X- tags
are skipped per RFC 8216 §6.3.1 (clients MUST ignore unrecognized
tags); non-tag junk raises.

Reference behavior parity: the reference (/root/reference/main.py)
has no media path; frontier surface alongside mpegts.py.
"""

from __future__ import annotations

from .mpegts import build_mpeg_ts, demux_mpeg_ts

__all__ = ["build_hls", "parse_m3u8", "parse_m3u8_master", "demux_hls"]


def build_hls(
    segments: list[dict[int, bytes]],
    pes_chunk: int = 4096,
    pts_step: int = 3600,
) -> tuple[str, dict[str, bytes]]:
    """[{stream_id: elementary_stream} per segment] ->
    (m3u8 playlist text, {uri: segment .ts bytes}).

    Each segment muxes independently (own PAT/PMT — the HLS
    requirement that any segment is a valid join point) but the PTS
    timeline is CONTINUOUS across segments via pts_start."""
    if not segments:
        raise ValueError("HLS needs at least one segment")
    files: dict[str, bytes] = {}
    lines = ["#EXTM3U", "#EXT-X-VERSION:3"]
    durations = []
    pts_at = 0
    for k, seg in enumerate(segments):
        ts = build_mpeg_ts(
            seg, pes_chunk=pes_chunk, pts_step=pts_step,
            pts_start=pts_at,
        )
        n_pes_rounds = max(
            -(-len(es) // pes_chunk) for es in seg.values()
        )
        dur = n_pes_rounds * pts_step / 90000.0
        pts_at += n_pes_rounds * pts_step
        uri = f"seg{k}.ts"
        files[uri] = ts
        durations.append((dur, uri))
    lines.append(
        "#EXT-X-TARGETDURATION:"
        + str(max(1, int(-(-max(d for d, _ in durations) // 1))))
    )
    lines.append("#EXT-X-MEDIA-SEQUENCE:0")
    for dur, uri in durations:
        lines.append(f"#EXTINF:{dur:.3f},")
        lines.append(uri)
    lines.append("#EXT-X-ENDLIST")
    return "\n".join(lines) + "\n", files


def parse_m3u8(text: str) -> dict:
    """Media playlist text -> {version, target_duration,
    media_sequence, endlist, segments: [(duration_sec, uri), ...]}.
    Master playlists (#EXT-X-STREAM-INF) raise NotImplementedError —
    pick a variant first."""
    lines = [ln.strip() for ln in text.splitlines()]
    if not lines or lines[0] != "#EXTM3U":
        raise ValueError("not an M3U8 playlist (missing #EXTM3U)")
    out: dict = {
        "version": 1,
        "target_duration": None,
        "media_sequence": 0,
        "endlist": False,
        "segments": [],
    }
    pending: float | None = None
    for ln in lines[1:]:
        if not ln:
            continue
        if ln.startswith("#EXT-X-STREAM-INF"):
            raise NotImplementedError(
                "HLS master playlist (pick a variant stream)"
            )
        if ln.startswith("#EXT-X-VERSION:"):
            out["version"] = int(ln.split(":", 1)[1])
        elif ln.startswith("#EXT-X-TARGETDURATION:"):
            out["target_duration"] = int(float(ln.split(":", 1)[1]))
        elif ln.startswith("#EXT-X-MEDIA-SEQUENCE:"):
            out["media_sequence"] = int(ln.split(":", 1)[1])
        elif ln.startswith("#EXT-X-ENDLIST"):
            out["endlist"] = True
        elif ln.startswith("#EXTINF:"):
            body = ln.split(":", 1)[1]
            pending = float(body.split(",", 1)[0])
        elif ln.startswith("#EXT-X-"):
            continue  # RFC 8216 §6.3.1: ignore unrecognized tags
        elif ln.startswith("#"):
            continue  # comment
        else:
            if pending is None:
                raise ValueError(f"HLS segment URI without #EXTINF: {ln}")
            out["segments"].append((pending, ln))
            pending = None
    if pending is not None:
        raise ValueError("HLS #EXTINF without a following URI")
    return out


def _parse_attr_list(s: str) -> dict[str, str]:
    """#EXT-X-STREAM-INF attribute list: KEY=VALUE pairs, values may
    be quoted strings containing commas (RFC 8216 §4.2)."""
    out: dict[str, str] = {}
    i = 0
    while i < len(s):
        eq = s.find("=", i)
        if eq < 0:
            break
        key = s[i:eq].strip()
        if eq + 1 < len(s) and s[eq + 1] == '"':
            end = s.find('"', eq + 2)
            if end < 0:
                raise ValueError("unterminated HLS attribute string")
            out[key] = s[eq + 2 : end]
            i = end + 1
            if i < len(s) and s[i] == ",":
                i += 1
        else:
            end = s.find(",", eq + 1)
            if end < 0:
                end = len(s)
            out[key] = s[eq + 1 : end].strip()
            i = end + 1
    return out


def parse_m3u8_master(text: str) -> dict:
    """MASTER playlist -> {variants: [{bandwidth, resolution, codecs,
    uri}], best: uri of the highest-bandwidth variant}. A media
    playlist (no #EXT-X-STREAM-INF) raises ValueError — route it to
    parse_m3u8."""
    lines = [ln.strip() for ln in text.splitlines()]
    if not lines or lines[0] != "#EXTM3U":
        raise ValueError("not an M3U8 playlist (missing #EXTM3U)")
    variants: list[dict] = []
    stray: list[str] = []
    pending: dict | None = None
    for ln in lines[1:]:
        if not ln:
            continue
        if ln.startswith("#EXT-X-STREAM-INF:"):
            attrs = _parse_attr_list(ln.split(":", 1)[1])
            if "BANDWIDTH" not in attrs:
                raise ValueError(
                    "HLS STREAM-INF without BANDWIDTH (required)"
                )
            pending = {
                "bandwidth": int(attrs["BANDWIDTH"]),
                "resolution": attrs.get("RESOLUTION"),
                "codecs": attrs.get("CODECS"),
            }
        elif ln.startswith("#"):
            continue
        else:
            if pending is None:
                stray.append(ln)
                continue
            pending["uri"] = ln
            variants.append(pending)
            pending = None
    if pending is not None:
        raise ValueError("HLS #EXT-X-STREAM-INF without a URI")
    if not variants:
        raise ValueError(
            "not a master playlist (no #EXT-X-STREAM-INF) — use "
            "parse_m3u8"
        )
    if stray:
        raise ValueError(
            f"HLS master URI without #EXT-X-STREAM-INF: {stray[0]}"
        )
    best = max(variants, key=lambda v: v["bandwidth"])["uri"]
    return {"variants": variants, "best": best}


def demux_hls(
    playlist: str, fetch: dict[str, bytes], keep_payload: bool = True
) -> dict:
    """Stitch a media playlist: demux every segment and concatenate
    elementary streams per PES stream id ->
    {n_segments, duration_sec, endlist, streams: {stream_id:
    {stream_type, n_pes, n_bytes, pts: [...], data}}}.

    Raises if a segment is missing from ``fetch``, if stream types
    change across segments, or if the stitched PTS timeline is not
    monotone (segments muxed on disjoint timelines are a capture
    error worth failing loudly on)."""
    meta = parse_m3u8(playlist)
    if not meta["segments"]:
        raise ValueError("HLS playlist with no segments")
    streams: dict[int, dict] = {}
    for _dur, uri in meta["segments"]:
        if uri not in fetch:
            raise ValueError(f"HLS segment not fetched: {uri}")
        seg = demux_mpeg_ts(fetch[uri], keep_payload=keep_payload)
        for sid, rec in seg["streams"].items():
            agg = streams.setdefault(
                sid,
                {
                    "stream_type": rec["stream_type"],
                    "n_pes": 0, "n_bytes": 0, "pts": [],
                    **({"data": bytearray()} if keep_payload else {}),
                },
            )
            if agg["stream_type"] != rec["stream_type"]:
                raise ValueError(
                    f"HLS stream type changes across segments for "
                    f"stream id {sid:#x}"
                )
            agg["n_pes"] += rec["n_pes"]
            agg["n_bytes"] += rec["n_bytes"]
            agg["pts"] += rec["pts"]
            if keep_payload:
                agg["data"] += rec["data"]
    for sid, agg in streams.items():
        if agg["pts"] != sorted(agg["pts"]):
            raise ValueError(
                f"HLS stitched PTS not monotone for stream {sid:#x}"
            )
        if keep_payload:
            agg["data"] = bytes(agg["data"])
    return {
        "n_segments": len(meta["segments"]),
        "duration_sec": round(sum(d for d, _ in meta["segments"]), 3),
        "endlist": meta["endlist"],
        "streams": streams,
    }
