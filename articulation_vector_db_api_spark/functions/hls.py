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
optional title), segment URIs, #EXT-X-ENDLIST, #EXT-X-BYTERANGE
(§4.3.2.2: sub-range segments of one packed resource, implicit-offset
continuation), and #EXT-X-KEY (§4.3.2.4: METHOD=NONE / AES-128 with
URI + optional 0x IV; absent IV = the segment's media sequence number
big-endian per the RFC). AES-128 segments are whole-resource
AES-128-CBC + PKCS7, decrypted through functions/aes.py (FIPS-197
from scratch, numpy-vectorized across blocks). METHOD=SAMPLE-AES and
non-identity KEYFORMAT raise named NotImplementedError gates
(VERDICT r13 item 3: these used to fall through to a misleading
TS-sync error). Unknown #EXT-X- tags are skipped per RFC 8216 §6.3.1
(clients MUST ignore unrecognized tags); non-tag junk raises.

Reference behavior parity: the reference (/root/reference/main.py)
has no media path; frontier surface alongside mpegts.py.
"""

from __future__ import annotations

from .aes import aes128_cbc_decrypt, aes128_cbc_encrypt
from .mpegts import build_mpeg_ts, demux_mpeg_ts

__all__ = ["build_hls", "parse_m3u8", "parse_m3u8_master", "demux_hls"]


def _seq_iv(seq: int) -> bytes:
    """RFC 8216 §5.2: absent an explicit IV, the IV is the segment's
    media sequence number as a 128-bit big-endian integer."""
    return seq.to_bytes(16, "big")


def build_hls(
    segments: list[dict[int, bytes]],
    pes_chunk: int = 4096,
    pts_step: int = 3600,
    key: bytes | None = None,
    key_uri: str = "stream.key",
    iv: bytes | None = None,
    byterange: bool = False,
) -> tuple[str, dict[str, bytes]]:
    """[{stream_id: elementary_stream} per segment] ->
    (m3u8 playlist text, {uri: segment .ts bytes}).

    Each segment muxes independently (own PAT/PMT — the HLS
    requirement that any segment is a valid join point) but the PTS
    timeline is CONTINUOUS across segments via pts_start.

    ``key`` turns on §4.3.2.4 AES-128 segment encryption: every
    segment is AES-128-CBC + PKCS7 encrypted with the key published
    at ``key_uri``; an explicit ``iv`` is declared as 0x hex, else
    each segment uses its media-sequence IV (the RFC default).
    ``byterange`` packs every segment into ONE ``media.bin`` resource
    addressed by §4.3.2.2 #EXT-X-BYTERANGE sub-ranges (the first with
    an explicit @offset, the rest implicit continuations)."""
    if not segments:
        raise ValueError("HLS needs at least one segment")
    if key is not None and len(key) != 16:
        raise ValueError("HLS AES-128 key must be 16 bytes")
    files: dict[str, bytes] = {}
    lines = ["#EXTM3U", f"#EXT-X-VERSION:{4 if byterange else 3}"]
    durations = []
    blobs: list[bytes] = []
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
        if key is not None:
            ts = aes128_cbc_encrypt(
                ts, key, iv if iv is not None else _seq_iv(k)
            )
        blobs.append(ts)
        durations.append(dur)
    lines.append(
        "#EXT-X-TARGETDURATION:"
        + str(max(1, int(-(-max(durations) // 1))))
    )
    lines.append("#EXT-X-MEDIA-SEQUENCE:0")
    if key is not None:
        files[key_uri] = key
        attrs = f'METHOD=AES-128,URI="{key_uri}"'
        if iv is not None:
            attrs += f",IV=0x{iv.hex()}"
        lines.append(f"#EXT-X-KEY:{attrs}")
    at = 0
    for k, (dur, blob) in enumerate(zip(durations, blobs)):
        lines.append(f"#EXTINF:{dur:.3f},")
        if byterange:
            # explicit @offset on the first range only — the rest
            # exercise the implicit-continuation rule
            lines.append(
                f"#EXT-X-BYTERANGE:{len(blob)}"
                + (f"@{at}" if k == 0 else "")
            )
            lines.append("media.bin")
            at += len(blob)
        else:
            uri = f"seg{k}.ts"
            files[uri] = blob
            lines.append(uri)
    if byterange:
        files["media.bin"] = b"".join(blobs)
    lines.append("#EXT-X-ENDLIST")
    return "\n".join(lines) + "\n", files


def _parse_key_tag(body: str) -> dict | None:
    """#EXT-X-KEY attribute list -> key context dict or None (NONE).
    SAMPLE-AES and non-identity KEYFORMAT are NAMED gates — before
    r14 they fell into the ignore-unknown branch and died far
    downstream on a misleading TS-sync/PTS error."""
    attrs = _parse_attr_list(body)
    method = attrs.get("METHOD", "")
    if method == "NONE":
        return None
    if method == "SAMPLE-AES":
        raise NotImplementedError(
            "HLS #EXT-X-KEY METHOD=SAMPLE-AES (per-sample encryption)"
        )
    if method != "AES-128":
        raise ValueError(f"HLS #EXT-X-KEY METHOD {method!r}")
    if attrs.get("KEYFORMAT", "identity") != "identity":
        raise NotImplementedError(
            f"HLS #EXT-X-KEY KEYFORMAT {attrs['KEYFORMAT']!r}"
        )
    if "URI" not in attrs:
        raise ValueError("HLS #EXT-X-KEY AES-128 without URI")
    iv = None
    if "IV" in attrs:
        h = attrs["IV"]
        if not h.lower().startswith("0x") or len(h) != 34:
            raise ValueError(f"HLS #EXT-X-KEY IV {h!r} (need 0x + 32 hex)")
        iv = bytes.fromhex(h[2:])
    return {"method": "AES-128", "uri": attrs["URI"], "iv": iv}


def parse_m3u8(text: str) -> dict:
    """Media playlist text -> {version, target_duration,
    media_sequence, endlist, segments: [(duration_sec, uri), ...],
    media: [{duration_sec, uri, seq, byterange, key}, ...]}.

    ``segments`` keeps the r13 (duration, uri) shape; ``media`` is
    the full per-segment view: ``byterange`` is (length, offset) when
    the segment is a #EXT-X-BYTERANGE sub-range (implicit offsets
    resolved per §4.3.2.2 — continuation requires the same resource
    as the previous segment), ``key`` is the governing #EXT-X-KEY
    context with the IV defaulted to the media-sequence rule.
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
        "media": [],
    }
    pending: float | None = None
    pending_range: tuple[int, int | None] | None = None
    key_ctx: dict | None = None
    last_range: tuple[str, int] | None = None  # (uri, end offset)
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
            if out["media"]:
                # RFC 8216 §4.3.3.2: MUST appear before the first
                # segment — applying it late would silently renumber
                # the sequence the earlier segments' default IVs were
                # derived from (r14 self-review F10)
                raise ValueError(
                    "HLS #EXT-X-MEDIA-SEQUENCE after the first segment"
                )
            seq0 = int(ln.split(":", 1)[1])
            if seq0 < 0:
                # a negative sequence would overflow the 128-bit IV
                # derivation with OverflowError (r14 review)
                raise ValueError("HLS negative #EXT-X-MEDIA-SEQUENCE")
            out["media_sequence"] = seq0
        elif ln.startswith("#EXT-X-ENDLIST"):
            out["endlist"] = True
        elif ln.startswith("#EXT-X-KEY:"):
            key_ctx = _parse_key_tag(ln.split(":", 1)[1])
        elif ln.startswith("#EXT-X-BYTERANGE:"):
            body = ln.split(":", 1)[1]
            n_s, _, o_s = body.partition("@")
            rng_n = int(n_s)
            rng_o = int(o_s) if o_s else None
            if rng_n <= 0 or (rng_o is not None and rng_o < 0):
                # a negative @offset would slice the packed resource
                # via Python negative indexing — silently wrong
                # segment bytes (r14 review; same class as fmp4 F4)
                raise ValueError(
                    f"HLS #EXT-X-BYTERANGE out of range: {body}"
                )
            pending_range = (rng_n, rng_o)
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
            seq = out["media_sequence"] + len(out["media"])
            rng: tuple[int, int] | None = None
            if pending_range is not None:
                n, o = pending_range
                if o is None:
                    if last_range is None or last_range[0] != ln:
                        raise ValueError(
                            "HLS #EXT-X-BYTERANGE without @offset "
                            "must continue the previous sub-range of "
                            "the same resource (RFC 8216 §4.3.2.2)"
                        )
                    o = last_range[1]
                rng = (n, o)
                last_range = (ln, o + n)
            key = None
            if key_ctx is not None:
                key = dict(key_ctx)
                if key["iv"] is None:
                    key["iv"] = _seq_iv(seq)
            out["segments"].append((pending, ln))
            out["media"].append(
                {
                    "duration_sec": pending,
                    "uri": ln,
                    "seq": seq,
                    "byterange": rng,
                    "key": key,
                }
            )
            pending = None
            pending_range = None
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

    Byterange segments are sliced out of their packed resource;
    AES-128 segments are decrypted with the key fetched from the
    #EXT-X-KEY URI (whole-segment AES-128-CBC + PKCS7, RFC 8216
    §4.3.2.4) before the TS demux.

    Raises if a segment or key is missing from ``fetch``, if a
    byterange runs past its resource, if stream types change across
    segments, or if the stitched PTS timeline is not monotone
    (segments muxed on disjoint timelines are a capture error worth
    failing loudly on)."""
    meta = parse_m3u8(playlist)
    if not meta["segments"]:
        raise ValueError("HLS playlist with no segments")
    streams: dict[int, dict] = {}
    for ent in meta["media"]:
        uri = ent["uri"]
        if uri not in fetch:
            raise ValueError(f"HLS segment not fetched: {uri}")
        blob = fetch[uri]
        if ent["byterange"] is not None:
            n, o = ent["byterange"]
            if o + n > len(blob):
                raise ValueError(
                    f"HLS byterange {n}@{o} beyond {uri} "
                    f"({len(blob)} bytes)"
                )
            blob = blob[o : o + n]
        if ent["key"] is not None:
            kuri = ent["key"]["uri"]
            if kuri not in fetch:
                raise ValueError(f"HLS key not fetched: {kuri}")
            kbytes = fetch[kuri]
            if len(kbytes) != 16:
                raise ValueError(
                    f"HLS AES-128 key {kuri} is {len(kbytes)} bytes"
                )
            blob = aes128_cbc_decrypt(blob, kbytes, ent["key"]["iv"])
        seg = demux_mpeg_ts(blob, keep_payload=keep_payload)
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
