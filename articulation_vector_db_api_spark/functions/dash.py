"""MPEG-DASH MPD manifests (ISO/IEC 23009-1) over fragmented-MP4
segments — build + parse + stitch, stdlib xml.etree only. The
manifest twin of functions/hls.py: an MPD names an init segment and
media segments per Representation; fetching and demuxing them is
functions/fmp4.py's job.

Implemented manifest surface (the static-VoD shapes crawled archives
carry): MPD@type/mediaPresentationDuration, Period, AdaptationSet
(@mimeType), Representation (@id/@bandwidth/@width/@height/@codecs),
SegmentTemplate (@initialization/@media with $RepresentationID$,
$Number$ and $Time$ (+ %0Nd width forms), @startNumber/@duration/
@timescale), SegmentTemplate/SegmentTimeline (<S t/d/r> runs with
r-repeat expansion — the most common VoD form after the fixed-
duration template, r14), and SegmentList (SegmentURL@media +
Initialization@sourceURL). ISO 8601 durations parse the PT#H#M#S
(.frac) forms. Dynamic (live) manifests and r="-1" open-ended repeats
(a live-edge construct) raise named NotImplementedError gates.

Reference behavior parity: the reference (/root/reference/main.py)
has no media path; frontier surface alongside fmp4.py/hls.py.
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET

from .fmp4 import demux_fmp4

__all__ = [
    "build_mpd",
    "build_mpd_timeline",
    "parse_mpd",
    "demux_dash",
    "parse_iso8601_duration",
]


def parse_iso8601_duration(s: str) -> float:
    """'PT12.5S' / 'PT1H2M3S' / 'P0DT4M' -> seconds."""
    m = re.fullmatch(
        r"P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?",
        s,
    )
    if not m or all(g is None for g in m.groups()):
        raise ValueError(f"not an ISO 8601 duration: {s!r}")
    d, h, mi, sec = (float(g) if g else 0.0 for g in m.groups())
    return d * 86400 + h * 3600 + mi * 60 + sec


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def build_mpd(
    rep_id: str,
    n_segments: int,
    seg_duration_ticks: int,
    timescale: int,
    width: int,
    height: int,
    bandwidth: int = 100000,
) -> str:
    """Static single-representation MPD with a $Number$-templated
    SegmentTemplate — the shape every packager emits for VoD."""
    total = n_segments * seg_duration_ticks / timescale
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static" '
        f'mediaPresentationDuration="PT{total:.3f}S" '
        'minBufferTime="PT2S" profiles="urn:mpeg:dash:profile:'
        'isoff-on-demand:2011">\n'
        " <Period>\n"
        '  <AdaptationSet mimeType="video/mp4">\n'
        f'   <Representation id="{rep_id}" bandwidth="{bandwidth}" '
        f'width="{width}" height="{height}" codecs="jpeg">\n'
        '    <SegmentTemplate '
        'initialization="$RepresentationID$-init.mp4" '
        'media="$RepresentationID$-$Number$.m4s" '
        f'startNumber="1" duration="{seg_duration_ticks}" '
        f'timescale="{timescale}"/>\n'
        "   </Representation>\n"
        "  </AdaptationSet>\n"
        " </Period>\n"
        "</MPD>\n"
    )


def build_mpd_timeline(
    rep_id: str,
    seg_durations_ticks: list[int],
    timescale: int,
    width: int,
    height: int,
    bandwidth: int = 100000,
    time_width: int = 0,
) -> str:
    """Static single-representation MPD with a $Time$-addressed
    SegmentTemplate over an explicit <SegmentTimeline> — the most
    common VoD form after the fixed-duration template. Equal-duration
    runs are r-compressed (<S d r>), exactly as packagers emit;
    ``time_width`` > 0 uses the $Time%0Nd$ width form."""
    if not seg_durations_ticks:
        raise ValueError("timeline MPD needs at least one segment")
    total = sum(seg_durations_ticks) / timescale
    runs: list[tuple[int, int]] = []  # (duration, repeat)
    for d in seg_durations_ticks:
        if runs and runs[-1][0] == d:
            runs[-1] = (d, runs[-1][1] + 1)
        else:
            runs.append((d, 0))
    s_lines = []
    at = 0
    for k, (d, r) in enumerate(runs):
        t_attr = f' t="{at}"' if k == 0 else ""
        r_attr = f' r="{r}"' if r else ""
        s_lines.append(f'      <S{t_attr} d="{d}"{r_attr}/>\n')
        at += d * (r + 1)
    time_ident = f"$Time%0{time_width}d$" if time_width else "$Time$"
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static" '
        f'mediaPresentationDuration="PT{total:.3f}S" '
        'minBufferTime="PT2S" profiles="urn:mpeg:dash:profile:'
        'isoff-on-demand:2011">\n'
        " <Period>\n"
        '  <AdaptationSet mimeType="video/mp4">\n'
        f'   <Representation id="{rep_id}" bandwidth="{bandwidth}" '
        f'width="{width}" height="{height}" codecs="jpeg">\n'
        '    <SegmentTemplate '
        'initialization="$RepresentationID$-init.mp4" '
        f'media="$RepresentationID$-{time_ident}.m4s" '
        f'timescale="{timescale}">\n'
        "     <SegmentTimeline>\n"
        + "".join(s_lines)
        + "     </SegmentTimeline>\n"
        "    </SegmentTemplate>\n"
        "   </Representation>\n"
        "  </AdaptationSet>\n"
        " </Period>\n"
        "</MPD>\n"
    )


def _fill_template(
    tpl: str,
    rep_id: str,
    number: int | None,
    time: int | None = None,
) -> str:
    # ISO 23009-1 §5.3.9.4.4: "$$" escapes a literal dollar sign —
    # substitute per unescaped span, then restore (r14 review: the
    # old single-pass hit the leftover-$ gate on valid manifests)
    spans = tpl.split("$$")
    return "$".join(
        _fill_span(s, rep_id, number, time) for s in spans
    )


def _fill_span(
    tpl: str, rep_id: str, number: int | None, time: int | None
) -> str:
    out = tpl.replace("$RepresentationID$", rep_id)
    for ident, val in (("Number", number), ("Time", time)):
        if val is None:
            continue
        # $Number%05d$ width form, then the plain form
        out = re.sub(
            rf"\${ident}%0(\d+)d\$",
            lambda m: f"%0{int(m.group(1))}d" % val,  # noqa: B023
            out,
        )
        out = out.replace(f"${ident}$", str(val))
    if "$" in out:
        raise NotImplementedError(
            f"DASH template identifier in {tpl!r} ($Bandwidth$?)"
        )
    return out


def _expand_timeline(tl_el: ET.Element) -> list[tuple[int, int]]:
    """<SegmentTimeline> -> [(start_ticks, duration_ticks)] with
    <S t d r> runs expanded (ISO 23009-1 §5.3.9.6): @t defaults to
    the running end, @r repeats the duration r more times, r="-1"
    (repeat to period end — a live-edge construct) is gated by name.
    Overlapping starts are malformed; forward gaps (@t beyond the
    running end) are legal discontinuities and kept as declared."""
    segs: list[tuple[int, int]] = []
    at = 0
    saw_s = False
    for s in tl_el:
        if _strip_ns(s.tag) != "S":
            continue
        saw_s = True
        d = int(s.get("d", 0))
        if d <= 0:
            raise ValueError("DASH SegmentTimeline S without @d")
        r = int(s.get("r", 0))
        if r < 0:
            raise NotImplementedError(
                'DASH SegmentTimeline r="-1" open-ended repeat'
            )
        if len(segs) + r + 1 > 1_000_000:
            # a hostile r (up to 2^32 in the wild) would otherwise
            # materialize a billion-tuple list before any fetch check
            raise ValueError(
                "DASH SegmentTimeline expands past 1e6 segments"
            )
        t_attr = s.get("t")
        t = int(t_attr) if t_attr is not None else at
        if not segs and t_attr is None:
            t = 0
        if segs and t < at:
            raise ValueError(
                f"DASH SegmentTimeline @t={t} overlaps the running "
                f"end {at}"
            )
        for k in range(r + 1):
            segs.append((t + k * d, d))
        at = t + (r + 1) * d
    if not saw_s:
        raise ValueError("DASH SegmentTimeline with no S elements")
    return segs


def parse_mpd(text: str) -> dict:
    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:
        raise ValueError(f"malformed MPD XML: {exc}") from exc
    if _strip_ns(root.tag) != "MPD":
        raise ValueError("not a DASH MPD document")
    if root.get("type", "static") != "static":
        raise NotImplementedError("dynamic (live) DASH manifest")
    dur = root.get("mediaPresentationDuration")
    out: dict = {
        "duration_sec": parse_iso8601_duration(dur) if dur else None,
        "representations": [],
    }
    for period in root:
        if _strip_ns(period.tag) != "Period":
            continue
        for aset in period:
            if _strip_ns(aset.tag) != "AdaptationSet":
                continue
            mime = aset.get("mimeType")
            aset_tpl = next(
                (c for c in aset if _strip_ns(c.tag) == "SegmentTemplate"),
                None,
            )
            for rep in aset:
                if _strip_ns(rep.tag) != "Representation":
                    continue
                entry = {
                    "id": rep.get("id"),
                    "mime": mime,
                    "bandwidth": int(rep.get("bandwidth", 0)),
                    "width": int(rep.get("width", 0)) or None,
                    "height": int(rep.get("height", 0)) or None,
                    "codecs": rep.get("codecs"),
                    "template": None,
                    "segment_list": None,
                }
                tpl = next(
                    (c for c in rep
                     if _strip_ns(c.tag) == "SegmentTemplate"),
                    aset_tpl,
                )
                slist = next(
                    (c for c in rep if _strip_ns(c.tag) == "SegmentList"),
                    None,
                )
                if tpl is not None:
                    tl_el = next(
                        (c for c in tpl
                         if _strip_ns(c.tag) == "SegmentTimeline"),
                        None,
                    )
                    entry["template"] = {
                        "init": tpl.get("initialization"),
                        "media": tpl.get("media"),
                        "start_number": int(tpl.get("startNumber", 1)),
                        "duration": int(tpl.get("duration", 0)),
                        "timescale": int(tpl.get("timescale", 1)),
                        "timeline": _expand_timeline(tl_el)
                        if tl_el is not None
                        else None,
                    }
                elif slist is not None:
                    init_el = next(
                        (c for c in slist
                         if _strip_ns(c.tag) == "Initialization"),
                        None,
                    )
                    urls: list[str] = []
                    for c in slist:
                        if _strip_ns(c.tag) != "SegmentURL":
                            continue
                        if c.get("mediaRange") is not None:
                            # r14 self-review F11: byte-range
                            # addressing within one resource —
                            # unhandled, the whole resource would be
                            # demuxed as one segment (wrong data, no
                            # error)
                            raise NotImplementedError(
                                "DASH SegmentURL@mediaRange"
                            )
                        if c.get("media") is None:
                            raise ValueError(
                                "DASH SegmentURL without @media"
                            )
                        urls.append(c.get("media"))
                    entry["segment_list"] = {
                        "init": init_el.get("sourceURL")
                        if init_el is not None else None,
                        "urls": urls,
                    }
                out["representations"].append(entry)
    if not out["representations"]:
        raise ValueError("MPD with no representations")
    return out


def demux_dash(
    mpd_text: str,
    fetch: dict[str, bytes],
    representation_id: str | None = None,
) -> tuple[dict, list[tuple[int, bytes]]]:
    """Resolve one representation's init + media segment URIs,
    demux through functions/fmp4.py -> (meta, samples). meta gains
    the manifest facts (representation id, bandwidth, declared
    duration)."""
    mpd = parse_mpd(mpd_text)
    reps = mpd["representations"]
    rep = (
        next((r for r in reps if r["id"] == representation_id), None)
        if representation_id is not None
        else reps[0]
    )
    if rep is None:
        raise ValueError(f"representation {representation_id!r} not in MPD")
    if rep["template"] is not None:
        t = rep["template"]
        if not t["init"] or not t["media"]:
            raise ValueError("DASH SegmentTemplate missing fields")
        if t["timeline"] is not None:
            # SegmentTimeline: the segment set IS the timeline — no
            # duration arithmetic; $Time$ gets each S start,
            # $Number$ the startNumber-based index (both legal in
            # one @media per §5.3.9.4.4).
            init_uri = _fill_template(t["init"], rep["id"], None)
            media_uris = [
                _fill_template(
                    t["media"], rep["id"],
                    t["start_number"] + k, time=start,
                )
                for k, (start, _d) in enumerate(t["timeline"])
            ]
            return _demux_resolved(
                mpd, rep, fetch, init_uri, media_uris
            )
        if not t["duration"]:
            raise ValueError("DASH SegmentTemplate missing fields")
        if mpd["duration_sec"] is None:
            raise ValueError(
                "static MPD without mediaPresentationDuration"
            )
        # manifests declare the duration rounded (commonly to ms), so
        # the exact ratio lands NEAR an integer for equal-length
        # segments; snap before ceiling, or a rounded-up declaration
        # manufactures a phantom last segment. The tolerance must
        # cover the declaration's own precision: a %.3f duration is
        # off by up to 0.5 ms, i.e. 0.0005*timescale/duration in ratio
        # units (ADVICE r13: a flat 1%-of-a-segment snap is SMALLER
        # than that for short segments and passes only by float luck).
        ratio = mpd["duration_sec"] * t["timescale"] / t["duration"]
        tol = 0.0005 * t["timescale"] / t["duration"] + 1e-9
        n = round(ratio) if abs(ratio - round(ratio)) <= tol \
            else math.ceil(ratio)
        n = max(1, n)
        init_uri = _fill_template(t["init"], rep["id"], None)
        media_uris = [
            _fill_template(t["media"], rep["id"], t["start_number"] + k)
            for k in range(n)
        ]
    else:
        sl = rep["segment_list"]
        if sl is None or not sl["init"]:
            raise ValueError("DASH representation without segments")
        init_uri, media_uris = sl["init"], sl["urls"]
    return _demux_resolved(mpd, rep, fetch, init_uri, media_uris)


def _demux_resolved(
    mpd: dict,
    rep: dict,
    fetch: dict[str, bytes],
    init_uri: str,
    media_uris: list[str],
) -> tuple[dict, list[tuple[int, bytes]]]:
    missing = [u for u in [init_uri, *media_uris] if u not in fetch]
    if missing:
        raise ValueError(f"DASH segments not fetched: {missing}")
    meta, samples = demux_fmp4(
        fetch[init_uri], [fetch[u] for u in media_uris]
    )
    meta["representation_id"] = rep["id"]
    meta["bandwidth"] = rep["bandwidth"]
    meta["declared_duration_sec"] = mpd["duration_sec"]
    return meta, samples
