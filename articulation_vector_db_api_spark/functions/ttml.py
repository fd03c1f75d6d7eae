"""TTML / IMSC timed text (W3C TTML1/TTML2) — the broadcast and
streaming-delivery subtitle format (Netflix/IMSC1 interchange, EBU-TT,
DFXP legacy name). It is plain namespaced XML, so stdlib ElementTree
covers it; cues map onto the same (start_ms, end_ms, text) model the
SRT/WebVTT/ASS modules share, completing the subtitle family.

Surface: <p begin end> (and begin+dur) cues anywhere under <body>,
<br/> line breaks, nested inline <span> text, and both TTML time
expression families —
- clock-time  "HH:MM:SS(.fraction)" and "HH:MM:SS:FF" frames (with
  ttp:frameRate, default 30),
- offset-time "N(h|m|s|ms|f|t)" (ticks need ttp:tickRate, default 1).

ValueError for malformed documents (fault-isolation boundary).

Reference behavior parity: the reference (/root/reference/main.py)
has no subtitle path; frontier surface beside srt.py/vtt.py/ass.py.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["parse_ttml", "build_ttml", "ttml_to_vtt"]

_CLOCK = re.compile(r"(\d{2,}):(\d{2}):(\d{2})(?:\.(\d+)|:(\d+))?$")
_OFFSET = re.compile(r"(\d+(?:\.\d+)?)(h|m|s|ms|f|t)$")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


class _TimeCtx:
    """Document-level timing parameters (TTML2 §7.2): nominal frame
    rate, the frameRateMultiplier making it an effective rate (e.g.
    30 x 1000/1001 = NTSC 29.97), tick rate, time base and SMPTE
    drop mode."""

    __slots__ = ("frame_rate", "eff_fps", "tick_rate", "time_base", "drop")

    def __init__(self, frame_rate=30, mult=(1, 1), tick_rate=1,
                 time_base="media", drop="nonDrop"):
        self.frame_rate = frame_rate
        self.eff_fps = frame_rate * mult[0] / mult[1]
        self.tick_rate = tick_rate
        self.time_base = time_base
        self.drop = drop


def _parse_time(s: str, ctx: _TimeCtx) -> int:
    """TTML time expression -> milliseconds of media time."""
    s = s.strip()
    m = _CLOCK.match(s)
    if m:
        h, mi, sec = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if mi >= 60 or sec >= 60:
            raise ValueError(f"TTML clock-time out of range: {s!r}")
        if m.group(5) is not None and ctx.time_base == "smpte":
            # SMPTE timecode (r15 review, VERDICT r14 item 2 named
            # seam): HH:MM:SS:FF is a FRAME COUNT; drop modes remove
            # frame NUMBERS (not frames) — dropNTSC drops 2 per
            # minute except every 10th, dropPAL drops 4 (SMPTE 12M).
            fr = int(m.group(5))
            if fr >= ctx.frame_rate:
                raise ValueError(
                    f"TTML frame count {fr} >= frameRate {ctx.frame_rate}"
                )
            minutes = h * 60 + mi
            total = ((minutes * 60) + sec) * ctx.frame_rate + fr
            per_min = {"dropNTSC": 2, "dropPAL": 4}.get(ctx.drop, 0)
            total -= per_min * (minutes - minutes // 10)
            return round(total * 1000 / ctx.eff_fps)
        ms = 0
        if m.group(4) is not None:  # .fraction
            frac = m.group(4)[:3].ljust(3, "0")
            ms = int(frac)
        elif m.group(5) is not None:  # :frames (media time base)
            fr = int(m.group(5))
            if fr >= ctx.frame_rate:
                raise ValueError(
                    f"TTML frame count {fr} >= frameRate {ctx.frame_rate}"
                )
            ms = round(fr * 1000 / ctx.eff_fps)
        return ((h * 60 + mi) * 60 + sec) * 1000 + ms
    m = _OFFSET.match(s)
    if m:
        v = float(m.group(1))
        unit = m.group(2)
        scale = {
            "h": 3600_000.0,
            "m": 60_000.0,
            "s": 1000.0,
            "ms": 1.0,
            "f": 1000.0 / ctx.eff_fps,
            "t": 1000.0 / ctx.tick_rate,
        }[unit]
        return round(v * scale)
    raise ValueError(f"not a TTML time expression: {s!r}")


_XML_SPACE = "{http://www.w3.org/XML/1998/namespace}space"
_WS_RUN = re.compile(r"[ \t\r\n]+")


def _cue_text(p: ET.Element, space: str = "default") -> str:
    """Inline text of one cue. ``xml:space`` (r15 review, VERDICT r14
    item 2 named seam): the TTML default collapses whitespace runs —
    pretty-printed documents otherwise leak their indentation into
    every cue. ``preserve`` keeps raw text; <br/> is always a hard
    line break. The attribute is inheritable and may be overridden on
    any nested span."""
    parts: list[tuple[str, str]] = []  # (text, effective xml:space)

    def add(text: str | None, mode: str) -> None:
        if text:
            parts.append((text, mode))

    add(p.text, space)

    def walk(el: ET.Element, mode: str) -> None:
        for child in el:
            cmode = child.get(_XML_SPACE, mode)
            if _local(child.tag) == "br":
                parts.append(("\x00", "preserve"))
            else:
                add(child.text, cmode)
                walk(child, cmode)
            add(child.tail, mode)

    walk(p, space)
    # merge CONSECUTIVE default-mode parts before collapsing: 'foo '
    # + '\\n bar' must become 'foo bar', not 'foo  bar' — whitespace
    # runs cross node boundaries in XML (r15 review)
    merged: list[tuple[str, str]] = []
    for t, m in parts:
        if merged and m != "preserve" and merged[-1][1] != "preserve":
            merged[-1] = (merged[-1][0] + t, m)
        else:
            merged.append((t, m))
    out = "".join(
        t if m == "preserve" else _WS_RUN.sub(" ", t)
        for t, m in merged
    )
    if space != "preserve":
        out = re.sub(r" ?\x00 ?", "\x00", out).strip()
    return out.replace("\x00", "\n")


def parse_ttml(doc: str | bytes) -> list[dict]:
    """TTML text -> [{start_ms, end_ms, text}] in document order."""
    if isinstance(doc, (bytes, bytearray, memoryview)):
        doc = bytes(doc).decode("utf-8", "replace")
    try:
        root = ET.fromstring(doc)
    except ET.ParseError as exc:
        raise ValueError(f"malformed TTML XML: {exc}") from exc
    if _local(root.tag) != "tt":
        raise ValueError("not a TTML document (root is not <tt>)")
    frame_rate = tick_rate = None
    mult = (1, 1)
    time_base = "media"
    drop = "nonDrop"
    for k, v in root.attrib.items():
        lk = _local(k)
        if lk == "frameRate":
            frame_rate = int(v)
        elif lk == "tickRate":
            tick_rate = int(v)
        elif lk == "frameRateMultiplier":
            try:
                num, den = (int(x) for x in v.split())
            except ValueError as exc:
                raise ValueError(
                    f"TTML frameRateMultiplier not 'num den': {v!r}"
                ) from exc
            if num <= 0 or den <= 0:
                raise ValueError("TTML frameRateMultiplier must be positive")
            mult = (num, den)
        elif lk == "timeBase":
            time_base = v
        elif lk == "dropMode":
            if v not in ("nonDrop", "dropNTSC", "dropPAL"):
                raise ValueError(f"TTML unknown dropMode: {v!r}")
            drop = v
    if time_base == "clock":
        raise NotImplementedError(
            "TTML timeBase='clock' (wall-clock UTC/GPS alignment) has "
            "no media timeline to map cues onto"
        )
    if time_base not in ("media", "smpte"):
        raise ValueError(f"TTML unknown timeBase: {time_base!r}")
    frame_rate = frame_rate or 30
    tick_rate = tick_rate or 1
    if frame_rate <= 0 or tick_rate <= 0:
        raise ValueError("TTML frameRate/tickRate must be positive")
    ctx = _TimeCtx(frame_rate, mult, tick_rate, time_base, drop)
    body = next(
        (el for el in root.iter() if _local(el.tag) == "body"), None
    )
    if body is None:
        raise ValueError("TTML document without <body>")
    # xml:space inherits element-to-element; ET has no parent links,
    # so carry it down an explicit stack walk
    cues: list[dict] = []
    root_space = root.get(_XML_SPACE, "default")

    def descend(el: ET.Element, space: str) -> None:
        for child in el:
            cspace = child.get(_XML_SPACE, space)
            if _local(child.tag) == "p":
                begin = child.get("begin")
                if begin is None:
                    raise ValueError("TTML <p> cue without begin")
                start = _parse_time(begin, ctx)
                end_attr = child.get("end")
                dur_attr = child.get("dur")
                if end_attr is not None:
                    end = _parse_time(end_attr, ctx)
                elif dur_attr is not None:
                    end = start + _parse_time(dur_attr, ctx)
                else:
                    raise ValueError("TTML <p> cue without end or dur")
                if end <= start:
                    raise ValueError("TTML cue ends before it starts")
                cues.append(
                    {
                        "start_ms": start,
                        "end_ms": end,
                        "text": _cue_text(child, cspace),
                    }
                )
            else:
                descend(child, cspace)

    descend(body, body.get(_XML_SPACE, root_space))
    return cues


def _fmt_clock(ms: int) -> str:
    h, rem = divmod(ms, 3600_000)
    mi, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{mi:02d}:{s:02d}.{frac:03d}"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def build_ttml(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text)] -> a minimal conformant TTML
    document (clock-time with ms fractions, <br/> for line breaks)."""
    body = []
    for start, end, text in cues:
        if end <= start:
            raise ValueError("TTML cue ends before it starts")
        inner = "<br/>".join(
            _xml_escape(ln) for ln in text.split("\n")
        )
        body.append(
            f'   <p begin="{_fmt_clock(start)}" '
            f'end="{_fmt_clock(end)}">{inner}</p>\n'
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<tt xmlns="http://www.w3.org/ns/ttml" xml:lang="en">\n'
        " <body>\n  <div>\n"
        + "".join(body)
        + "  </div>\n </body>\n</tt>\n"
    )


def ttml_to_vtt(doc: str | bytes) -> str:
    """Lossless conversion into the shared cue model (WebVTT)."""
    from .vtt import build_vtt

    return build_vtt(
        [
            (c["start_ms"], c["end_ms"], c["text"])
            for c in parse_ttml(doc)
        ]
    )
