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


def _parse_time(s: str, frame_rate: int, tick_rate: int) -> int:
    """TTML time expression -> milliseconds."""
    s = s.strip()
    m = _CLOCK.match(s)
    if m:
        h, mi, sec = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if mi >= 60 or sec >= 60:
            raise ValueError(f"TTML clock-time out of range: {s!r}")
        ms = 0
        if m.group(4) is not None:  # .fraction
            frac = m.group(4)[:3].ljust(3, "0")
            ms = int(frac)
        elif m.group(5) is not None:  # :frames
            fr = int(m.group(5))
            if fr >= frame_rate:
                raise ValueError(
                    f"TTML frame count {fr} >= frameRate {frame_rate}"
                )
            ms = round(fr * 1000 / frame_rate)
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
            "f": 1000.0 / frame_rate,
            "t": 1000.0 / tick_rate,
        }[unit]
        return round(v * scale)
    raise ValueError(f"not a TTML time expression: {s!r}")


def _cue_text(p: ET.Element) -> str:
    parts: list[str] = []
    if p.text:
        parts.append(p.text)

    def walk(el: ET.Element) -> None:
        for child in el:
            if _local(child.tag) == "br":
                parts.append("\n")
            else:
                if child.text:
                    parts.append(child.text)
                walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(p)
    return "".join(parts)


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
    for k, v in root.attrib.items():
        if _local(k) == "frameRate":
            frame_rate = int(v)
        elif _local(k) == "tickRate":
            tick_rate = int(v)
    frame_rate = frame_rate or 30
    tick_rate = tick_rate or 1
    if frame_rate <= 0 or tick_rate <= 0:
        raise ValueError("TTML frameRate/tickRate must be positive")
    body = next(
        (el for el in root.iter() if _local(el.tag) == "body"), None
    )
    if body is None:
        raise ValueError("TTML document without <body>")
    cues: list[dict] = []
    for p in body.iter():
        if _local(p.tag) != "p":
            continue
        begin = p.get("begin")
        if begin is None:
            raise ValueError("TTML <p> cue without begin")
        start = _parse_time(begin, frame_rate, tick_rate)
        end_attr = p.get("end")
        dur_attr = p.get("dur")
        if end_attr is not None:
            end = _parse_time(end_attr, frame_rate, tick_rate)
        elif dur_attr is not None:
            end = start + _parse_time(dur_attr, frame_rate, tick_rate)
        else:
            raise ValueError("TTML <p> cue without end or dur")
        if end <= start:
            raise ValueError("TTML cue ends before it starts")
        cues.append(
            {"start_ms": start, "end_ms": end, "text": _cue_text(p)}
        )
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
