"""ASS/SSA subtitles (Sub Station Alpha v4 / Advanced SSA v4+) —
build + parse + lossless conversion to the shared cue model. The
dominant subtitle format of fansub/anime corpora, i.e. a large slice
of real video-text training pairs; the format is an INI-style text
layout documented publicly (the TCax/Aegisub spec).

Parsed surface: [Script Info] headers, [V4+ Styles]/[V4 Styles]
(skipped — styling, not content), [Events] with its Format: line
driving field order, Dialogue: events (Comment:/Picture:/Sound:
lines skip — they are not displayed text). Timestamps are
H:MM:SS.cc (centiseconds). Text post-processing for the cue model:
override blocks ``{\\...}`` strip, ``\\N``/``\\n`` become newlines,
``\\h`` becomes a hard space — the standard extraction semantics.

Raises ValueError for structurally broken documents (missing
[Events], missing Format:, field-count mismatches, bad timestamps,
end <= start) — the same exception contract as srt.py/vtt.py.
"""

from __future__ import annotations

import re

__all__ = ["build_ass", "parse_ass", "ass_to_vtt", "ass_text_clean"]

_TS = re.compile(r"^(\d+):([0-5]?\d):([0-5]?\d)\.(\d{2})$")


def _parse_ts(s: str) -> int:
    m = _TS.match(s.strip())
    if not m:
        raise ValueError(f"bad ASS timestamp {s!r}")
    h, mi, sec, cs = (int(g) for g in m.groups())
    return ((h * 60 + mi) * 60 + sec) * 1000 + cs * 10


def _fmt_ts(ms: int) -> str:
    if ms < 0:
        raise ValueError("negative ASS timestamp")
    cs = (ms // 10) % 100
    s = ms // 1000
    return f"{s // 3600}:{s // 60 % 60:02d}:{s % 60:02d}.{cs:02d}"


def ass_text_clean(text: str) -> str:
    """Dialogue text -> displayed text: strip {\\...} override blocks,
    \\N and \\n -> newline, \\h -> non-breaking space."""
    text = re.sub(r"\{[^}]*\}", "", text)
    return (
        text.replace("\\N", "\n").replace("\\n", "\n")
        .replace("\\h", " ")
    )


def build_ass(cues: list[tuple[int, int, str]], title: str = "") -> str:
    """[(start_ms, end_ms, text)] -> a minimal conformant ASS
    document (v4+ Events with the standard 10-field Format)."""
    lines = [
        "[Script Info]",
        f"Title: {title or 'engine witness'}",
        "ScriptType: v4.00+",
        "",
        "[Events]",
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, "
        "MarginV, Effect, Text",
    ]
    for start, end, text in cues:
        if end <= start:
            raise ValueError("ASS cue ends before it starts")
        body = text.replace("\n", "\\N")
        lines.append(
            f"Dialogue: 0,{_fmt_ts(start)},{_fmt_ts(end)},Default,,"
            f"0,0,0,,{body}"
        )
    return "\n".join(lines) + "\n"


def parse_ass(doc: str) -> list[dict]:
    """ASS/SSA text -> [{start_ms, end_ms, text, style, name}] in
    file order, text cleaned to displayed form."""
    if doc.startswith("﻿"):
        doc = doc[1:]
    lines = doc.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    section = None
    fields: list[str] | None = None
    cues: list[dict] = []
    saw_events = False
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith(";"):
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1].strip().lower()
            if section == "events":
                saw_events = True
                fields = None
            continue
        if section != "events":
            continue
        # Partition on the UNstripped line: the Text field runs to the
        # end of the line, and trailing whitespace there is content
        # (ADVICE r13: 'hello world  ' must round-trip verbatim or the
        # oracle's cleaned_lossless pin flips).
        key, _, rest = raw.lstrip().rstrip("\r\n").partition(":")
        key = key.strip().lower()
        if key == "format":
            fields = [f.strip().lower() for f in rest.split(",")]
            if "start" not in fields or "end" not in fields \
                    or "text" not in fields:
                raise ValueError(
                    "ASS Events Format lacks Start/End/Text"
                )
            continue
        if key in ("comment", "picture", "sound", "movie", "command"):
            continue  # non-displayed event classes
        if key != "dialogue":
            continue
        if fields is None:
            raise ValueError("ASS Dialogue before the Format line")
        # Text is the LAST field and may contain commas: split n-1
        vals = rest.split(",", len(fields) - 1)
        if len(vals) != len(fields):
            raise ValueError(
                f"ASS Dialogue field count {len(vals)} != "
                f"{len(fields)}"
            )
        row = {f: v for f, v in zip(fields, vals)}
        start = _parse_ts(row["start"])
        end = _parse_ts(row["end"])
        if end <= start:
            raise ValueError("ASS cue ends before it starts")
        cues.append(
            {
                "start_ms": start,
                "end_ms": end,
                "text": ass_text_clean(row["text"]),
                "style": row.get("style", "").strip(),
                "name": row.get("name", "").strip(),
            }
        )
    if not saw_events:
        raise ValueError("not an ASS document (no [Events] section)")
    return cues


def ass_to_vtt(doc: str) -> str:
    """Lossless conversion into the shared cue model (WebVTT); note
    ASS timestamps are centisecond-granular, so the VTT milliseconds
    always end in 0."""
    from .vtt import build_vtt

    return build_vtt(
        [(c["start_ms"], c["end_ms"], c["text"]) for c in parse_ass(doc)]
    )
