"""WebVTT caption parsing (W3C WebVTT, public spec) — stdlib only.

Video-text PAIRS are the training unit of vision-language models; the
caption track is where the text half lives. This module reads the
subset real subtitle corpora use: the WEBVTT magic, optional cue
identifiers, `HH:MM:SS.mmm --> HH:MM:SS.mmm` timings (hours optional),
multi-line cue payloads, and NOTE/STYLE/REGION blocks (skipped).
Malformed input raises ValueError (same per-row fault-isolation
contract as every other parser in functions/).

The builder emits spec-conformant files as test witnesses; cue↔frame
alignment itself is plain timestamp arithmetic done Spark-side by the
caller (suites/multimodal.py:multimodal_video_caption_align).
"""

from __future__ import annotations

import re

_TIME = re.compile(
    r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$"
)


def _parse_ts(s: str) -> int:
    m = _TIME.match(s)
    if not m:
        raise ValueError(f"bad WebVTT timestamp {s!r}")
    hh = int(m.group(1) or 0)
    return ((hh * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


def _fmt_ts(ms: int) -> str:
    if ms < 0:
        raise ValueError("negative WebVTT timestamp")
    s, ms = divmod(ms, 1000)
    m, s = divmod(s, 60)
    h, m = divmod(m, 60)
    return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"


def _check_payload(i: int, text: str) -> None:
    """Shared builder guard (WebVTT and SubRip block models both split
    on blank lines and normalize \r): refuse payloads the parsers
    could not round-trip."""
    if (
        not text
        or text.strip() != text
        or "\r" in text
        or any(not ln.strip() for ln in text.split("\n"))
    ):
        raise ValueError(f"cue {i}: unencodable payload {text!r}")


def split_blocks(lines: list[str]) -> list[list[str]]:
    """Blank-line-separated block splitter shared by the WebVTT and
    SubRip parsers."""
    blocks: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        if ln.strip() == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(ln)
    if cur:
        blocks.append(cur)
    return blocks


def build_vtt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text)] -> a WebVTT document."""
    parts = ["WEBVTT", ""]
    for i, (start, end, text) in enumerate(cues):
        if end <= start:
            raise ValueError(f"cue {i}: end {end} <= start {start}")
        # any whitespace-only line would split the cue at parse time;
        # \r is rejected outright (the parser normalizes it to \n, so
        # it cannot round-trip unchanged)
        _check_payload(i, text)
        parts.append(str(i + 1))
        parts.append(f"{_fmt_ts(start)} --> {_fmt_ts(end)}")
        parts.append(text)
        parts.append("")
    return "\n".join(parts)


def parse_vtt(doc: str) -> list[dict]:
    """WebVTT text -> [{start_ms, end_ms, text}] in file order.

    Accepts optional cue identifiers, optional hours in timestamps,
    space- or tab-separated cue-settings after the end timestamp
    (ignored), multi-line payloads, and NOTE/STYLE/REGION comment
    blocks (a block is a comment only when the keyword stands alone —
    "NOTE_scene_1" is a valid cue identifier, not a comment). Raises
    ValueError for a missing WEBVTT magic, malformed timings, empty
    payloads, or cue start times that go backwards."""
    if doc.startswith("﻿"):
        doc = doc[1:]
    lines = doc.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if not lines or not lines[0].startswith("WEBVTT"):
        raise ValueError("not a WebVTT document (missing WEBVTT magic)")
    # Per the spec the header BLOCK runs from the magic to the first
    # blank line; it may carry metadata lines ("Kind: captions",
    # "Language: en" — the exact form YouTube caption corpora emit).
    # Skip all of them, not just the magic line itself.
    body_start = 1
    while body_start < len(lines) and lines[body_start].strip() != "":
        body_start += 1
    cues: list[dict] = []
    # blank-line-separated blocks, skipping the header block
    blocks = split_blocks(lines[body_start:])
    for block in blocks:
        head = block[0].strip()
        # a comment block is the bare keyword (optionally followed by
        # whitespace-separated text) — "NOTE_scene_1" is a cue id
        kw = head.split(None, 1)[0] if head else ""
        if kw in ("NOTE", "STYLE", "REGION"):
            continue
        idx = 0
        if "-->" not in block[0]:
            idx = 1  # cue identifier line
            if idx >= len(block) or "-->" not in block[idx]:
                raise ValueError(
                    f"WebVTT cue block without timing line: {block[0]!r}"
                )
        timing = block[idx]
        try:
            left, right = timing.split("-->")
        except ValueError as exc:
            raise ValueError(f"bad WebVTT timing line {timing!r}") from exc
        start = _parse_ts(left.strip())
        # space- or tab-separated cue settings may follow the end
        # timestamp; split() handles any whitespace run
        parts = right.split()
        end = _parse_ts(parts[0] if parts else right.strip())
        if end <= start:
            raise ValueError(f"WebVTT cue ends before it starts: {timing!r}")
        if cues and start < cues[-1]["start_ms"]:
            raise ValueError(
                f"WebVTT cue start {start} ms goes backwards "
                f"(previous {cues[-1]['start_ms']} ms)"
            )
        text = "\n".join(block[idx + 1 :])
        if not text:
            raise ValueError(f"WebVTT cue with empty payload: {timing!r}")
        cues.append({"start_ms": start, "end_ms": end, "text": text})
    return cues
