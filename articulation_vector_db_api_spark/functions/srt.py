"""SubRip (.srt) caption parsing — stdlib only.

SubRip is the other dominant subtitle format in video corpora next to
WebVTT (functions/vtt.py): numbered cues, `HH:MM:SS,mmm -->
HH:MM:SS,mmm` timings (COMMA millisecond separator, hours mandatory),
multi-line payloads, blank-line-separated blocks, frequent UTF-8 BOM
and CRLF line endings. There is no IETF/W3C spec; the format is the
de-facto one SubRip/ffmpeg/VLC read, which is what this module
implements. Malformed input raises ValueError (the same per-row
fault-isolation contract as every parser in functions/).

`srt_to_vtt` / `vtt_cues_to_srt` convert losslessly between the two
formats' shared cue model, so a curation pipeline can normalize a
mixed subtitle corpus onto one representation before alignment
(suites/multimodal.py pairs cues with video frames and audio sample
ranges for VLM/ASR training units).

Reference behavior parity: the reference (/root/reference/main.py) is
PDF-only; subtitle handling is engine frontier surface.
"""

from __future__ import annotations

import re

from .vtt import _check_payload, split_blocks

_TIME = re.compile(r"^(\d{1,3}):([0-5]\d):([0-5]\d),(\d{3})$")


def _parse_ts(s: str) -> int:
    m = _TIME.match(s)
    if not m:
        raise ValueError(f"bad SubRip timestamp {s!r}")
    return (
        (int(m.group(1)) * 60 + int(m.group(2))) * 60 + int(m.group(3))
    ) * 1000 + int(m.group(4))


def _fmt_ts(ms: int) -> str:
    if ms < 0:
        raise ValueError("negative SubRip timestamp")
    s, ms = divmod(ms, 1000)
    m, s = divmod(s, 60)
    h, m = divmod(m, 60)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def build_srt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text)] -> a SubRip document."""
    parts = []
    for i, (start, end, text) in enumerate(cues):
        if end <= start:
            raise ValueError(f"cue {i}: end {end} <= start {start}")
        # shared with WebVTT: same block model, same round-trip rules
        _check_payload(i, text)
        parts.append(str(i + 1))
        parts.append(f"{_fmt_ts(start)} --> {_fmt_ts(end)}")
        parts.append(text)
        parts.append("")
    if not parts:
        raise ValueError("SubRip document needs at least one cue")
    return "\n".join(parts)


def parse_srt(doc: str) -> list[dict]:
    """SubRip text -> [{index, start_ms, end_ms, text}] in file order.

    Accepts a UTF-8 BOM, CRLF/CR line endings, the optional
    coordinate extension after the end timestamp (``X1:.. X2:..`` —
    ignored, as players do), and multi-line payloads. Raises
    ValueError for missing/non-numeric cue counters, malformed
    timings, empty payloads, or cue starts that go backwards."""
    if doc.startswith("﻿"):
        doc = doc[1:]
    lines = doc.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    blocks = split_blocks(lines)
    if not blocks:
        raise ValueError("not a SubRip document (no cue blocks)")
    cues: list[dict] = []
    for block in blocks:
        if len(block) < 2:
            raise ValueError(f"SubRip cue block too short: {block[0]!r}")
        counter = block[0].strip()
        if not counter.isdigit():
            raise ValueError(f"SubRip cue counter not numeric: {counter!r}")
        timing = block[1].strip()
        try:
            left, right = timing.split("-->")
        except ValueError as exc:
            raise ValueError(f"bad SubRip timing line {timing!r}") from exc
        start = _parse_ts(left.strip())
        parts = right.split()  # coordinate extension may follow
        if not parts:
            raise ValueError(f"bad SubRip timing line {timing!r}")
        end = _parse_ts(parts[0])
        if end <= start:
            raise ValueError(f"SubRip cue ends before it starts: {timing!r}")
        if cues and start < cues[-1]["start_ms"]:
            raise ValueError(
                f"SubRip cue start {start} ms goes backwards "
                f"(previous {cues[-1]['start_ms']} ms)"
            )
        text = "\n".join(block[2:])
        if not text:
            raise ValueError(f"SubRip cue with empty payload: {timing!r}")
        cues.append(
            {"index": int(counter), "start_ms": start, "end_ms": end,
             "text": text}
        )
    return cues


def srt_to_vtt(doc: str) -> str:
    """Losslessly convert a SubRip document to WebVTT (the shared cue
    model: start/end/text; SubRip counters become WebVTT cue ids)."""
    from .vtt import build_vtt

    return build_vtt(
        [(c["start_ms"], c["end_ms"], c["text"]) for c in parse_srt(doc)]
    )


def vtt_cues_to_srt(doc: str) -> str:
    """Losslessly convert a WebVTT document to SubRip."""
    from .vtt import parse_vtt

    return build_srt(
        [(c["start_ms"], c["end_ms"], c["text"]) for c in parse_vtt(doc)]
    )
