"""SubRip captions (functions/srt.py): roundtrips, real-world quirks
(BOM, CRLF, coordinate extension), lossless SRT<->VTT conversion,
malformed-input errors, and the mutation-fuzz contract."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.srt import (
    build_srt,
    parse_srt,
    srt_to_vtt,
    vtt_cues_to_srt,
)

CUES = [
    (0, 1400, "First line\nsecond line"),
    (1400, 3650, "Short cue"),
    (4000, 3_600_000 + 4200, "An hour later"),
]


def test_build_parse_roundtrip():
    cues = parse_srt(build_srt(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == CUES
    assert [c["index"] for c in cues] == [1, 2, 3]


def test_real_world_quirks():
    doc = build_srt(CUES)
    # BOM + CRLF + coordinate extension after the end timestamp
    crlf = "﻿" + doc.replace("\n", "\r\n").replace(
        "00:00:00,000 --> 00:00:01,400",
        "00:00:00,000 --> 00:00:01,400 X1:63 X2:223 Y1:43 Y2:58",
    )
    cues = parse_srt(crlf)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == CUES


def test_srt_vtt_conversion_lossless():
    from articulation_vector_db_api_spark.functions.vtt import parse_vtt

    doc = build_srt(CUES)
    vtt = srt_to_vtt(doc)
    assert vtt.startswith("WEBVTT")
    assert [
        (c["start_ms"], c["end_ms"], c["text"]) for c in parse_vtt(vtt)
    ] == CUES
    back = vtt_cues_to_srt(vtt)
    assert [
        (c["start_ms"], c["end_ms"], c["text"]) for c in parse_srt(back)
    ] == CUES
    # comma vs dot millisecond separators are format-specific
    assert "00:00:01,400" in back and "00:00:01.400" in vtt


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="no cue blocks"):
        parse_srt("\n\n\n")
    with pytest.raises(ValueError, match="counter not numeric"):
        parse_srt("one\n00:00:00,000 --> 00:00:01,000\nhi\n")
    with pytest.raises(ValueError, match="timestamp"):
        parse_srt("1\n00:00:00.000 --> 00:00:01,000\nhi\n")  # dot: VTT
    with pytest.raises(ValueError, match="ends before"):
        parse_srt("1\n00:00:02,000 --> 00:00:01,000\nhi\n")
    with pytest.raises(ValueError, match="goes backwards"):
        parse_srt(
            "1\n00:00:05,000 --> 00:00:06,000\na\n\n"
            "2\n00:00:01,000 --> 00:00:02,000\nb\n"
        )
    with pytest.raises(ValueError, match="empty payload"):
        parse_srt("1\n00:00:00,000 --> 00:00:01,000\n")
    with pytest.raises(ValueError, match="at least one"):
        build_srt([])
    with pytest.raises(ValueError, match="unencodable"):
        build_srt([(0, 1, "a\n\nb")])


def test_fuzz_srt_contract():
    from tests.test_fuzz_contracts import _assert_contract

    doc = build_srt(CUES).encode()
    _assert_contract(
        "srt", doc,
        lambda b: parse_srt(b.decode("utf-8", errors="replace")),
        n=100,
    )
