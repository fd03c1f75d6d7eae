"""WebVTT parser/builder contract (functions/vtt.py)."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.vtt import (
    build_vtt,
    parse_vtt,
)


def test_roundtrip_and_hours():
    cues = [(0, 180, "hello world"), (200, 380, "two words"),
            (3_600_400, 3_600_580, "after an hour")]
    out = parse_vtt(build_vtt(cues))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in out] == cues


def test_optional_parts_accepted():
    doc = (
        "WEBVTT - some header text\n\n"
        "NOTE a comment block\nspanning lines\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "my-cue-id\n00:01.000 --> 00:02.500 align:start line:0\n"
        "payload line one\npayload line two\n"
    )
    (cue,) = parse_vtt(doc)
    assert cue["start_ms"] == 1000 and cue["end_ms"] == 2500
    assert cue["text"] == "payload line one\npayload line two"


def test_header_metadata_block_skipped():
    """r10 ADVICE: lines between WEBVTT and the first blank line are
    header metadata (the form YouTube caption corpora emit), not a cue
    block — they must be skipped, not rejected."""
    doc = (
        "WEBVTT\nKind: captions\nLanguage: en\n\n"
        "00:00:01.000 --> 00:00:02.000\nhello\n"
    )
    (cue,) = parse_vtt(doc)
    assert cue["start_ms"] == 1000 and cue["text"] == "hello"


def test_crlf_and_bom():
    doc = "﻿WEBVTT\r\n\r\n00:00.000 --> 00:01.000\r\nx\r\n"
    assert parse_vtt(doc)[0]["text"] == "x"


def test_malformed_raise_value_error():
    bads = [
        "JUNK\n\n00:00.000 --> 00:01.000\nx",          # no magic
        "WEBVTT\n\n00:02.000 --> 00:01.000\nx",         # ends before start
        "WEBVTT\n\nid\nno timing here\nx",              # id without timing
        "WEBVTT\n\n00:00.000 --> 00:01.000\n",          # empty payload
        "WEBVTT\n\n0:0.0 --> 00:01.000\nx",             # bad timestamp
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            parse_vtt(bad)


def test_builder_rejects_bad_cues():
    with pytest.raises(ValueError):
        build_vtt([(100, 100, "x")])
    with pytest.raises(ValueError):
        build_vtt([(0, 100, "")])
    with pytest.raises(ValueError):
        build_vtt([(0, 100, "a\n\nb")])  # blank line would split the cue


def test_fuzz_vtt_contract():
    from tests.test_fuzz_contracts import _assert_contract

    doc = build_vtt([(0, 180, "hello world"), (200, 380, "second cue")])
    _assert_contract(
        "vtt", doc.encode(), lambda b: parse_vtt(b.decode("utf-8", "replace"))
    )


def test_review_findings_round10():
    """Pins for the r10 self-review findings: NOTE_-prefixed cue ids
    are cues (not comments), tab-separated cue settings parse,
    whitespace-only payload lines are builder-rejected, and backwards
    cue starts raise."""
    (cue,) = parse_vtt(
        "WEBVTT\n\nNOTE_scene_1\n00:00:00.000 --> 00:00:01.000\nhello\n"
    )
    assert cue["text"] == "hello"
    (cue,) = parse_vtt(
        "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\tline:0 align:start\nx\n"
    )
    assert cue["end_ms"] == 1000
    with pytest.raises(ValueError, match="unencodable"):
        build_vtt([(0, 1000, "a\n \nb")])
    with pytest.raises(ValueError, match="backwards"):
        parse_vtt(
            "WEBVTT\n\n00:00:05.000 --> 00:00:06.000\nb\n\n"
            "00:00:01.000 --> 00:00:02.000\na\n"
        )
