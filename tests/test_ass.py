"""ASS/SSA subtitles (functions/ass.py): timestamp codec, build/parse
roundtrip, override-block stripping and escape semantics, Format-
driven field order, non-dialogue event skipping, conversion to VTT,
and the error contract."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.ass import (
    _fmt_ts,
    _parse_ts,
    ass_text_clean,
    ass_to_vtt,
    build_ass,
    parse_ass,
)

CUES = [
    (0, 2340, "Transfer credits apply."),
    (2500, 5000, "Two lines\nof dialogue, with commas"),
    (5000, 9990, "plain tail"),
]


def test_timestamp_codec():
    assert _parse_ts("0:00:00.00") == 0
    assert _parse_ts("1:02:03.45") == 3723450
    assert _fmt_ts(3723450) == "1:02:03.45"
    for ms in (0, 10, 2340, 3723450, 35999990):
        assert _parse_ts(_fmt_ts(ms)) == ms
    with pytest.raises(ValueError):
        _parse_ts("00:00:00,000")  # SRT form
    with pytest.raises(ValueError):
        _parse_ts("0:61:00.00")


def test_build_parse_roundtrip():
    cues = parse_ass(build_ass(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == CUES


def test_override_blocks_and_escapes():
    assert ass_text_clean(r"{\i1}Hello{\i0} there\Nworld\hx") == (
        "Hello there\nworld x"  # \h = hard (non-breaking) space
    )
    doc = build_ass([(0, 1000, "x")]).replace(
        ",,0,0,0,,x", ",,0,0,0,,{\\pos(10,20)}styled\\Ntext"
    )
    assert parse_ass(doc)[0]["text"] == "styled\ntext"


def test_format_driven_field_order_and_event_classes():
    doc = (
        "[Script Info]\nTitle: t\n\n[Events]\n"
        "Format: Start, End, Text\n"
        "Comment: 0:00:00.00,0:00:01.00,not shown\n"
        "Dialogue: 0:00:01.00,0:00:02.00,first, with comma\n"
        "Sound: 0:00:02.00,0:00:03.00,beep.wav\n"
        "Dialogue: 0:00:03.50,0:00:04.00,second\n"
    )
    cues = parse_ass(doc)
    assert [(c["start_ms"], c["text"]) for c in cues] == [
        (1000, "first, with comma"),
        (3500, "second"),
    ]


def test_to_vtt_conversion():
    from articulation_vector_db_api_spark.functions.vtt import parse_vtt

    got = parse_vtt(ass_to_vtt(build_ass(CUES)))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == CUES


def test_error_contract():
    with pytest.raises(ValueError, match="Events"):
        parse_ass("[Script Info]\nTitle: x\n")
    with pytest.raises(ValueError, match="before the Format"):
        parse_ass("[Events]\nDialogue: 0,0:00:00.00,0:00:01.00,,x\n")
    with pytest.raises(ValueError, match="field count"):
        parse_ass(
            "[Events]\nFormat: Start, End, Style, Text\n"
            "Dialogue: 0:00:00.00,0:00:01.00,x\n"
        )
    with pytest.raises(ValueError, match="ends before"):
        build_ass([(1000, 1000, "x")])
    with pytest.raises(ValueError, match="Start/End/Text"):
        parse_ass("[Events]\nFormat: Layer, Style\n")


def test_trailing_whitespace_in_text_is_content():
    """ADVICE r13 (ass.py:89): the Text field runs to the end of the
    line, so trailing whitespace there is content — build->parse must
    be lossless or the oracle's cleaned_lossless pin flips."""
    cues = [(0, 1000, "hello world  "), (1000, 2000, " lead and trail\t")]
    parsed = parse_ass(build_ass(cues))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in parsed] == cues
    # A hand-written document with trailing spaces parses verbatim too.
    doc = (
        "[Events]\n"
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, "
        "MarginV, Effect, Text\n"
        "Dialogue: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,padded  \n"
    )
    assert parse_ass(doc)[0]["text"] == "padded  "
