"""TTML/IMSC subtitles (functions/ttml.py): both time-expression
families, builder roundtrip, nested spans and <br/>, frame/tick
rates, conversion to WebVTT, fuzz, and the error contract."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.ttml import (
    _parse_time,
    build_ttml,
    parse_ttml,
    ttml_to_vtt,
)

CUES = [
    (0, 2340, "Transfer credits apply."),
    (2500, 5000, "Two lines\nof dialogue & <markup>"),
    (5000, 9990, "plain tail"),
]


def test_time_expressions():
    assert _parse_time("00:00:00.000", 30, 1) == 0
    assert _parse_time("01:02:03.450", 30, 1) == 3723450
    assert _parse_time("00:00:01", 30, 1) == 1000
    # frames form with explicit frameRate
    assert _parse_time("00:00:02:12", 24, 1) == 2500
    # offset-time family
    assert _parse_time("12.5s", 30, 1) == 12500
    assert _parse_time("300ms", 30, 1) == 300
    assert _parse_time("2m", 30, 1) == 120000
    assert _parse_time("1.5h", 30, 1) == 5400000
    assert _parse_time("48f", 24, 1) == 2000
    assert _parse_time("500t", 30, 1000) == 500
    for bad in ("x", "00:61:00.0", "00:00:00:30", "5q"):
        with pytest.raises(ValueError):
            _parse_time(bad, 30, 1)


def test_build_parse_roundtrip():
    cues = parse_ttml(build_ttml(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == CUES


def test_real_world_shapes():
    doc = """<?xml version="1.0"?>
<tt xmlns="http://www.w3.org/ns/ttml"
    xmlns:ttp="http://www.w3.org/ns/ttml#parameter"
    ttp:frameRate="25" ttp:tickRate="10000000">
 <head><styling/></head>
 <body><div>
  <p begin="00:00:01:05" end="00:00:02:00">frame <span>timed</span></p>
  <p begin="3s" dur="1500ms">offset with <br/>break</p>
  <p begin="50000000t" end="60000000t">tick timed</p>
 </div></body></tt>"""
    cues = parse_ttml(doc)
    assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
        (1200, 2000), (3000, 4500), (5000, 6000),
    ]
    assert cues[0]["text"] == "frame timed"
    assert cues[1]["text"] == "offset with \nbreak"


def test_vtt_conversion():
    from articulation_vector_db_api_spark.functions.vtt import parse_vtt

    vtt = ttml_to_vtt(build_ttml(CUES))
    got = [
        (c["start_ms"], c["end_ms"], c["text"])
        for c in parse_vtt(vtt)
    ]
    assert got == CUES


def test_error_contract_and_fuzz():
    with pytest.raises(ValueError, match="not a TTML"):
        parse_ttml("<html/>")
    with pytest.raises(ValueError, match="malformed"):
        parse_ttml("<tt")
    with pytest.raises(ValueError, match="without <body>"):
        parse_ttml('<tt xmlns="http://www.w3.org/ns/ttml"/>')
    with pytest.raises(ValueError, match="without begin"):
        parse_ttml(
            '<tt xmlns="x"><body><p end="1s">a</p></body></tt>'
        )
    with pytest.raises(ValueError, match="without end or dur"):
        parse_ttml('<tt xmlns="x"><body><p begin="1s">a</p></body></tt>')
    with pytest.raises(ValueError, match="ends before"):
        parse_ttml(
            '<tt xmlns="x"><body><p begin="2s" end="1s">a</p></body></tt>'
        )
    with pytest.raises(ValueError, match="ends before"):
        build_ttml([(5, 5, "x")])
    # mutation fuzz: ValueError only
    import hashlib

    base = build_ttml(CUES).encode()
    for k in range(120):
        h = hashlib.sha256(f"ttml:{k}".encode()).digest()
        pos = int.from_bytes(h[:4], "big") % len(base)
        b = bytearray(base)
        if h[4] % 3 == 0:
            b[pos] ^= h[5] or 1
        elif h[4] % 3 == 1:
            b = b[:pos]
        else:
            b[pos:pos] = h[5 : 5 + (h[6] % 6) + 1]
        try:
            parse_ttml(bytes(b))
        except (ValueError, NotImplementedError):
            pass
