"""DASH MPD manifests (functions/dash.py): ISO 8601 durations,
template filling ($RepresentationID$ / $Number$ / width forms), MPD
parse (template + SegmentList shapes, gates), and end-to-end stitch
through the fMP4 layer."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.dash import (
    _fill_template,
    build_mpd,
    demux_dash,
    parse_iso8601_duration,
    parse_mpd,
)
from articulation_vector_db_api_spark.functions.fmp4 import (
    build_fmp4_mjpeg,
)


def test_iso8601_durations():
    assert parse_iso8601_duration("PT12S") == 12
    assert parse_iso8601_duration("PT12.5S") == 12.5
    assert parse_iso8601_duration("PT1H2M3S") == 3723
    assert parse_iso8601_duration("P1DT1S") == 86401
    assert parse_iso8601_duration("PT4M") == 240
    with pytest.raises(ValueError):
        parse_iso8601_duration("12 seconds")
    with pytest.raises(ValueError):
        parse_iso8601_duration("P")


def test_template_filling():
    assert (
        _fill_template("$RepresentationID$-$Number$.m4s", "v0", 7)
        == "v0-7.m4s"
    )
    assert (
        _fill_template("seg-$Number%05d$.m4s", "v0", 42)
        == "seg-00042.m4s"
    )
    with pytest.raises(NotImplementedError, match="Time"):
        _fill_template("seg-$Time$.m4s", "v0", 1)


def test_parse_mpd_shapes_and_gates():
    mpd = parse_mpd(build_mpd("v0", 3, 6000, 90000, 32, 16))
    assert mpd["duration_sec"] == pytest.approx(0.2)
    rep = mpd["representations"][0]
    assert rep["id"] == "v0" and rep["mime"] == "video/mp4"
    assert rep["template"]["start_number"] == 1
    with pytest.raises(ValueError, match="MPD"):
        parse_mpd("<foo/>")
    with pytest.raises(ValueError, match="malformed"):
        parse_mpd("not xml")
    with pytest.raises(NotImplementedError, match="dynamic"):
        parse_mpd(
            '<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="dynamic"/>'
        )
    seg_list = """<MPD xmlns="urn:mpeg:dash:schema:mpd:2011"
      type="static" mediaPresentationDuration="PT1S"><Period>
      <AdaptationSet mimeType="video/mp4">
      <Representation id="r" bandwidth="1">
      <SegmentList><Initialization sourceURL="i.mp4"/>
      <SegmentURL media="a.m4s"/><SegmentURL media="b.m4s"/>
      </SegmentList></Representation></AdaptationSet></Period></MPD>"""
    rep = parse_mpd(seg_list)["representations"][0]
    assert rep["segment_list"] == {
        "init": "i.mp4", "urls": ["a.m4s", "b.m4s"]
    }


def test_demux_dash_end_to_end():
    segs = [
        [(6000, b"A" * 40), (6000, b"B" * 20)],
        [(6000, b"C" * 30), (6000, b"D" * 10)],
        [(6000, b"E" * 50)],
    ]
    init, media = build_fmp4_mjpeg(segs, 32, 16)
    # 5 samples x 6000 ticks @ 90000 = 0.333s; 3 segments of up to
    # 12000 ticks each -> template duration 12000
    mpd = build_mpd("v0", 3, 12000, 90000, 32, 16)
    fetch = {"v0-init.mp4": init}
    for k, m in enumerate(media):
        fetch[f"v0-{k + 1}.m4s"] = m
    meta, samples = demux_dash(mpd, fetch)
    assert meta["representation_id"] == "v0"
    assert meta["n_fragments"] == 3
    assert [s for _d, s in samples] == [
        s for seg in segs for _d, s in seg
    ]
    with pytest.raises(ValueError, match="not fetched"):
        demux_dash(mpd, {"v0-init.mp4": init})
    with pytest.raises(ValueError, match="not in MPD"):
        demux_dash(mpd, fetch, representation_id="nope")


def test_segment_count_snaps_rounded_durations():
    """A declared duration rounded UP to milliseconds must not
    manufacture a phantom last segment (2 x 4800 ticks @ 90000 =
    0.10666s declares as PT0.107S -> ratio 2.006)."""
    segs = [[(2400, b"A" * 10), (2400, b"B" * 10)],
            [(2400, b"C" * 10), (2400, b"D" * 10)]]
    init, media = build_fmp4_mjpeg(segs, 16, 16)
    mpd = build_mpd("v0", 2, 4800, 90000, 16, 16)
    assert "PT0.107S" in mpd  # the rounding really happened
    fetch = {"v0-init.mp4": init,
             "v0-1.m4s": media[0], "v0-2.m4s": media[1]}
    meta, samples = demux_dash(mpd, fetch)
    assert meta["n_fragments"] == 2 and len(samples) == 4


def test_segment_count_tolerance_covers_declaration_precision():
    """ADVICE r13 (dash.py:208): the snap tolerance must be derived
    from the declaration's ms precision (0.0005*timescale/duration in
    ratio units), not a flat 1% of a segment. 7 x 1500 ticks @ 90000
    = 0.11667s declares as PT0.117S -> ratio 7.02; a 1% snap would
    ceil to 8 and die on a phantom 'segments not fetched'."""
    n = 7
    segs = [[(1500, bytes([k]) * 8)] for k in range(n)]
    init, media = build_fmp4_mjpeg(segs, 16, 16)
    mpd = build_mpd("v0", n, 1500, 90000, 16, 16)
    assert "PT0.117S" in mpd  # the up-rounding really happened
    fetch = {"v0-init.mp4": init}
    for k, m in enumerate(media):
        fetch[f"v0-{k + 1}.m4s"] = m
    meta, samples = demux_dash(mpd, fetch)
    assert meta["n_fragments"] == n and len(samples) == n


def test_segment_timeline_time_addressing():
    """SegmentTimeline + $Time$ (ISO 23009-1 §5.3.9.6): S-run
    expansion with r-repeat, default @t continuation, the $Time%0Nd$
    width form, and variable segment durations that a fixed-duration
    template cannot express."""
    from articulation_vector_db_api_spark.functions.dash import (
        build_mpd_timeline,
    )

    durs = [3000, 3000, 3000, 1500, 4500]
    segs = [[(d, bytes([k]) * 12)] for k, d in enumerate(durs)]
    init, media = build_fmp4_mjpeg(segs, 16, 16)
    mpd = build_mpd_timeline("v0", durs, 90000, 16, 16)
    # equal-duration run really is r-compressed like packagers emit
    assert '<S t="0" d="3000" r="2"/>' in mpd
    tl = parse_mpd(mpd)["representations"][0]["template"]["timeline"]
    assert tl == [
        (0, 3000), (3000, 3000), (6000, 3000), (9000, 1500),
        (10500, 4500),
    ]
    fetch = {"v0-init.mp4": init}
    for (t, _d), blob in zip(tl, media):
        fetch[f"v0-{t}.m4s"] = blob
    meta, samples = demux_dash(mpd, fetch)
    assert meta["n_fragments"] == 5 and len(samples) == 5
    assert [d for d, _ in samples] == durs

    wide = build_mpd_timeline("v0", durs, 90000, 16, 16, time_width=8)
    fetch8 = {"v0-init.mp4": init}
    for (t, _d), blob in zip(tl, media):
        fetch8[f"v0-{t:08d}.m4s"] = blob
    meta8, _ = demux_dash(wide, fetch8)
    assert meta8["n_fragments"] == 5


def test_segment_timeline_gates_and_malformed():
    from articulation_vector_db_api_spark.functions.dash import (
        build_mpd_timeline,
    )

    mpd = build_mpd_timeline("v0", [3000, 3000, 3000, 1500], 90000, 16, 16)
    with pytest.raises(NotImplementedError, match='r="-1"'):
        parse_mpd(mpd.replace('r="2"', 'r="-1"'))
    with pytest.raises(ValueError, match="overlaps"):
        parse_mpd(mpd.replace('<S d="1500"/>', '<S t="10" d="1500"/>'))
    with pytest.raises(ValueError, match="@d"):
        parse_mpd(mpd.replace('<S d="1500"/>', '<S/>'))
    with pytest.raises(ValueError, match="no S"):
        parse_mpd(
            mpd.replace('<S t="0" d="3000" r="2"/>', "")
            .replace('<S d="1500"/>', "")
        )
    # a forward gap (@t past the running end) is a legal discontinuity
    gap = mpd.replace('<S d="1500"/>', '<S t="90000" d="1500"/>')
    tl = parse_mpd(gap)["representations"][0]["template"]["timeline"]
    assert tl[-1] == (90000, 1500)


def test_segmenturl_media_range_gated():
    """r14 self-review F11: SegmentURL@mediaRange addressing is a
    named gate — unchecked, the whole resource was demuxed as one
    segment (wrong data, no error); @media-less SegmentURL raises."""
    mpd = """<?xml version="1.0"?>
<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static"
     mediaPresentationDuration="PT1S">
 <Period><AdaptationSet mimeType="video/mp4">
  <Representation id="v0" bandwidth="1">
   <SegmentList><Initialization sourceURL="i.mp4"/>
    <SegmentURL media="s.m4s" mediaRange="0-499"/>
   </SegmentList>
  </Representation>
 </AdaptationSet></Period></MPD>"""
    with pytest.raises(NotImplementedError, match="mediaRange"):
        parse_mpd(mpd)
    with pytest.raises(ValueError, match="without @media"):
        parse_mpd(mpd.replace(' media="s.m4s" mediaRange="0-499"', ""))


def test_segment_timeline_repeat_bomb_guarded():
    """r14 self-review: a hostile r (up to 2^32) must not materialize
    a billion-tuple timeline before any fetch check."""
    from articulation_vector_db_api_spark.functions.dash import (
        build_mpd_timeline,
    )

    mpd = build_mpd_timeline("v0", [3000, 3000], 90000, 16, 16)
    bomb = mpd.replace('r="1"', 'r="999999999"')
    with pytest.raises(ValueError, match="1e6"):
        parse_mpd(bomb)


def test_template_dollar_escape():
    """r14 review (ISO 23009-1 §5.3.9.4.4): '$$' escapes a literal
    dollar sign — a conformant @media using it must fill, not hit the
    leftover-$ gate."""
    from articulation_vector_db_api_spark.functions.dash import (
        _fill_template,
    )

    assert _fill_template(
        "seg$$-$Number$.m4s", "v0", 7
    ) == "seg$-7.m4s"
    assert _fill_template("a$$$$b-$Time$.m4s", "v0", 1, time=42) == (
        "a$$b-42.m4s"
    )
    with pytest.raises(NotImplementedError, match="Bandwidth"):
        _fill_template("x-$Bandwidth$.m4s", "v0", 1)
