"""Pin the driver-window seating policy (VERDICT r12 item 7, r13 item 1).

The 50-seat CORRECTNESS window must be: explicit pins (which MUST
include every never-driver-contacted query) followed by the stalest
driver-contacted rows in ``(latest_round, name)`` order. The policy is
implemented once in ``tools/rotate_window.compute_window``; this test
asserts the registry's hand-maintained ``_WINDOW_FIRST``/
``_WINDOW_RESEAT`` tuples reproduce it exactly, so a future round
cannot silently regress to re-rotating fresh rows while stale rows age.

Round-phase hardening (VERDICT r13 item 1): the expected window is
computed from CORRECTNESS files of rounds STRICTLY BEFORE
``registry._WINDOW_ROUND`` — the round the window was seated FOR — so
the driver landing the current round's own CORRECTNESS file mid-round
can no longer flip these tests red. ``test_window_survives_newer_
correctness_file`` simulates exactly that post-driver state.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from rotate_window import WINDOW_SEATS, compute_window, latest_contact  # noqa: E402

from articulation_vector_db_api_spark import registry  # noqa: E402


def _expected_window() -> list[str]:
    return compute_window(
        pins=registry._WINDOW_FIRST,
        defer=registry._WINDOW_DEFER,
        before_round=registry._WINDOW_ROUND,
    )


def test_registry_window_matches_policy():
    actual = list(registry.load_all())[:WINDOW_SEATS]
    assert actual == _expected_window()


def test_r17_window_composition():
    """The specific r17 rotation VERDICT r16 item 2 ordered: the r15
    defer queue (never driver-contacted) leads, then the r16 heavy
    rewrites whose parity evidence was builder-run only, then the
    three queries round 17's optimizations touched."""
    window = list(registry.load_all())[:WINDOW_SEATS]
    assert window[:11] == [
        "scan_zstd_jsonl",
        "ingest_pdf_type0_extract",
        "ingest_sevenz_explode",
        "multimodal_mp1_decode",
        "multimodal_mpeg1_pframe_decode",
        "multimodal_mpeg2_decode",
        "text_kneser_ney_bigram",
        "ingest_office_extract",
        "text_bpe_learn_merges_batched",
        "multimodal_fmp4_dash_roundtrip",
        "pipeline_delivery_ingest",
    ]
    # The stalest driver-contacted rows (r8) lead the reseat.
    contact = latest_contact(before_round=registry._WINDOW_ROUND)
    assert [contact[n] for n in window[11:14]] == [8, 8, 8]


def test_no_query_staler_than_window_tail():
    """Every query OUTSIDE the window must be at least as fresh as the
    stalest row the window does not seat — i.e. the window really is
    the stalest-first prefix (as of the seating round's evidence)."""
    contact = latest_contact(before_round=registry._WINDOW_ROUND)
    window = set(list(registry.load_all())[:WINDOW_SEATS])
    outside = [n for n in registry.load_all() if n not in window]
    seated_stale = [contact[n] for n in window if n in contact]
    if not seated_stale or not outside:
        pytest.skip("degenerate registry")
    oldest_outside = min(
        contact.get(n, 10**9)
        for n in outside
        if n not in registry._WINDOW_DEFER
    )
    cut = max(
        contact[n]
        for n in window
        if n in contact and n not in registry._WINDOW_FIRST
    )
    assert oldest_outside >= cut - 1  # ties at the cut round split by name


def test_window_survives_newer_correctness_file(tmp_path, monkeypatch):
    """Simulate the post-driver state: a CORRECTNESS file for the
    CURRENT round (and even a future one) on disk must not change the
    policy's expected window (the r13 failure mode, reproduced and
    pinned)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = latest_contact(before_round=registry._WINDOW_ROUND)

    # Copy the real CORRECTNESS files, then add current+future rounds
    # marking EVERY known query as freshly contacted — the strongest
    # possible perturbation.
    import glob as _glob
    import shutil

    for p in _glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))
    poison = {name: {"status": "pass", "hash_match": True} for name in base}
    for rnd in (registry._WINDOW_ROUND, registry._WINDOW_ROUND + 1):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(poison)
        )

    import rotate_window as rw

    real_dirname = os.path.dirname

    def fake_dirname(path):
        # latest_contact derives the repo root as dirname(dirname(file));
        # point it at tmp_path instead.
        out = real_dirname(path)
        return str(tmp_path) if out == here else out

    monkeypatch.setattr(rw.os.path, "dirname", fake_dirname)
    capped = rw.latest_contact(before_round=registry._WINDOW_ROUND)
    monkeypatch.undo()

    assert capped == base  # newer files invisible under the cap
    # And the seated window itself still matches the policy.
    assert list(registry.load_all())[:WINDOW_SEATS] == _expected_window()


def test_defer_queue_members_are_registered():
    names = set(registry.load_all())
    assert registry._WINDOW_DEFER <= names
    assert set(registry._WINDOW_FIRST) <= names


def test_window_round_is_current():
    """_WINDOW_ROUND must be newer than every CORRECTNESS file that
    existed when the window was seated ... minus nothing: the newest
    on-disk round may be AT MOST _WINDOW_ROUND (the driver writes the
    current round's file mid-round)."""
    import glob as _glob
    import re as _re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(_re.search(r"r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "no CORRECTNESS files — driver contract broken"
    assert max(rounds) <= registry._WINDOW_ROUND
