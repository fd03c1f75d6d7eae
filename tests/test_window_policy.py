"""Pin the driver-window seating policy (VERDICT r12 item 7).

The 50-seat CORRECTNESS window must be: explicit pins (which MUST
include every never-driver-contacted query) followed by the stalest
driver-contacted rows in ``(latest_round, name)`` order. The policy is
implemented once in ``tools/rotate_window.compute_window``; this test
asserts the registry's hand-maintained ``_WINDOW_FIRST``/
``_WINDOW_RESEAT`` tuples reproduce it exactly, so a future round
cannot silently regress to re-rotating fresh rows while stale rows age.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from rotate_window import WINDOW_SEATS, compute_window, latest_contact  # noqa: E402

from articulation_vector_db_api_spark import registry  # noqa: E402


def test_registry_window_matches_policy():
    expected = compute_window(
        pins=registry._WINDOW_FIRST, defer=registry._WINDOW_DEFER
    )
    actual = list(registry.load_all())[:WINDOW_SEATS]
    assert actual == expected


def test_r13_window_composition():
    """The specific r13 rotation VERDICT r12 item 1 ordered."""
    window = list(registry.load_all())[:WINDOW_SEATS]
    # The 3 r12-touched queries hold the priority seats.
    assert window[:3] == [
        "multimodal_mpeg2_decode",
        "multimodal_mpeg2_ps_roundtrip",
        "multimodal_mpeg1_bframe_decode",
    ]
    # The 7 remaining r5 rows (stalest anywhere) lead the reseat.
    assert window[3:10] == [
        "search_phrase_adjacent",
        "text_bpe_pair_counts",
        "text_char_entropy",
        "text_word_trigrams",
        "window_percent_change_wow",
        "window_rolling_median",
        "window_running_distinct",
    ]


def test_no_query_staler_than_window_tail():
    """Every query OUTSIDE the window must be at least as fresh as the
    stalest row the window does not seat — i.e. the window really is
    the stalest-first prefix."""
    contact = latest_contact()
    window = set(list(registry.load_all())[:WINDOW_SEATS])
    outside = [n for n in registry.load_all() if n not in window]
    seated_stale = [contact[n] for n in window if n in contact]
    if not seated_stale or not outside:
        pytest.skip("degenerate registry")
    oldest_outside = min(contact.get(n, 10**9) for n in outside)
    # No query outside the window may predate the newest seated stale
    # row's round by policy: outside rows are >= the cut round.
    cut = max(
        contact[n]
        for n in window
        if n in contact and n not in registry._WINDOW_FIRST
    )
    assert oldest_outside >= cut - 1  # ties at the cut round split by name


def test_defer_queue_members_are_registered():
    names = set(registry.load_all())
    assert registry._WINDOW_DEFER <= names
    assert set(registry._WINDOW_FIRST) <= names
