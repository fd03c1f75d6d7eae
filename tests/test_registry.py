"""Registry contract: the driver-facing surface stays coherent."""

from __future__ import annotations

from articulation_vector_db_api_spark.registry import load_all


def test_registry_loads_and_is_consistent():
    reg = load_all()
    assert len(reg) >= 60
    for name, q in reg.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.doc, f"{name} must document its operator"
    with_oracle = [q for q in reg.values() if q.oracle is not None]
    # rows-only checks are the exception, not the rule
    assert len(with_oracle) >= 0.85 * len(reg)


def test_every_oracle_less_query_justifies_rows_only():
    """The correctness gate's contract: a query either carries a DuckDB
    oracle or its docstring carries an explicit ``Rows-only:`` marker
    line saying WHY only a rows-only check is possible (engine-internal
    hashes, streaming-runtime emission timing, ...). An incidental
    mention of the word "oracle" does NOT count — the marker must be
    deliberate. Guards the registry against silently unverifiable
    additions."""
    reg = load_all()
    missing = [
        name
        for name, q in reg.items()
        if q.oracle is None and "Rows-only:" not in q.doc
    ]
    assert not missing, (
        f"oracle-less queries without a 'Rows-only:' rationale: {missing}"
    )


def test_every_headline_query_is_oracle_checked():
    """Bench numbers should only be claimed for queries whose results
    the independent oracle verifies."""
    reg = load_all()
    unverified = [
        name for name, q in reg.items() if q.headline and q.oracle is None
    ]
    assert not unverified, f"headline without oracle: {unverified}"


def test_entry_module_contract():
    import __spark_entry__ as mod

    qs = mod.queries()
    osql = mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert "flagship_search" in qs


def test_multimodal_stub_is_marked():
    import pytest

    from articulation_vector_db_api_spark.operators.multimodal import decode_image

    # AVIF dimensions parse from the ISOBMFF box tree now
    # (functions/isobmff.py); a stream WITHOUT an ispe property still
    # fails loudly (per-row isolable), never silently guesses
    with pytest.raises(ValueError):
        decode_image(b"\x00\x00\x00\x1cftypavif" + b"\x00" * 20)


def test_driver_window_is_exactly_the_unverified_set():
    """The driver emits CORRECTNESS rows for a bounded 50-query prefix
    of queries(); registration order must put exactly the queries
    without a prior driver row in those seats (COVERAGE.md 'driver
    window steering'). An ordering regression here silently wastes
    seats on already-verified queries."""
    from articulation_vector_db_api_spark.registry import (
        _VERIFIED,
        _WINDOW_DEFER,
        load_all,
    )

    from articulation_vector_db_api_spark.registry import (
        _WINDOW_FIRST,
        _WINDOW_RESEAT,
    )

    names = list(load_all())
    unverified = [n for n in names if n not in _VERIFIED]
    seated = [n for n in unverified if n not in _WINDOW_DEFER]
    assert len(seated) <= 50, (
        f"{len(seated)} unverified queries for 50 driver seats — "
        "defer new registrations or expand _WINDOW_DEFER"
    )
    # every unverified, non-deferred query takes a seat in the 50-row
    # window; once everything has a prior driver row, the remaining
    # seats re-verify the stalest evidence via the EXPLICIT
    # _WINDOW_FIRST/_WINDOW_RESEAT priorities — never an arbitrary
    # already-verified query
    window = names[:50]
    assert set(seated) <= set(window)
    intended = set(seated) | set(_WINDOW_FIRST) | set(_WINDOW_RESEAT)
    for n in window[: len(_WINDOW_FIRST) + len(_WINDOW_RESEAT)]:
        assert n in intended, f"window seat wasted on unplanned {n!r}"
    deferred = [n for n in unverified if n in _WINDOW_DEFER]
    assert not set(deferred) & set(window)
