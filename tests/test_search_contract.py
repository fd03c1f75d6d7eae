"""Search contract fixtures (FIXTURES.md B3; reference
/root/reference/main.py:314-333 semantics)."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.operators.search import (
    assemble_context,
    topk_search,
)
from articulation_vector_db_api_spark.operators.stats import validate_query
from tests.conftest import SF_SMALL


def test_empty_query_rejected(spark):
    for bad in ["", "   ", "\n\t"]:
        with pytest.raises(ValueError):
            topk_search(spark, SF_SMALL, bad)
    with pytest.raises(ValueError):
        validate_query(" ")


def test_total_results_le_top_k(spark):
    rows = topk_search(spark, SF_SMALL, "transfer credits", top_k=3).collect()
    assert 0 < len(rows) <= 3
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_deterministic_tie_order(spark):
    a = [r.id for r in topk_search(spark, SF_SMALL, "customer data", 5).collect()]
    b = [r.id for r in topk_search(spark, SF_SMALL, "customer data", 5).collect()]
    assert a == b


def test_context_format(spark):
    topk = topk_search(spark, SF_SMALL, "transfer credits", 2)
    ctx = assemble_context(topk, "transfer credits").first()
    assert ctx.query == "transfer credits"
    assert ctx.total_results == 2
    parts = ctx.context.split("\n\n---\n\n")
    assert len(parts) == 2
    for p in parts:
        assert p.startswith("[Source: ")  # '[Source: {source}]\n{text}', main.py:324
        assert "]\n" in p


def test_mmr_arbitrary_k(spark):
    """mmr_rerank generalizes to any k: 8 distinct picks, pick 1 equals
    plain top-1 (no penalty yet), every later pick's relevance is <= the
    pool max, and the pick column is 1..8 in order."""
    from articulation_vector_db_api_spark.operators.search import mmr_rerank

    rows = mmr_rerank(spark, SF_SMALL, "transfer credits", k=8, pool=40).collect()
    assert [r.pick for r in rows] == list(range(1, 9))
    assert len({r.id for r in rows}) == 8
    top1 = topk_search(spark, SF_SMALL, "transfer credits", 1).first()
    assert rows[0].id == top1.id
    assert all(r.score <= rows[0].score + 1e-9 for r in rows)


def test_mmr_k3_matches_oracle_shape(spark):
    """The k=3 loop must reproduce the unrolled-3 pick sequence."""
    from articulation_vector_db_api_spark.operators.search import mmr_rerank

    rows = mmr_rerank(spark, SF_SMALL, "transfer credits", k=3, pool=20).collect()
    assert [r.pick for r in rows] == [1, 2, 3]
    assert len({r.id for r in rows}) == 3
