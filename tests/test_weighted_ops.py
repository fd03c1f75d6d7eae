"""Randomized + edge-case equivalence for the bucketed weighted median
(operators/quantiles.py) against a direct single-machine reference —
the decomposition must be invisible in the result."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from articulation_vector_db_api_spark.operators.quantiles import (
    weighted_median_bucketed,
)


def _reference(rows):
    """Lower weighted median per group: first value in (value, tie)
    order with 2*cumsum(weight) >= total."""
    out = {}
    by_g = {}
    for g, v, w, tie in rows:
        by_g.setdefault(g, []).append((v, tie, w))
    for g, items in by_g.items():
        items.sort()
        total = sum(w for _, _, w in items)
        cum = 0
        for v, _, w in items:
            cum += w
            if 2 * cum >= total:
                out[g] = (v, total)
                break
    return out


def _run(spark, rows, n_buckets=64):
    df = spark.createDataFrame(
        rows, "g string, v double, w long, tie long"
    )
    got = weighted_median_bucketed(
        df, "g", "v", "w", ["tie"], n_buckets=n_buckets
    ).collect()
    return {r.g: (r.weighted_median, r.total_weight) for r in got}


def test_weighted_median_random_matches_reference(spark):
    rng = random.Random(1234)
    rows = [
        (
            f"g{rng.randrange(4)}",
            round(rng.uniform(-50, 50), 3),
            rng.randrange(1, 20),
            i,
        )
        for i in range(3000)
    ]
    assert _run(spark, [(g, v, w, t) for g, v, w, t in rows]) == _reference(
        [(g, v, w, t) for g, v, w, t in rows]
    )


def test_weighted_median_edge_cases(spark):
    rows = [
        # single row
        ("single", 7.0, 5, 0),
        # all-equal values (hi == lo -> every row in bucket 0)
        *[("flat", 3.0, w, i) for i, w in enumerate([1, 2, 3, 4])],
        # weight concentrated on the last value
        ("tail", 1.0, 1, 0),
        ("tail", 2.0, 1, 1),
        ("tail", 100.0, 98, 2),
        # exact half boundary: 2*cw == tw must select the boundary row
        ("half", 1.0, 1, 0),
        ("half", 2.0, 1, 1),
    ]
    assert _run(spark, rows, n_buckets=8) == _reference(rows)
    assert _run(spark, rows, n_buckets=8)["half"][0] == 1.0  # lower median


def test_weighted_median_duplicate_values_ties(spark):
    # duplicate values spanning a bucket boundary; tie column decides
    # nothing about the VALUE picked but the cumulative order must be
    # stable — compare against the reference on a tie-heavy input
    rng = random.Random(7)
    rows = [
        (f"g{i % 2}", float(rng.randrange(5)), rng.randrange(1, 4), i)
        for i in range(500)
    ]
    assert _run(spark, rows, n_buckets=4) == _reference(rows)
