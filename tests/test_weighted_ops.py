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


def test_portable_hll_registers_match_python_twin(spark):
    """agg_hll_portable_registers' sketch math, replayed in pure python
    from the same sha256 hash: bucket = h % 64, rank = 27 - bitlength
    of h//64 (27 when the suffix is 0), region register = max rank,
    estimate = linear counting when the raw harmonic estimate is small,
    else alpha*m^2/S. The query result must equal the twin exactly —
    the whole point of the portable variant is engine-independent
    registers."""
    import hashlib
    import math

    from articulation_vector_db_api_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    got = {
        r.n_regionkey: r
        for r in load_all()["agg_hll_portable_registers"].fn(spark, sf).collect()
    }

    cust = spark.read.parquet(f"{sf}/customer.parquet").collect()
    nat = {
        r.n_nationkey: r.n_regionkey
        for r in spark.read.parquet(f"{sf}/nation.parquet").collect()
    }
    m = 64
    regs: dict[int, dict[int, int]] = {}
    exact: dict[int, set] = {}
    for c in cust:
        region = nat[c.c_nationkey]
        h = int(hashlib.sha256(f"29:{c.c_custkey}".encode()).hexdigest()[:8], 16)
        w = h // m
        rank = 27 if w == 0 else 27 - w.bit_length()
        b = h % m
        r = regs.setdefault(region, {})
        r[b] = max(r.get(b, 0), rank)
        exact.setdefault(region, set()).add(c.c_custkey)

    assert set(got) == set(regs)
    for region, r in regs.items():
        s = sum(2.0 ** -v for v in r.values()) + (m - len(r))
        zeros = m - len(r)
        raw = 0.709 * m * m / s
        est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
        assert abs(got[region].est_customers - round(est, 6)) < 1e-9
        assert got[region].exact_customers == len(exact[region])
        # and the estimate is actually useful at this cardinality
        assert abs(est - len(exact[region])) / len(exact[region]) < 0.35


def test_weighted_quantile_q90_matches_reference(spark):
    """Arbitrary-q path (q = 9/10) against a direct reference."""
    from articulation_vector_db_api_spark.operators.quantiles import (
        weighted_quantile_bucketed,
    )

    rng = random.Random(99)
    rows = [
        (f"g{rng.randrange(3)}", round(rng.uniform(0, 100), 2), rng.randrange(1, 9), i)
        for i in range(2000)
    ]

    def ref_q(rows, q_num, q_den):
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
                if q_den * cum >= q_num * total:
                    out[g] = (v, total)
                    break
        return out

    df = spark.createDataFrame(rows, "g string, v double, w long, tie long")
    got = {
        r.g: (r.weighted_quantile, r.total_weight)
        for r in weighted_quantile_bucketed(
            df, "g", "v", "w", ["tie"], q_num=9, q_den=10
        ).collect()
    }
    assert got == ref_q(rows, 9, 10)
