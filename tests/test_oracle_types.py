"""CI guard: every registered oracle's DuckDB output types must agree
with the Spark builder's schema in the equivalence classes that change
stringified values (int vs float vs decimal vs ...).

Round-2 driver FAILs ``math_functions`` / ``events_peak_concurrency``
were exactly this class of bug — values identical, stringification
different — and the value-parity checker cannot see it (it normalizes
floats with %.10g). DESCRIBE binds without executing, and the Spark
side only builds the lazy plan, so this covers all ~180 oracle-bearing
queries in one session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_types import norm_duck, norm_spark  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from check_types import compare_all  # noqa: E402


def test_decimal_scale_is_part_of_the_type_key():
    # DECIMAL(30,8) prints "6.00000000", DECIMAL(12,2) prints "6.00" —
    # same value, different hash. The gate must key on ("decimal",
    # scale), not a bare "decimal" class (the r3 ADVICE regression):
    assert norm_spark(T.DecimalType(30, 8)) == norm_duck("DECIMAL(30,8)")
    assert norm_spark(T.DecimalType(12, 2)) == norm_duck("DECIMAL(12,2)")
    assert norm_spark(T.DecimalType(30, 8)) != norm_duck("DECIMAL(12,2)")
    # precision alone does NOT change the stringified value — only
    # scale does, so equal scales with different precision must match
    assert norm_spark(T.DecimalType(38, 2)) == norm_duck("DECIMAL(12,2)")


def test_hugeint_pairs_with_float_not_int():
    # the driver fetches HUGEINT as float64 ("53.0"): pairing with a
    # Spark DOUBLE stringifies identically (OK), pairing with a Spark
    # BIGINT hash-fails even on equal values (the r03 failure class)
    assert norm_duck("HUGEINT") == norm_spark(T.DoubleType())
    assert norm_duck("HUGEINT") != norm_spark(T.LongType())
    assert norm_duck("UHUGEINT") == "float"


def test_all_oracles_type_parity():
    failures = {
        name: mism for name, mism in compare_all() if mism
    }
    assert not failures, (
        "oracle/builder type-class mismatches (driver would hash-FAIL "
        "even on identical values):\n"
        + "\n".join(
            f"  {n}: " + "; ".join(f"{c} spark={s} duck={d}" for c, s, d in m)
            for n, m in failures.items()
        )
    )
