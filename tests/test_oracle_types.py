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

from check_types import compare_all  # noqa: E402


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
