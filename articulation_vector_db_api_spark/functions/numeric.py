"""Deterministic numeric aggregation helpers.

Distributed double sums are order-dependent: 32 (or 32,000) partial
aggregates combine in nondeterministic order, so ``SUM(double)`` can
differ between runs and engines in the last ulps. The engine's policy:
aggregate money/measure doubles through ``DECIMAL(30,8)`` — exact,
associative, order-independent — then cast the final value back to
double. Same plan shape (partial + final HashAggregate), bit-stable
results at any cluster size; this is how the oracle check stays exact
at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(30,8)"
_DEC_SQL = "DECIMAL(30,8)"


def dsum(col: Column) -> Column:
    """Order-independent SUM over a double column (exact decimal path)."""
    return F.sum(col.cast(_DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    return dsum(col) / F.count(F.lit(1))


def dsum_sql(expr: str) -> str:
    # decimal → VARCHAR → DOUBLE, not a direct decimal→double cast:
    # DuckDB's direct cast computes the double inexactly (off by 1 ulp
    # at billion-scale sums, e.g. 7556118302.97 → …969999), while its
    # string parse — like Spark's BigDecimal.doubleValue — is correctly
    # rounded. The exact decimal stringifies identically on both
    # engines, so this pins both sides to the same IEEE value.
    return (
        f"CAST(CAST(sum(CAST(({expr}) AS {_DEC_SQL})) AS VARCHAR) AS DOUBLE)"
    )


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count(*))"
