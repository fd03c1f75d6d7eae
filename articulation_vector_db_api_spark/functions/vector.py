"""Vector math over array<double> columns — all built-in expressions.

The reference delegates cosine similarity to Pinecone (metric fixed at
index creation, /root/reference/main.py:34); here it is an explicit
fold so Catalyst keeps the whole scoring pipeline in codegen.

Determinism: ``F.aggregate`` folds left-to-right from a 0.0 initial
accumulator, so per-row results are bit-stable; the DuckDB oracle twins
use ``list_reduce`` over a 0.0-prepended list — the identical sequence
of IEEE additions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # cast elements to double BEFORE multiplying: float*float would round
    # in single precision and diverge from the double-precision oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _fold_sum_duckdb(list_expr: str) -> str:
    # prepend 0.0 so the fold matches F.aggregate's init accumulator
    return f"list_reduce(list_prepend(0.0, {list_expr}), (acc, v) -> acc + v)"


def dot_sql_duckdb(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` for two list expressions of equal length."""
    prods = (
        f"list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    )
    return _fold_sum_duckdb(prods)


def cosine_sql_duckdb(a: str, b: str) -> str:
    return (
        f"({dot_sql_duckdb(a, b)} / "
        f"(sqrt({dot_sql_duckdb(a, a)}) * sqrt({dot_sql_duckdb(b, b)})))"
    )
