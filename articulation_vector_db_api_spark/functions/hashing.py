"""Deterministic, cross-engine hash functions for dedup/LSH operators.

Spark's native ``xxhash64``/``hash`` have no DuckDB equivalent, so the
oracle-checkable operators hash through sha256: the low 32 bits of the
digest's first 4 bytes, seeded by prefixing ``{seed}:``. ~2× slower
than xxhash64 but still JVM-side (sha2 is codegen'd), and exactly
reproducible in any engine with sha256 + substring.

For production at 100 TB swap ``sha_hash32`` for ``F.xxhash64`` — the
operator shapes below don't change, only the hash expression."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def sha_hash32(col: Column, seed: int) -> Column:
    """Unsigned 32-bit hash of a string column (seeded), as bigint."""
    return F.conv(
        F.substring(F.sha2(F.concat(F.lit(f"{seed}:"), col), 256), 1, 8), 16, 10
    ).cast("long")


def hex_to_u32_sql(hex_expr: str) -> str:
    """DuckDB: first 8 hex chars of ``hex_expr`` as an unsigned 32-bit
    int (strpos parse). Pass a simple column reference — the expression
    is expanded 8×, so materialize the hex in a prior select."""
    terms = [
        f"(strpos('{_HEX}', substr({hex_expr}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def sha_hash32_sql(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`sha_hash32`."""
    return hex_to_u32_sql(f"sha256('{seed}:' || ({expr}))")
