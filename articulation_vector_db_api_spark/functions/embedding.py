"""Deterministic sha256 hash embedding (reference O4).

Reference semantics (/root/reference/main.py:129-147): sha256 of the
UTF-8 text → 32-byte digest; dimension i of the 1024-dim vector is
``digest[i % 32] / 255 * 2 - 1`` (32-periodic, values on a 256-point
grid in [-1, 1]; identical text ⇒ identical vector). The README claims a
model-based embedder but the code is hash-based (main.py:24); the code
is the source of truth, and being deterministic it is oracle-checkable
byte-exactly.

Spark-first: the whole embedder is built-in expressions —
``sha2(text, 256)`` + ``transform(sequence(...))`` with hex→int via
``conv`` — so it executes JVM-side inside whole-stage codegen. No
Python UDF in the hot path; a vectorized numpy variant is kept for
golden tests and as the pluggable slot for real models.

Float parity: every engine computes ``(byte / 255.0) * 2 - 1`` in IEEE
double in the same op order, so Spark, DuckDB and CPython produce
bit-identical doubles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 1024  # main.py:33
DIGEST_BYTES = 32

_HEX = "0123456789abcdef"


def hash_embedding(text: Column, dim: int = EMBEDDING_DIM) -> Column:
    """array<double> hash embedding of a string column (pure SQL)."""
    return hash_embedding_from_hex(F.sha2(text, 256), dim)


def hash_embedding_from_hex(hex_col: Column, dim: int = EMBEDDING_DIM) -> Column:
    """Embedding from a precomputed sha256 hex column — materialize the
    digest once per row instead of per array element.

    The vector is digest[i % 32] scaled, so for dims that are a
    multiple of 32 only 32 hex-parses run per row and the pattern is
    repeated (values identical to the naive 1024-element transform;
    measured ~2× on the ingest write path)."""
    base = F.transform(
        F.sequence(F.lit(0), F.lit(min(dim, DIGEST_BYTES) - 1)),
        lambda i: (
            F.conv(hex_col.substr(i * 2 + 1, F.lit(2)), 16, 10).cast("double")
            / F.lit(255.0)
        )
        * 2
        - 1,
    )
    if dim <= DIGEST_BYTES:
        return base
    if dim % DIGEST_BYTES == 0:
        return F.flatten(F.array_repeat(base, dim // DIGEST_BYTES))
    return F.slice(
        F.flatten(F.array_repeat(base, dim // DIGEST_BYTES + 1)), 1, dim
    )


def hash_embedding_py(text: str, dim: int = EMBEDDING_DIM) -> list[float]:
    """CPython twin (mirrors main.py:129-147); used for golden tests and
    for embedding literal query vectors on the driver."""
    digest = hashlib.sha256(text.encode("utf-8")).digest()
    return [digest[i % DIGEST_BYTES] / 255 * 2 - 1 for i in range(dim)]


def hex_byte_sql_duckdb(hex_expr: str, byte_pos_expr: str) -> str:
    """DuckDB fragment: int value of byte ``byte_pos_expr`` (0-based) of
    lowercase-hex string ``hex_expr``. DuckDB lacks ``conv``, so parse
    the two hex chars via strpos lookup."""
    hi = f"(strpos('{_HEX}', substr({hex_expr}, ({byte_pos_expr}) * 2 + 1, 1)) - 1)"
    lo = f"(strpos('{_HEX}', substr({hex_expr}, ({byte_pos_expr}) * 2 + 2, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def embedding_sql_duckdb(text_expr: str, dim: int = EMBEDDING_DIM) -> str:
    """DuckDB twin of :func:`hash_embedding`: list<double>."""
    byte = hex_byte_sql_duckdb(f"sha256({text_expr})", f"i % {DIGEST_BYTES}")
    return (
        f"list_transform(generate_series(0, {dim - 1}), "
        f"i -> (CAST({byte} AS DOUBLE) / 255.0) * 2 - 1)"
    )
