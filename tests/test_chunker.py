"""Chunker edge-length fixtures (FIXTURES.md B1; reference
/root/reference/main.py:118-126 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from articulation_vector_db_api_spark.functions.chunking import (
    CHUNK_SIZE,
    STRIDE,
    chunk_documents,
)


def reference_chunker(text: str, chunk_size: int = 1000, overlap: int = 200) -> list[str]:
    """Faithful reimplementation of the reference loop (main.py:118-126)
    used as the spec for the SQL chunker."""
    chunks = []
    start = 0
    while start < len(text):
        chunks.append(text[start : start + chunk_size])
        start += chunk_size - overlap
    return chunks


EDGE_CASES = {
    0: [],
    1: [1],
    799: [799],
    800: [800],
    1000: [1000, 200],
    1001: [1000, 201],
    2500: [1000, 1000, 900, 100],
}


@pytest.mark.parametrize("n,expected", sorted(EDGE_CASES.items()))
def test_reference_chunker_spec(n, expected):
    assert [len(c) for c in reference_chunker("x" * n)] == expected


def test_sql_chunker_matches_reference(spark):
    texts = ["a" * n for n in EDGE_CASES] + ["abcdef" * 400]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = (
        chunk_documents(df)
        .select("doc_id", "pos", "chunk_text")
        .orderBy("doc_id", "pos")
        .collect()
    )
    got: dict[int, list[str]] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r.chunk_text)
        assert r.pos == len(got[r.doc_id]) - 1  # ordinal parity → id parity
    for i, t in enumerate(texts):
        assert got.get(i, []) == reference_chunker(t), f"text len {len(t)}"


def test_chunk_ids(spark):
    df = spark.createDataFrame([(7, "z" * 1700)], "doc_id long, text string")
    ids = [r.chunk_id for r in chunk_documents(df).orderBy("pos").collect()]
    assert ids == ["7_0", "7_1", "7_2"]  # {title}_{i}, main.py:163
    assert CHUNK_SIZE == 1000 and STRIDE == 800


def test_empty_text_yields_no_chunks(spark):
    df = spark.createDataFrame([(1, ""), (2, "ok")], "doc_id long, text string")
    assert chunk_documents(df).filter(F.col("doc_id") == 1).count() == 0
