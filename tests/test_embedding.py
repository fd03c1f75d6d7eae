"""Embedding golden-vector fixtures (FIXTURES.md B2; reference
/root/reference/main.py:129-147 semantics)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from articulation_vector_db_api_spark.functions.embedding import (
    EMBEDDING_DIM,
    hash_embedding,
    hash_embedding_py,
)


def test_python_twin_golden():
    v = hash_embedding_py("hello")
    digest = hashlib.sha256(b"hello").digest()
    assert len(v) == EMBEDDING_DIM == 1024
    assert v[0] == digest[0] / 255 * 2 - 1
    assert all(-1.0 <= x <= 1.0 for x in v)
    assert v[:32] * 32 == v  # 32-periodic (main.py:142)


def test_spark_matches_python_bit_exact(spark):
    texts = ["hello", "", "transfer credits", "a" * 1000, "ünïcødé ✓"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text", hash_embedding(F.col("text")).alias("e")).collect()
    for r in rows:
        expected = hash_embedding_py(r.text)
        assert list(r.e) == expected, f"mismatch for {r.text!r}"


def test_identical_text_identical_vector_cosine_one():
    a = hash_embedding_py("same text")
    b = hash_embedding_py("same text")
    dot = sum(x * y for x, y in zip(a, b))
    norm = math.sqrt(sum(x * x for x in a))
    assert a == b
    assert abs(dot / (norm * norm) - 1.0) < 1e-12


def test_pluggable_embedder_slot(spark):
    """The embedder slot: a pandas_udf model stand-in builds the index
    and searches it through the same generic path as the hash scheme."""
    import numpy as np

    from articulation_vector_db_api_spark.operators.embed_model import (
        HashEmbedder,
        NgramProjectionEmbedder,
        build_index_with,
        topk_search_with,
    )

    sf = "/root/testdata/sf0.001"
    model = NgramProjectionEmbedder(dim=64)

    # deterministic + unit-norm vectors
    a = model.embed_query("transfer credits")
    b = model.embed_query("transfer credits")
    assert a == b
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9

    idx = build_index_with(model, spark, sf)
    rows1 = topk_search_with(model, idx, "transfer credits", 3).collect()
    rows2 = topk_search_with(model, idx, "transfer credits", 3).collect()
    assert [r.id for r in rows1] == [r.id for r in rows2]
    assert len(rows1) == 3
    scores = [r.score for r in rows1]
    assert scores == sorted(scores, reverse=True)

    # the hash scheme rides the same generic path: ids must agree with
    # the engine's native flagship search
    from articulation_vector_db_api_spark.operators.search import topk_search

    hash_rows = topk_search_with(
        HashEmbedder(), build_index_with(HashEmbedder(), spark, sf),
        "transfer credits", 5,
    ).collect()
    native = topk_search(spark, sf, "transfer credits", 5).collect()
    assert [r.id for r in hash_rows] == [r.id for r in native]
