"""Multimodal suite (north star: binary columns with typed metadata).

Two tiers: pure-SQL metadata/feature queries (codegen, no Python) and
the Arrow-batched mapInPandas decode pipeline from
operators/multimodal.py with its deterministic stub — both
oracle-checked against DuckDB blob functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, extract_binary_features
from ..registry import register
from ..sources.readers import load_table


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           hex(encode(substr(text, 1, 4))) AS header_hex,
           sha256(text) AS content_sha
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata without touching Python: byte length,
    magic-header hex, content digest. Column pruning keeps payload
    pages unread for metadata-only scans at 100 TB."""
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta").getField("mime").alias("mime"),
        F.col("media_meta").getField("n_bytes").cast("long").alias("n_bytes"),
        F.hex(F.substring(F.col("payload"), 1, 4)).alias("header_hex"),
        F.sha2(F.col("payload"), 256).alias("content_sha"),
    ).orderBy("doc_id")


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substr(sha256(text), 1, 16) AS digest_prefix,
           octet_length(encode(text)) % 640 AS fake_width,
           (octet_length(encode(text)) * 7) % 480 AS fake_height
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas 'decode' pipeline end-to-end (Arrow batches,
    real schema/signature; codec body stubbed deterministically — see
    operators/multimodal.py:decode_image)."""
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_binary_features(docs).orderBy("doc_id")
