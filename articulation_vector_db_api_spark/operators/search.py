"""Top-k vector similarity search (reference O8-O10).

Reference read path (/root/reference/main.py:176-216, 314-333): embed
the query, ANN-query Pinecone with top_k, project id/score/metadata,
drop empty-text matches, assemble an ordered context string.

Spark-first equivalent: the chunk table is a columnar DataFrame; the
query vector is a constant-foldable expression; scoring is a codegen'd
cosine fold; ``ORDER BY score DESC LIMIT k`` plans as
``TakeOrderedAndProject`` — per-partition top-k heaps merged on the
driver, no global sort and no shuffle of the full table. That is the
exact distributed analog of Pinecone's top_k pushdown (main.py:185) and
scales linearly with executor count at 100 TB.

Tie-breaking: Pinecone leaves tie order unspecified; the engine defines
the total order ``score DESC, id ASC`` (SURVEY §4.3.5) so results are
deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.chunking import chunk_documents
from ..functions.embedding import hash_embedding, hash_embedding_from_hex
from ..functions.vector import cosine
from ..sources.readers import load_table

DEFAULT_TOP_K = 5  # main.py:89


def build_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → chunk rows with embeddings (the engine's 'index').

    Columns: chunk_id (``{doc_id}_{pos}``, main.py:163), source, pos,
    text, embedding. One narrow stage: scan → explode → project; at
    100 TB this is written out partitioned by ``source`` (see
    operators/ingest.py) so searches scoped to a source prune
    partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, id_col="doc_id", text_col="text")
    return (
        chunks.withColumn("_hex", F.sha2(F.col("chunk_text"), 256))
        .withColumn("embedding", hash_embedding_from_hex(F.col("_hex")))
        .select(
            F.col("chunk_id").alias("id"),
            "source",
            "pos",
            F.col("chunk_text").alias("text"),
            "embedding",
        )
    )


def topk_search(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Exact cosine top-k over the chunk index (O8 + O9).

    The query embedding is ``hash_embedding(lit(query))`` — a constant
    expression Catalyst folds once; executors never recompute it.
    Empty-text matches are dropped before the limit (main.py:208), so
    total_results ≤ top_k.
    """
    if not query or not query.strip():
        # main.py:317-318 — empty query is a client error, not a plan
        raise ValueError("Query cannot be empty")
    index = build_chunk_index(spark, sf_dir)
    qvec = hash_embedding(F.lit(query))
    scored = (
        index.filter(F.length("text") > 0)
        .withColumn("score", cosine(F.col("embedding"), qvec))
        .select("id", "source", "text", F.round("score", 6).alias("score"), F.col("score").alias("_raw_score"))
    )
    return (
        scored.orderBy(F.desc("_raw_score"), F.asc("id"))
        .limit(top_k)
        .drop("_raw_score")
    )


def assemble_context(topk: DataFrame, query: str) -> DataFrame:
    """Ordered context-string aggregation (O10, main.py:324).

    ``[Source: {source}]\\n{text}`` joined by ``\\n\\n---\\n\\n`` in
    score-descending order. collect_list order is nondeterministic, so
    rank first and array_sort the (rank, fragment) structs — an ordered
    string agg without any driver-side loop.
    """
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    ranked = topk.withColumn("rnk", F.row_number().over(w)).withColumn(
        "fmt",
        F.concat(F.lit("[Source: "), F.col("source"), F.lit("]\n"), F.col("text")),
    )
    return ranked.agg(
        F.lit(query).alias("query"),
        F.count(F.lit(1)).alias("total_results"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "fmt"))),
                lambda s: s.getField("fmt"),
            ),
            "\n\n---\n\n",
        ).alias("context"),
    )
