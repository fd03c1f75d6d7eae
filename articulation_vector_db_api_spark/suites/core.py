"""Core suite: the reference's own operator surface (SURVEY §2.1).

Every query here reproduces a reference behavior byte-exactly
(/root/reference/main.py citations inline) and carries a DuckDB oracle
twin built from the same expression builders, so Spark and the oracle
compute the identical IEEE arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.chunking import chunk_documents, chunk_sql_duckdb
from ..functions.embedding import embedding_sql_duckdb, hash_embedding_from_hex
from ..functions.vector import cosine_sql_duckdb
from ..operators.search import assemble_context, build_chunk_index, topk_search
from ..registry import register
from ..sources.readers import load_table

FLAGSHIP_QUERY = "transfer credits"  # the reference's own smoke query, test_api.sh:50-56
FLAGSHIP_K = 5  # default top_k, main.py:89

_CHUNKS_SQL = chunk_sql_duckdb(extra_cols="source,")


def _scored_sql(query: str) -> str:
    """DuckDB: chunk → embed → cosine score against the query literal."""
    q = query.replace("'", "''")
    return f"""
    WITH chunks AS ({_CHUNKS_SQL}),
    emb AS (
        SELECT chunk_id AS id, source, chunk_text AS text,
               {embedding_sql_duckdb("chunk_text")} AS embedding
        FROM chunks
    ),
    qv AS (SELECT {embedding_sql_duckdb(f"'{q}'")} AS qvec),
    scored AS (
        SELECT id, source, text,
               {cosine_sql_duckdb("embedding", "qvec")} AS raw
        FROM emb, qv
        WHERE length(text) > 0
    )
    """


def _topk_sql(query: str, k: int) -> str:
    return (
        _scored_sql(query)
        + f"""
    SELECT id, source, text, round(raw, 6) AS score
    FROM scored
    ORDER BY raw DESC, id ASC
    LIMIT {k}
    """
    )


@register(
    "flagship_search",
    oracle=_topk_sql(FLAGSHIP_QUERY, FLAGSHIP_K),
    headline=True,
    tags=("core", "vector"),
)
def flagship_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/search read path (O8+O9, main.py:176-216): chunk → hash-embed →
    exact cosine top-5 with total order (score DESC, id ASC)."""
    return topk_search(spark, sf_dir, FLAGSHIP_QUERY, FLAGSHIP_K)


@register(
    "search_context",
    oracle=_scored_sql(FLAGSHIP_QUERY)
    + f"""
    , topk AS (
        SELECT id, source, text, round(raw, 6) AS score
        FROM scored ORDER BY raw DESC, id ASC LIMIT {FLAGSHIP_K}
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY score DESC, id ASC) AS rnk
        FROM topk
    )
    SELECT '{FLAGSHIP_QUERY}' AS query,
           count(*) AS total_results,
           string_agg('[Source: ' || source || ']' || chr(10) || text,
                      e'\\n\\n---\\n\\n' ORDER BY rnk) AS context
    FROM ranked
    """,
    tags=("core", "vector"),
)
def search_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context assembly (O10, main.py:324): ordered string agg
    '[Source: {source}]\\n{text}' joined by '\\n\\n---\\n\\n'."""
    topk = topk_search(spark, sf_dir, FLAGSHIP_QUERY, FLAGSHIP_K)
    return assemble_context(topk, FLAGSHIP_QUERY)


@register(
    "chunk_documents",
    oracle=f"""
    SELECT doc_id, source, pos, chunk_id, chunk_text,
           length(chunk_text) AS chunk_len
    FROM ({_CHUNKS_SQL})
    ORDER BY doc_id, pos
    """,
    headline=True,
    tags=("core", "chunking"),
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunker (O3, main.py:118-126): size 1000, stride
    800, short tail chunk, empty text → 0 chunks; ordinal parity feeds
    chunk ids (main.py:163)."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs).select(
        "doc_id",
        "source",
        "pos",
        "chunk_id",
        "chunk_text",
        F.length("chunk_text").alias("chunk_len"),
    ).orderBy("doc_id", "pos")


@register(
    "hash_embedding_vectors",
    oracle=f"""
    SELECT doc_id, {embedding_sql_duckdb("text")} AS embedding
    FROM documents
    WHERE doc_id % 50 = 0 AND length(text) > 0
    ORDER BY doc_id
    """,
    tags=("core", "embedding"),
)
def hash_embedding_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sha256 embedding (O4, main.py:129-147): full
    1024-dim vectors for a doc sample — byte-exact parity including the
    32-periodicity and the 256-point value grid."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("doc_id") % 50 == 0) & (F.length("text") > 0))
        .withColumn("_hex", F.sha2(F.col("text"), 256))
        .select("doc_id", hash_embedding_from_hex(F.col("_hex")).alias("embedding"))
        .orderBy("doc_id")
    )


@register(
    "upsert_last_write_wins",
    oracle="""
    WITH ingest AS (
        SELECT doc_id, text, source, 1 AS ingest_batch FROM documents
        UNION ALL
        SELECT doc_id, text || ' [v2]', source, 2 FROM documents WHERE source = 'src0'
    ),
    latest AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ingest_batch DESC) AS rn
        FROM ingest
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
    FROM latest WHERE rn = 1
    GROUP BY source
    ORDER BY source
    """,
    tags=("core", "sink"),
)
def upsert_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert semantics (O6, main.py:163,172): re-ingesting a
    source replaces its rows (last-write-wins on id). Modeled as
    union + row_number window — the same plan the partitioned-overwrite
    writer in operators/ingest.py executes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    v1 = docs.withColumn("ingest_batch", F.lit(1))
    v2 = (
        docs.filter(F.col("source") == "src0")
        .withColumn("text", F.concat(F.col("text"), F.lit(" [v2]")))
        .withColumn("ingest_batch", F.lit(2))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("ingest_batch"))
    latest = v1.unionByName(v2).withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return (
        latest.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
        )
        .orderBy("source")
    )


@register(
    "index_stats_by_source",
    oracle=f"""
    SELECT source,
           count(*) AS n_chunks,
           count(DISTINCT doc_id) AS n_docs
    FROM ({_CHUNKS_SQL})
    GROUP BY source
    ORDER BY source
    """,
    tags=("core", "stats"),
)
def index_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index stats (O12, main.py:340-360): vector counts per namespace
    analog — chunk and doc counts per source."""
    idx = build_chunk_index(spark, sf_dir)
    return (
        idx.withColumn("doc_id", F.split(F.col("id"), "_").getItem(0).cast("long"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("source")
    )
