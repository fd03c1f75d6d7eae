"""Fixed-size overlapping text chunker (reference O3).

Reference semantics (/root/reference/main.py:118-126): a sliding
character window of size 1000 with overlap 200 → stride 800; the loop
``while start < len(text)`` emits a final short chunk (a 1000-char text
yields chunks of [1000, 200]); empty text yields no chunks. Chunk
ordinal feeds the chunk id ``{title}_{i}`` (main.py:163), so the start
sequence must match index-for-index.

Spark-first: this is pure SQL — ``sequence`` + ``transform`` +
``posexplode`` — so it runs inside whole-stage codegen with zero Python
in the loop. At 100 TB the chunker is a narrow map (no shuffle); output
rows inherit the input partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 1000  # main.py:118
OVERLAP = 200  # main.py:118
STRIDE = CHUNK_SIZE - OVERLAP  # main.py:125


def chunk_starts(text: Column, stride: int = STRIDE) -> Column:
    """0, stride, 2*stride, ... last start < length(text).

    ``floor((len-1)/stride)*stride`` is the greatest start strictly below
    the text length — the exact fixpoint of the reference's while-loop.
    Caller must filter out empty text (length 0 → reference emits no
    chunks, main.py:122).
    """
    last = (F.floor((F.length(text) - F.lit(1)) / F.lit(stride)) * stride).cast("int")
    return F.sequence(F.lit(0), last, F.lit(stride))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = OVERLAP,
) -> DataFrame:
    """Explode documents into chunk rows.

    Output adds: ``pos`` (chunk ordinal), ``chunk_id``
    (``{doc_id}_{pos}``, the reference's ``{title}_{i}`` identity,
    main.py:163), ``chunk_text``.
    """
    stride = chunk_size - overlap
    text = F.col(text_col)
    chunks = F.transform(
        chunk_starts(text, stride),
        lambda s: text.substr(s + F.lit(1), F.lit(chunk_size)),
    )
    out = (
        df.filter(F.length(text) > 0)
        .select("*", F.posexplode(chunks).alias("pos", "chunk_text"))
        .withColumn(
            "chunk_id",
            F.concat_ws("_", F.col(id_col).cast("string"), F.col("pos").cast("string")),
        )
    )
    return out


def chunk_sql_duckdb(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = OVERLAP,
    extra_cols: str = "",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (oracle side)."""
    stride = chunk_size - overlap
    return f"""
    SELECT
        {id_col},
        {extra_cols}
        CAST(s / {stride} AS INT) AS pos,
        substr({text_col}, CAST(s AS INT) + 1, {chunk_size}) AS chunk_text,
        CAST({id_col} AS VARCHAR) || '_' || CAST(CAST(s / {stride} AS INT) AS VARCHAR) AS chunk_id
    FROM (
        SELECT *, unnest(generate_series(0,
            CAST(floor((length({text_col}) - 1) / {stride}) AS BIGINT) * {stride},
            {stride})) AS s
        FROM {table}
        WHERE length({text_col}) > 0
    )
    """
