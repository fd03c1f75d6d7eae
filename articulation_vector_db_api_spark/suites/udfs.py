"""UDF/UDAF/UDTF suite (SURVEY §2.2 'UDF surface').

The reference's custom logic is two ad-hoc Python functions run in a
per-request loop (extract main.py:106, embed main.py:129). The engine
exposes the full Spark Python surface — always Arrow-batched, never
row-at-a-time pickling:

- scalar ``pandas_udf``      — vectorized per-row compute
- grouped-agg ``pandas_udf`` — custom aggregates
- ``applyInPandas``          — whole-group transforms
- Python UDTF                — one-row-to-many table functions

Determinism policy for oracle parity: UDF bodies either produce exact
values (integers, strings) or fold floats left-to-right from 0.0 (the
same IEEE sequence as the SQL twin) — pandas/numpy pairwise sums are
NOT reproducible across engines and are banned in checked outputs.

Scale: these are the slow path (Python workers); everything that CAN
be a built-in expression is one (see the other suites). What remains
here is the shape real pipelines need for model inference, custom
featurizers, and codecs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.readers import load_table


@F.pandas_udf(T.DoubleType())
def _l2_norm_udf(vecs: pd.Series) -> pd.Series:
    import math

    def norm(v) -> float:
        acc = 0.0
        for x in v:  # explicit left fold — bit-compatible with SQL fold
            xd = float(x)
            acc += xd * xd
        return math.sqrt(acc)

    return vecs.map(norm)


@register(
    "udf_pandas_vector_norm",
    oracle="""
    SELECT vec_id,
           sqrt(list_reduce(list_prepend(0.0,
                list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                (acc, v) -> acc + v)) AS l2_norm
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("udf",),
)
def udf_pandas_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched) computing vector L2 norms —
    the slot where a real model embedder plugs in. The Python fold
    matches the SQL fold bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", _l2_norm_udf(F.col("embedding")).alias("l2_norm")).orderBy(
        "vec_id"
    )


@F.pandas_udf(T.DoubleType())
def _price_range_udf(prices: pd.Series) -> float:
    return float(prices.max() - prices.min())  # order-insensitive → exact


@register(
    "udf_grouped_agg_price_range",
    oracle="""
    SELECT o_orderstatus, max(o_totalprice) - min(o_totalprice) AS price_range
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("udf",),
)
def udf_grouped_agg_price_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (custom UDAF): per-status price
    range. max/min are order-insensitive, so the custom aggregate is
    exactly reproducible."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(_price_range_udf(F.col("o_totalprice")).alias("price_range"))
        .orderBy("o_orderstatus")
    )


_GAPS_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("gap_days", T.LongType()),
    ]
)


def _order_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["o_orderdate", "o_orderkey"]).reset_index(drop=True)
    gaps = pdf["o_orderdate"].diff().dt.days  # integer day gaps → exact
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "seq": range(1, len(pdf) + 1),
            "gap_days": gaps,
        }
    )


@register(
    "udf_applyinpandas_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INT) AS seq,
           datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, seq
    """,
    tags=("udf",),
)
def udf_applyinpandas_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas whole-group transform: per-customer order sequence
    numbers and inter-order gaps — the grouped-pandas shape used for
    per-entity featurization. Integer outputs → exact parity with the
    window-function twin."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .groupBy("o_custkey")
        .applyInPandas(_order_gaps, _GAPS_SCHEMA)
        .orderBy("o_custkey", "seq")
    )


@register(
    "udtf_char_trigrams",
    oracle="""
    SELECT doc_id,
           CAST(pos AS INT) AS pos,
           substr(text, CAST(pos AS INT), 3) AS trigram
    FROM (
        SELECT doc_id, text, unnest(generate_series(1, length(text) - 2)) AS pos
        FROM documents
        WHERE doc_id % 100 = 0 AND length(text) >= 3
    )
    ORDER BY doc_id, pos
    """,
    tags=("udf",),
)
def udtf_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one row → many): character trigram expansion for a
    doc sample. String outputs → exact parity with the generate_series
    twin. ``useArrow=True`` plans as ArrowEvalPythonUDTF — Arrow-batch
    transfer like every other Python boundary in the engine; without it
    a UDTF is the one row-pickling (BatchEvalPython) hole in the
    no-row-at-a-time rule (plan-audited in tools/check_plans.py)."""

    @F.udtf(returnType="pos: int, trigram: string", useArrow=True)
    class Trigrams:
        def eval(self, text: str):  # noqa: ANN001
            if text:
                for i in range(len(text) - 2):
                    yield i + 1, text[i : i + 3]

    spark.udtf.register("char_trigrams", Trigrams)
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 100 == 0) & (F.length("text") >= 3)
    )
    docs.createOrReplaceTempView("_trigram_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.trigram
        FROM _trigram_docs d, LATERAL char_trigrams(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


@register(
    "udf_mapinarrow_bytelen",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 64 AS tail_bytes
    FROM documents
    WHERE doc_id % 25 = 0
    ORDER BY doc_id
    """,
    tags=("udf", "arrow"),
)
def udf_mapinarrow_bytelen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy tier of the Python UDF ladder — the
    batch arrives as a pyarrow RecordBatch (no pandas materialization,
    no per-row pickling), the right entry point for Arrow-native
    libraries (tokenizers, polars, DuckDB-in-worker). Integer byte
    math only, so the oracle is exact; float work would follow the same
    plumbing. Partition-parallel, zero shuffle."""
    import pyarrow as pa

    def batches(it):
        for batch in it:
            d = batch.column("doc_id")
            t = batch.column("text")
            nb = pa.compute.binary_length(
                pa.compute.cast(t, pa.binary())
            )
            yield pa.RecordBatch.from_arrays(
                [
                    d,
                    pa.compute.cast(nb, pa.int64()),
                    pa.compute.cast(
                        pa.compute.subtract(
                            nb, pa.compute.multiply(pa.compute.divide(nb, 64), 64)
                        ),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_bytes", "tail_bytes"],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", "text")
    )
    out = docs.mapInArrow(
        batches, "doc_id long, n_bytes long, tail_bytes long"
    )
    return out.orderBy("doc_id")
