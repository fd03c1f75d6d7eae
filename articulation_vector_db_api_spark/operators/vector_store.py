"""Stored vector index: the IVF cell assignment persisted as the
table's PARTITION layout, so a probe is a partition-pruned read.

``ann_ivf_exact`` (suites/similarity.py) oracle-verifies the IVF
SEMANTICS in one plan; this module is the storage half of the same
design — the claim its docstring makes ("at 100 TB the chunk table is
written partitioned by cell") realized as operators:

- ``write_ivf_store``: assign each vector its cell, write parquet
  ``partitionBy(cell)`` (clustered first — same small-files discipline
  as operators/ingest.py), and publish the per-cell centroid table
  alongside as the broadcastable routing "index".
- ``probe_ivf_store``: route the query against the (tiny) centroid
  table, then read ONLY the probed cells — the cell predicate reaches
  the scan as a partition filter, so I/O is nprobe/n_cells of the
  corpus no matter how large the corpus grows. Exact re-rank inside
  the probed cells, top-k as a heap merge.

The cell assignment reuses the deterministic quantizer from
``ann_ivf_exact`` so both halves describe one index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg
from ..functions.vector import cosine


def write_ivf_store(
    vectors: DataFrame, path: str, n_cells: int
) -> None:
    """Partition the vector table by IVF cell and persist centroids.

    ``vectors``: (vec_id, embedding). Deterministic cell = vec_id %
    n_cells mirrors ann_ivf_exact's quantizer; a trained variant swaps
    this one projection for a broadcast-codebook argmin (see
    mllib_ivf_ann) — the storage layout below is identical either way.
    """
    ivf = vectors.select(
        "vec_id", "embedding", (F.col("vec_id") % n_cells).alias("cell")
    )
    ivf.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "vectors")
    )
    # persist the schema as the store's catalog entry: probes read with
    # it instead of footer-inferring, so opening the store touches NO
    # data files until the pruned scan itself
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "schema.json"), "w") as f:
        f.write(ivf.schema.json())
    flat = ivf.select("cell", F.posexplode("embedding")).select(
        "cell", F.col("pos").alias("idx"), F.col("col").cast("double").alias("v")
    )
    # decimal-exact means rounded to 6 (same pin as ann_ivf_exact):
    # routing is then bit-reproducible on any engine and any row order
    cent = (
        flat.groupBy("cell", "idx")
        .agg(F.round(davg(F.col("v")), 6).alias("cv"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "cv"))),
                lambda x: x["cv"],
            ).alias("centroid")
        )
    )
    cent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )


def probe_ivf_store(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int,
    k: int,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Top-k cosine search reading ONLY the probed cells.

    The centroid table (n_cells rows) routes the query; the resulting
    cell ids become an IN-filter on the partitioned vector table, which
    Spark turns into partition pruning at the scan — the probe's I/O is
    nprobe partitions regardless of corpus size.
    """
    from pyspark.sql.types import StructType

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with open(os.path.join(path, "schema.json")) as f:
        schema = StructType.fromJson(__import__("json").loads(f.read()))
    cent = spark.read.parquet(os.path.join(path, "centroids"))
    cells = [
        r.cell
        for r in cent.select(
            "cell", cosine(F.col("centroid"), q).alias("cs")
        )
        .orderBy(F.desc("cs"), "cell")
        .limit(nprobe)
        .collect()
    ]
    vecs = spark.read.schema(schema).parquet(os.path.join(path, "vectors"))
    if exclude_vec_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_vec_id)
    return (
        vecs.filter(F.col("cell").isin(cells))
        .select(
            "vec_id", "cell", cosine(F.col("embedding"), q).alias("raw")
        )
        .orderBy(F.desc("raw"), "vec_id")  # raw order: ties cut exactly
        .limit(k)
        .select("vec_id", "cell", F.round("raw", 6).alias("score"))
    )
