"""MLlib batch index construction (north star: "MLlib for batch
indexing").

The reference's index is Pinecone-managed and opaque
(/root/reference/main.py:23-71); the engine's scale-path index is an
MLlib LSH model fit as a BATCH job over the embedding table:

- cosine neighbors via the normalize-then-euclidean trick:
  for unit vectors, ||a-b||² = 2·(1-cos(a,b)), so
  BucketedRandomProjectionLSH over L2-normalized vectors ranks
  identically to cosine.
- the fitted model (random projections) is the reusable "index
  artifact": persist with model.save(), load in any job, and the
  transform adds bucket columns that the writer partitions by.

Determinism: models are fit with a fixed seed, so hashes are
reproducible run-to-run — but they are MLlib-internal, so these
operators take the rows-only correctness check (no DuckDB twin); the
sha256-based LSH in suites/similarity.py is the oracle-checked variant
of the same shape.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.ml.linalg import Vectors
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED_PLANES = 42


def normalized_vectors(embeddings: DataFrame) -> DataFrame:
    """embeddings(vec_id, embedding: array<float>) → (vec_id, features:
    Vector) L2-normalized, ready for euclidean-LSH ≈ cosine."""
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    unit = F.transform(F.col("embedding"), lambda x: x.cast("double") / norm)
    return embeddings.select(
        "vec_id", array_to_vector(unit).alias("features")
    )


def fit_brp_index(vectors: DataFrame, bucket_length: float = 0.5, tables: int = 3):
    """Fit the batch ANN index (random hyperplane projections)."""
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=tables,
        seed=SEED_PLANES,
    )
    return brp.fit(vectors)


def brp_neighbors(embeddings: DataFrame, query_vec_id: int, k: int) -> DataFrame:
    """approxNearestNeighbors against the batch-built index; returns
    (vec_id, cos_sim) with the euclidean distance converted back to
    cosine (unit vectors: cos = 1 - d²/2)."""
    vectors = normalized_vectors(embeddings)
    model = fit_brp_index(vectors)
    qrow = vectors.filter(F.col("vec_id") == query_vec_id).first()
    if qrow is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    hits = model.approxNearestNeighbors(
        vectors.filter(F.col("vec_id") != query_vec_id),
        Vectors.dense(qrow.features.toArray()),
        k,
    )
    return hits.select(
        "vec_id",
        F.round(1 - (F.col("distCol") * F.col("distCol")) / 2, 6).alias("cos_sim"),
    )


def brp_similarity_join(embeddings: DataFrame, max_cos_distance: float) -> DataFrame:
    """approxSimilarityJoin: all pairs within a cosine threshold via
    the batch index (distance threshold = sqrt(2·(1-cos_min)))."""
    import math

    vectors = normalized_vectors(embeddings)
    model = fit_brp_index(vectors)
    thresh = math.sqrt(2 * max_cos_distance)
    pairs = model.approxSimilarityJoin(vectors, vectors, thresh, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(1 - (F.col("dist") * F.col("dist")) / 2, 6).alias("cos_sim"),
        )
    )


def minhash_shingle_join(shingle_sets: DataFrame, max_jaccard_distance: float) -> DataFrame:
    """MLlib MinHashLSH over sparse shingle-presence vectors — the
    built-in twin of the hand-rolled banded minhash in suites/dedup.py.
    Input: (doc_id, features: sparse Vector of shingle ids)."""
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=SEED_PLANES
    )
    model = mh.fit(shingle_sets)
    pairs = model.approxSimilarityJoin(
        shingle_sets, shingle_sets, max_jaccard_distance, distCol="jdist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1 - F.col("jdist"), 6).alias("jaccard"),
        )
    )
