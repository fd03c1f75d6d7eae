"""MLlib batch-indexing suite (north star: "MLlib for batch indexing").

Rows-only correctness checks: MLlib's hash families are
engine-internal (no DuckDB twin exists by definition); the sha256-LSH
variants in suites/similarity.py carry the exact-oracle burden for the
same operator shapes. Determinism within Spark is still guaranteed via
fixed seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mllib_index import (
    brp_neighbors,
    brp_similarity_join,
    minhash_shingle_join,
)
from ..registry import register
from ..sources.readers import load_table, spread_input


@register("mllib_ann_neighbors", oracle=None, tags=("mllib", "similarity"))
def mllib_ann_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN via BucketedRandomProjectionLSH (normalize → euclidean
    ≈ cosine): top-10 neighbors of vec 0 from the fitted index.
    Rows-only: BRP hash buckets are MLlib-internal (no SQL twin);
    ann_bruteforce_topk carries the exact-oracle burden for top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    return brp_neighbors(e, query_vec_id=0, k=10).orderBy(
        F.desc("cos_sim"), "vec_id"
    )


@register("mllib_similarity_join", oracle=None, tags=("mllib", "similarity"))
def mllib_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch all-pairs similarity join from the LSH index (cosine ≥ 0.3
    → euclidean threshold √(2·0.7) on unit vectors).
    Rows-only: LSH bucketing is MLlib-internal; similarity_near_dup_cosine
    is the exact-oracle twin of the same join shape."""
    e = load_table(spark, sf_dir, "embeddings")
    return brp_similarity_join(e, max_cos_distance=0.7).orderBy("vec_a", "vec_b")


@register("mllib_ivf_ann", oracle=None, tags=("mllib", "similarity"))
def mllib_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans coarse quantizer (seeded) →
    cells; probe = exact re-rank within the query's nearest cell.
    Rows-only: KMeans cell assignment is seed/init-internal (no SQL
    twin); ann_ivf_exact is the sha256-codebook exact-oracle twin. The
    centroid table is the tiny broadcastable 'index'; at 100 TB the
    vector table is WRITTEN partitioned by cell_id so a probe is a
    partition-pruned read, and recall is tuned by probing n>1 cells."""
    from pyspark.ml.clustering import KMeans

    from ..functions.vector import cosine
    from ..operators.mllib_index import normalized_vectors

    e = load_table(spark, sf_dir, "embeddings")
    vectors = normalized_vectors(e)
    km = KMeans(k=8, seed=7, featuresCol="features", predictionCol="cell_id")
    model = km.fit(vectors)
    assigned = model.transform(vectors).select("vec_id", "cell_id")
    with_cell = e.join(assigned, "vec_id")

    qcell = assigned.filter(F.col("vec_id") == 0).select(
        F.col("cell_id").alias("qcell")
    )
    qvec = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    cand = (
        with_cell.join(F.broadcast(qcell), F.col("cell_id") == F.col("qcell"))
        .join(F.broadcast(qvec))
        .filter(F.col("vec_id") != 0)
    )
    return (
        cand.select(
            "vec_id",
            "cell_id",
            F.round(cosine(F.col("embedding"), F.col("q")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


@register("mllib_tfidf_pipeline", oracle=None, tags=("mllib", "textops"))
def mllib_tfidf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MLlib text-featurization chain (Tokenizer → StopWordsRemover
    → HashingTF → IDF): per-doc sparse TF-IDF vectors, reduced here to
    (doc_id, n_terms, top_weight) summaries. Rows-only: hashed feature
    indices are engine-internal (text_tfidf_top_terms is the exact
    twin)."""
    from pyspark.ml.feature import IDF, HashingTF, StopWordsRemover, Tokenizer

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    docs = docs.transform(spread_input, sf_dir, "documents")
    pipe = [
        Tokenizer(inputCol="text", outputCol="raw_tokens"),
        StopWordsRemover(inputCol="raw_tokens", outputCol="tokens"),
        HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 16),
    ]
    staged = docs
    for stage in pipe:
        staged = stage.transform(staged)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(staged)
    feats = idf_model.transform(staged)

    # Stay JVM-side: vector_to_array densifies the sparse vector inside
    # codegen (only on the sampled rows — the filter sits below it), and
    # n_terms/top_weight are array expressions. n_terms counts NONZERO
    # weights, which also drops explicit idf=0 entries (terms present in
    # every document) that a stored-values count would include.
    from pyspark.ml.functions import vector_to_array

    nz = F.filter(vector_to_array(F.col("tfidf")), lambda x: x != 0.0)
    return (
        feats.filter(F.col("doc_id") % 100 == 0)
        .select(
            "doc_id",
            F.size(nz).alias("n_terms"),
            F.round(F.coalesce(F.array_max(nz), F.lit(0.0)), 6).alias("top_weight"),
        )
        .orderBy("doc_id")
    )


@register(
    "mllib_count_vectorizer",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (SELECT count(DISTINCT token) AS vocab_size FROM tok),
    per_doc AS (
        SELECT doc_id, count(DISTINCT token) AS n_doc_terms
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_doc_terms, vocab_size
    FROM per_doc CROSS JOIN vocab
    WHERE doc_id % 100 = 0
    ORDER BY doc_id
    """,
    tags=("mllib", "textops"),
)
def mllib_count_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountVectorizer: an EXACT learned vocabulary (vs HashingTF's
    hashed one) — the fitted model's vocabulary size and each doc's
    distinct-term count are engine-independent facts, so this MLlib
    pipeline is oracle-checked exactly."""
    from pyspark.ml.feature import CountVectorizer

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    with_tokens = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), " ").alias("tokens")
    )
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", vocabSize=1 << 18, minDF=1.0)
    model = cv.fit(with_tokens)
    vocab_size = len(model.vocabulary)
    # Term counts in the fitted vector are >= 1, so nonzero entries ==
    # distinct tokens — computed JVM-side (vector_to_array + filter)
    # on the sampled rows only; no Python UDF in the plan.
    from pyspark.ml.functions import vector_to_array

    nz = F.filter(vector_to_array(F.col("tf")), lambda x: x != 0.0)
    return (
        model.transform(with_tokens)
        .filter(F.col("doc_id") % 100 == 0)
        .select(
            "doc_id",
            F.size(nz).cast("long").alias("n_doc_terms"),
            F.lit(vocab_size).cast("long").alias("vocab_size"),
        )
        .orderBy("doc_id")
    )


@register("mllib_minhash_dedup", oracle=None, tags=("mllib", "dedup"))
def mllib_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH near-dup over hashed shingle-presence vectors —
    the built-in counterpart of suites/dedup.py's banded minhash.
    Rows-only: HashingTF indices + MinHash coefficients are
    MLlib-internal; dedup_minhash_lsh carries the exact oracle."""
    from pyspark.ml.feature import HashingTF

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.transform(spread_input, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    shingles = F.when(F.size(tokens) < 3, F.array(F.col("text"))).otherwise(
        F.array_distinct(
            F.transform(
                # slice keeps the gram build in codegen; getItem with a
                # Column index drops to interpreted evaluation (~50x)
                F.sequence(F.lit(1), F.size(tokens) - 2),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, 3)),
            )
        )
    )
    with_sh = docs.select("doc_id", shingles.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    featurized = tf.transform(with_sh)
    return minhash_shingle_join(featurized, max_jaccard_distance=0.7).orderBy(
        "doc_a", "doc_b"
    )
