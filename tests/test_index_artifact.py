"""Index-artifact lifecycle: the MLlib LSH model is the engine's
persistent 'index' (the analog of the reference's Pinecone index,
/root/reference/main.py:23-71) — fit once as a batch job, save, load
anywhere, query identically."""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSHModel

from articulation_vector_db_api_spark.operators.mllib_index import (
    fit_brp_index,
    normalized_vectors,
)
from articulation_vector_db_api_spark.sources.readers import load_table
from tests.conftest import SF_SMALL


def test_lsh_index_save_load_roundtrip(spark, tmp_path):
    vectors = normalized_vectors(load_table(spark, SF_SMALL, "embeddings")).cache()
    model = fit_brp_index(vectors)
    path = str(tmp_path / "brp_index")
    model.write().overwrite().save(path)

    loaded = BucketedRandomProjectionLSHModel.load(path)
    orig = model.transform(vectors).select("vec_id", "hashes").collect()
    back = loaded.transform(vectors).select("vec_id", "hashes").collect()
    to_map = lambda rows: {  # noqa: E731
        r.vec_id: [tuple(v.toArray()) for v in r.hashes] for r in rows
    }
    assert to_map(orig) == to_map(back)  # identical bucket assignments


def _q(spark, name, sf=SF_SMALL):
    from articulation_vector_db_api_spark.registry import load_all

    return load_all()[name].fn(spark, sf).collect()


def test_mllib_ann_neighbors_vs_exact_ground_truth(spark):
    """The rows-only mllib_ann_neighbors query, verified IN-engine
    against the exact-oracle sibling: every returned cos_sim must equal
    the true cosine (the LSH index must not distort scores, only
    candidate selection), and recall@10 vs the exact top-10 must clear
    the same bar the sha256-LSH variant is held to."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.functions.vector import cosine
    from articulation_vector_db_api_spark.sources.readers import load_table

    got = _q(spark, "mllib_ann_neighbors")
    assert len(got) == 10
    e = load_table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    truth = {
        r.vec_id: r.score
        for r in e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 6).alias("score")
        )
        .collect()
    }
    for r in got:
        assert abs(round(r.cos_sim, 6) - truth[r.vec_id]) < 1e-6
    exact_top = {
        v for v, _ in sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    assert len(exact_top & {r.vec_id for r in got}) >= 5  # recall@10 ≥ 0.5


def test_mllib_similarity_join_pairs_are_true_pairs(spark):
    """Every pair the MLlib LSH join emits must truly clear the cosine
    threshold (no false positives in the emitted set — the join
    re-ranks exactly), checked against directly computed cosines."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.functions.vector import cosine
    from articulation_vector_db_api_spark.sources.readers import load_table

    got = _q(spark, "mllib_similarity_join")
    assert got, "join emitted no pairs on the fixture"
    e = load_table(spark, SF_SMALL, "embeddings")
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = {(min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b)) for r in got}
    truth = {
        (r.va, r.vb): r.c
        for r in a.crossJoin(b)
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb", F.round(cosine("ea", "eb"), 6).alias("c"))
        .collect()
    }
    for pa, pb in pairs:
        assert truth[(pa, pb)] >= 0.3 - 1e-6, (pa, pb, truth[(pa, pb)])


def test_mllib_ivf_ann_scores_and_recall(spark):
    """mllib_ivf_ann's exact re-rank inside the probed KMeans cell:
    scores must equal true cosines, all candidates come from ONE cell,
    and single-cell recall@10 vs the exact scan is nontrivial."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.functions.vector import cosine
    from articulation_vector_db_api_spark.sources.readers import load_table

    got = _q(spark, "mllib_ivf_ann")
    assert got and len({r.cell_id for r in got}) == 1
    e = load_table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    truth = {
        r.vec_id: r.score
        for r in e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q")), 6).alias("score"),
        )
        .collect()
    }
    for r in got:
        assert abs(r.score - truth[r.vec_id]) < 1e-6
    exact_top = {
        v for v, _ in sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    assert len(exact_top & {r.vec_id for r in got}) >= 2  # 1-cell probe


def test_mllib_minhash_pairs_have_true_overlap(spark):
    """Every pair mllib_minhash_dedup emits must truly share shingles:
    recompute 3-gram shingle sets in python and require Jaccard ≥ 0.3
    (the query's 0.7 max-distance threshold) for every emitted pair."""
    import re as _re

    got = _q(spark, "mllib_minhash_dedup")
    assert got, "no near-dup pairs on the fixture"
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }

    def sh(text):
        toks = _re.split(r"\s+", text.strip())
        if len(toks) < 3:
            return {text}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in got:
        a, b = sh(docs[r.doc_a]), sh(docs[r.doc_b])
        j = len(a & b) / len(a | b)
        assert j >= 0.3 - 1e-9, (r.doc_a, r.doc_b, j)
