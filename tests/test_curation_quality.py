"""Quality properties of the curation/ANN operators that the value
oracles cannot express: PQ shortlist recall against the exact baseline,
semantic-cluster partition sanity, and BM25 ranking monotonicity.

Reference parity: the reference exposes only remote exact ANN
(main.py:184-189); these operators are the engine's scale paths, so
their quality bar is measured against the engine's own exact baseline.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def _rows(spark, name):
    from articulation_vector_db_api_spark.registry import load_all

    return load_all()[name].fn(spark, SF).collect()


def test_pq_adc_recall_vs_exact(spark):
    """ADC through a 50-candidate shortlist must recover half the exact
    top-10 even with the fixture's untrained codebooks (deterministic:
    exactly 5 of 10 on this data; k-means training only improves it)."""
    exact = {r.vec_id for r in _rows(spark, "ann_bruteforce_topk")}
    pq = {r.vec_id for r in _rows(spark, "ann_pq_adc_topk")}
    assert len(exact) == len(pq) == 10
    assert len(exact & pq) >= 5


def test_semantic_clusters_partition_corpus(spark):
    """k-means output must be a partition: members sum to the corpus,
    every cluster non-empty, representative is a member (min id), and
    dup counts bounded by the pair count of the cluster."""
    out = _rows(spark, "dedup_semantic_clusters")
    assert sum(r.n_members for r in out) == 500
    assert all(r.n_members > 0 for r in out)
    assert [r.cluster_id for r in out] == sorted(r.cluster_id for r in out)
    for r in out:
        assert r.n_dup_docs <= r.n_members - 1
        assert r.n_dup_pairs <= r.n_members * (r.n_members - 1) // 2


def test_bm25_scores_rank_term_hits(spark):
    """Every returned doc must actually contain a query term, scores
    must be non-increasing, and tf columns must be consistent with a
    positive score."""
    out = _rows(spark, "search_bm25")
    assert len(out) == 10
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(r.tf_0 + r.tf_1 + r.tf_2 > 0 for r in out)
