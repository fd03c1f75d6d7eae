"""Iterative graph operators: connected components for dedup clusters.

Near-dup detection (suites/dedup.py, suites/similarity.py) emits PAIRS;
curation needs CLUSTERS — each document assigned the canonical (minimum)
id of its transitive duplicate group. That closure is inherently
iterative: min-label propagation over the undirected pair graph until
fixpoint, a driver-side loop over DataFrames (the classic large-scale
connected-components shape; converges in O(graph diameter) rounds).

Scale: each round is one shuffle (join on node) + one aggregate; labels
monotonically decrease so convergence is guaranteed; caching the frontier
keeps rounds incremental. At 100 TB use the alternating small-star/
large-star variant to bound skew on high-degree nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    """(node) + (a, b) undirected edges → (node, component) where
    component = min node id reachable.

    Deterministic: min-label fixpoint is order-independent.
    """
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .cache()
    )
    labels = nodes.select(F.col("node"), F.col("node").alias("component")).cache()
    for _ in range(max_iters):
        # candidate labels arriving over edges
        incoming = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(incoming, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .cache()
        )
        changed = (
            updated.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
    sym.unpersist()
    return labels
