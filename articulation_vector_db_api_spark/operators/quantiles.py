"""Distributed exact weighted quantiles.

The reference has no aggregate surface at all (its only "analytics" is
Pinecone top-k, /root/reference/main.py:184-189); this operator exists
for the engine's training-data side: weighted medians drive balanced
shard cuts and robust per-domain statistics.

The naive form — one running-sum window PARTITION BY the group — has
parallelism |groups|: with 3 groups, three reducers each sort the whole
group (measured 9.6× wall-clock at 10× data, SCALE.md). This module is
the scalable decomposition, the same two-pass prefix-sum shape as
pack_sequences_token_budget:

1. rows land in ``n_buckets`` value-RANGE sub-buckets (monotone in the
   value, so bucket order is value order);
2. per-(group, bucket) weights aggregate in one shuffle;
3. an ``n_buckets``-row-per-group window computes bucket prefix sums
   and picks each group's TARGET bucket (the one whose cumulative range
   crosses half the total weight);
4. the exact boundary row is resolved by a running sum over the target
   bucket's rows alone.

Every heavy stage parallelizes by (group, bucket); the only
single-reducer window runs on ≤ n_buckets rows per group. Ties break on
``tie_cols`` so the result is deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_median_bucketed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tie_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Exact lower weighted median per group — the q=1/2 case of
    :func:`weighted_quantile_bucketed`."""
    q = weighted_quantile_bucketed(
        df, group_col, value_col, weight_col, tie_cols, 1, 2, n_buckets
    )
    return q.withColumnRenamed("weighted_quantile", "weighted_median")


def weighted_quantile_bucketed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tie_cols: list[str],
    q_num: int = 1,
    q_den: int = 2,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact lower weighted q-quantile (q = q_num/q_den, 0 < q ≤ 1) per
    group: the first value in (value, *tie_cols) order whose cumulative
    weight ``cw`` satisfies ``q_den*cw >= q_num*total_weight``. The
    quantile is passed as an integer RATIO so the threshold comparison
    stays in exact bigint arithmetic — a float q would make boundary
    rows flicker with summation order. Weights must be non-negative
    integers.

    Returns one row per group: (group_col, weighted_quantile,
    total_weight)."""
    bounds = df.groupBy(group_col).agg(
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.sum(weight_col).alias("__tw"),
    )
    # range bucketing is monotone in the value; all-equal groups
    # (hi == lo) collapse into bucket 0 and resolve in the final pass
    b = df.join(F.broadcast(bounds), group_col).withColumn(
        "__bucket",
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(value_col) - F.col("__lo"))
                / ((F.col("__hi") - F.col("__lo")) / float(n_buckets) + 1e-9)
            ).cast("int"),
        ),
    )
    per_bucket = b.groupBy(group_col, "__bucket").agg(
        F.sum(weight_col).alias("__bw"), F.min("__tw").alias("__tw")
    )
    w_prefix = (
        Window.partitionBy(group_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = per_bucket.select(
        group_col,
        "__bucket",
        "__tw",
        (F.sum("__bw").over(w_prefix) - F.col("__bw")).alias("__offset"),
        F.sum("__bw").over(w_prefix).alias("__cum"),
    )
    target = pref.filter(
        (q_den * F.col("__cum") >= q_num * F.col("__tw"))
        & (q_den * F.col("__offset") < q_num * F.col("__tw"))
    ).select(group_col, "__bucket", "__offset")
    w_in = (
        Window.partitionBy(group_col)
        .orderBy(value_col, *tie_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = b.join(F.broadcast(target), [group_col, "__bucket"]).select(
        group_col,
        value_col,
        "__tw",
        (F.col("__offset") + F.sum(weight_col).over(w_in)).alias("__cw"),
    )
    return (
        in_bucket.filter(q_den * F.col("__cw") >= q_num * F.col("__tw"))
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias("weighted_quantile"),
            F.min("__tw").alias("total_weight"),
        )
    )
