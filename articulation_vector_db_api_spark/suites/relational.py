"""Relational suite (SURVEY §2.2, M3): the operator categories the
reference lacks entirely (its only query engine is Pinecone's remote
ANN, /root/reference/main.py:184-189), built as engine capabilities on
Spark built-ins over the TPC-H-ish fixtures.

Scale notes are per-query docstrings: which side broadcasts, where the
shuffle is, what AQE does at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hex_to_u32_sql, sha_hash32, sha_hash32_sql
from ..functions.numeric import davg, davg_sql, dsum, dsum_sql
from ..registry import register
from ..sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# scans / projection / filter / predicates
# --------------------------------------------------------------------------


@register(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
      AND l_quantity > 45
      AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("relational", "scan"),
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicates. Catalyst pushes all four
    filters into the parquet scan (PushedFilters) and prunes to 6 of 11
    columns (ReadSchema) — at 100 TB this is the difference between
    reading 4 TB and 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "net_price"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql("l_quantity")} AS sum_qty,
           {dsum_sql("l_extendedprice")} AS sum_base_price,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           {davg_sql("l_quantity")} AS avg_qty,
           {davg_sql("l_extendedprice")} AS avg_price,
           {davg_sql("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags=("relational", "agg"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash aggregate over the fact table.
    Catalyst plans partial(map-side) + final HashAggregate — the 100 TB
    shuffle carries only 6 grouped rows per task, not the table. Sums
    ride the exact decimal path (functions/numeric.py) so results are
    order-independent."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation: Catalyst plans an Expand + two-phase
    aggregate; distinct shuffles on (group, value) so hot groups still
    parallelize across the cluster."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS within_rsd
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "approx"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for
    distinct stats — fixed-size sketch per partition, no (group, value)
    shuffle. The HLL++ estimate itself is engine-specific, so the
    driver-checked output carries a BOUNDED-ERROR WITNESS instead: the
    exact distinct count plus ``within_rsd`` =
    |approx − exact| / exact ≤ 5·rsd, which the oracle expects to be
    true (the r10 portable-register pattern applied to the estimate;
    pytest still pins the raw estimate). The exact twin aggregation
    exists only to witness the bound — production dashboards read the
    sketch alone."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.05
            ).alias("within_rsd"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_stats_moments",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {davg_sql("l_quantity")} AS mean_qty,
           ({dsum_sql("l_quantity * l_quantity")}
             - {dsum_sql("l_quantity")} * {dsum_sql("l_quantity")} / count(*))
             / (count(*) - 1) AS var_qty,
           sqrt(({dsum_sql("l_quantity * l_quantity")}
             - {dsum_sql("l_quantity")} * {dsum_sql("l_quantity")} / count(*))
             / (count(*) - 1)) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev rebuilt from exact decimal moments (Σx, Σx²)
    instead of the built-in streaming variance — the built-ins
    accumulate doubles in partition order and are NOT reproducible
    across engines or runs; the moment formula is. Same single-pass
    partial+final aggregate shape."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(F.lit(1))
    sum_q = dsum(q)
    sum_q2 = dsum(q * q)
    var = (sum_q2 - sum_q * sum_q / n) / (n - 1)
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            davg(q).alias("mean_qty"),
            var.alias("var_qty"),
            F.sqrt(var).alias("stddev_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
           round(min(o_totalprice), 6) AS min_price,
           round(max(o_totalprice), 6) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90). At 100 TB swap for
    approx_percentile (t-digest sketch) — exact percentiles require a
    per-group sort; both are one groupBy away in this engine."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
            F.round(F.min("o_totalprice"), 6).alias("min_price"),
            F.round(F.max("o_totalprice"), 6).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("relational", "join"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: a 5-table snowflake join tree. The fact⋈fact
    edge (lineitem⋈orders) shuffles; the fixed-cardinality dims
    (nation, region) broadcast, the SF-growing customer side is AQE's
    call — the canonical star-join plan at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    # customer grows with SF (15B rows at the 100 TB point) — no
    # forced broadcast; AQE picks the strategy per actual size. The
    # fixed-cardinality dims (nation 25, region 5) keep the hint.
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "approx_percentile_prices",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           true AS median_within_tol,
           true AS p90_within_tol
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "agg", "approx"),
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): the 100 TB percentile path
    — mergeable fixed-size sketches instead of a per-group sort. The
    sketch estimates are engine-specific, so the driver-checked output
    carries BOUNDED-ERROR WITNESSES: with accuracy 10000 the rank error
    is ≤ 1e-4·n, far inside a 2% value tolerance against the exact
    in-engine percentile, which the oracle expects to be true
    (agg_percentiles carries the exact value-checked variant)."""
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    tol = 0.02

    def _within(approx: F.Column, exact: F.Column) -> F.Column:
        return F.abs(approx.cast("double") - exact) / exact <= tol

    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.approx_percentile(price, F.lit(0.5), F.lit(10000)).alias("am"),
            F.approx_percentile(price, F.lit(0.9), F.lit(10000)).alias("a9"),
            F.percentile(price.cast("double"), F.lit(0.5)).alias("em"),
            F.percentile(price.cast("double"), F.lit(0.9)).alias("e9"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            _within(F.col("am"), F.col("em")).alias("median_within_tol"),
            _within(F.col("a9"), F.col("e9")).alias("p90_within_tol"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "join"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: six-table join with the nation dim joined TWICE
    under different roles (supplier vs customer side) — alias
    discipline plus two broadcasts of the same fixed-size table."""
    li = _t(spark, sf_dir, "lineitem")
    # supplier/customer grow with SF — AQE decides those joins; only
    # the 25-row nation dim keeps its (twice-aliased) broadcast hint
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("s_nkey"))
        .join(n2, c.c_nationkey == F.col("c_nkey"))
        .filter(
            (F.col("s_nkey") < 3)
            & (F.col("c_nkey") < 3)
            & (F.col("s_nkey") != F.col("c_nkey"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q17_SQL = """
    SELECT p_brand,
           count(*) AS n_small_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS small_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (
        SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,8))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
    )
    GROUP BY p_brand
    ORDER BY p_brand
"""


@register(
    "q17_correlated_subquery",
    oracle=_Q17_SQL,
    tags=("relational", "subquery"),
)
def q17_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a CORRELATED scalar subquery (per-part average
    quantity) that Catalyst decorrelates into an aggregate + join —
    executed as written via spark.sql to exercise the decorrelation
    rule, not a hand rewrite. Deterministic via the decimal-avg path."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_Q17_SQL)


@register(
    "q8_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           {dsum_sql("CASE WHEN n_name = 'NATION_0' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dsum_sql("l_extendedprice * (1 - l_discount)")} AS mkt_share,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    GROUP BY year(o_orderdate)
    ORDER BY o_year
    """,
    tags=("relational", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share per year — the
    conditional-aggregate-ratio pattern (two decimal-exact sums divided
    in double; no second scan, no self-join)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")  # SF-growing: AQE decides
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("n_name") == "NATION_0", rev).otherwise(F.lit(0.0))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (dsum(target) / dsum(rev)).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


@register(
    "sort_global_prices",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice
    FROM orders
    WHERE o_orderkey % 5 = 0
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    tags=("relational", "sort"),
)
def sort_global_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort WITHOUT a limit: range-partitioning
    exchange (sampled split points) + per-partition sort — the only
    operator family where the engine accepts a full-data exchange, used
    for sorted exports. Everything top-k shaped uses
    TakeOrderedAndProject instead (see PLANS.md)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    return o.select(
        "o_orderkey", F.round("o_totalprice", 6).alias("totalprice")
    ).orderBy(F.desc("o_totalprice"), "o_orderkey")


@register(
    "rollup_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {dsum_sql("o_totalprice")} AS revenue,
           count(*) AS n_orders,
           (CASE WHEN r_name IS NULL THEN 2 ELSE 0 END
            + CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS gid
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY gid, r_name, n_name
    """,
    tags=("relational", "agg"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a snowflake join: revenue by region→nation→total.
    nation/region are broadcast dims; the rollup is one Expand node,
    not three scans."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            dsum(F.col("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


@register(
    "cube_order_status",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue,
           (CASE WHEN o_orderstatus IS NULL THEN 2 ELSE 0 END
            + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
    tags=("relational", "agg"),
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations in one Expand + aggregate."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@register(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT c_mktsegment, o_orderstatus,
           {dsum_sql("o_totalprice")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))
    ORDER BY c_mktsegment, o_orderstatus
    """,
    tags=("relational", "agg"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent groupings, one pass."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupingSets(
            [["c_mktsegment"], ["o_orderstatus"]], "c_mktsegment", "o_orderstatus"
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
        .orderBy("c_mktsegment", "o_orderstatus")
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    tags=("relational", "join"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    customer(filtered) broadcasts under AQE; lineitem⋈orders is the one
    real shuffle; the final top-10 is TakeOrderedAndProject (no global
    sort)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "join_broadcast_snowflake",
    oracle=f"""
    SELECT r_name,
           count(*) AS n_customers,
           {davg_sql("c_acctbal")} AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("relational", "join"),
)
def join_broadcast_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension chain: BroadcastHashJoin,
    zero shuffle on the probe side — the only join strategy that
    survives a 100 TB fact table with KB-sized dims."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg(F.col("c_acctbal")).alias("avg_bal"),
        )
        .orderBy("r_name")
    )


@register(
    "join_sortmerge_fact",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_lines,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    headline=True,
    tags=("relational", "join"),
)
def join_sortmerge_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi-join forced to SortMergeJoin (the 100 TB strategy
    when neither side broadcasts). Both sides shuffle on orderkey; with
    bucketed tables (operators/ingest.py writes bucketed chunk tables)
    the same plan elides the shuffle entirely."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "join_semi_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("relational", "join"),
)
def join_semi_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): probe side never duplicates, build side
    only ships the join key — the cheap existence check at scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_no_urgent",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("relational", "join"),
)
def join_anti_customers_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — the dedup/difference workhorse."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_theta_supplier_pairs",
    oracle="""
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           round(abs(a.s_acctbal - b.s_acctbal), 6) AS bal_gap
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey
     AND abs(a.s_acctbal - b.s_acctbal) < 100.0
    ORDER BY supp_a, supp_b
    """,
    tags=("relational", "join"),
)
def join_theta_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join → BroadcastNestedLoopJoin. Only sane when
    one side is small (supplier is the smallest table); at 100 TB a
    theta join must be banded into an equi-join on a bucket key first
    (see dedup suite for that pattern)."""
    a = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_a"), F.col("s_acctbal").alias("bal_a")
    )
    b = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_b"), F.col("s_acctbal").alias("bal_b")
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("supp_a") < F.col("supp_b"))
            & (F.abs(F.col("bal_a") - F.col("bal_b")) < 100.0),
        )
        .select(
            "supp_a",
            "supp_b",
            F.round(F.abs(F.col("bal_a") - F.col("bal_b")), 6).alias("bal_gap"),
        )
        .orderBy("supp_a", "supp_b")
    )


@register(
    "join_range_calendar",
    oracle=f"""
    WITH months AS (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '2001-12-01',
                                      INTERVAL 1 MONTH)) AS month_start
    ),
    windows AS (
        SELECT CAST(month_start AS DATE) AS month_start,
               CAST(month_start + INTERVAL 1 MONTH AS DATE) AS month_end
        FROM months
    )
    SELECT month_start,
           count(*) AS n_lines,
           {dsum_sql("l_quantity")} AS total_qty
    FROM lineitem JOIN windows
      ON l_shipdate >= month_start AND l_shipdate < month_end
    GROUP BY month_start
    HAVING count(*) > 0
    ORDER BY month_start
    """,
    tags=("relational", "join", "range"),
)
def join_range_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a broadcast calendar dimension
    (ship_date BETWEEN window bounds): the generic interval-assignment
    shape (rate tables, SLA windows, fiscal calendars). The tiny range
    side MUST broadcast — a shuffled range join has no equi-key. Where
    windows align to a calendar function (as here) prefer date_trunc;
    this operator exists for windows that don't."""
    months = spark.sql(
        "SELECT explode(sequence(date'1995-01-01', date'2001-12-01',"
        " interval 1 month)) AS month_start"
    ).select(
        "month_start", F.add_months("month_start", 1).alias("month_end")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(months),
            (F.col("l_shipdate") >= F.col("month_start"))
            & (F.col("l_shipdate") < F.col("month_end")),
        )
        .groupBy("month_start")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_quantity")).alias("total_qty"),
        )
        .orderBy("month_start")
    )


@register(
    "join_asof_event_order",
    oracle="""
    WITH tagged AS (
        SELECT o_custkey AS key, o_orderdate AS ts, 0 AS is_event,
               o_orderkey AS okey, o_totalprice AS price,
               NULL::BIGINT AS event_id
        FROM orders
        UNION ALL
        SELECT user_id, ts, 1, NULL, NULL, event_id FROM events
    ),
    filled AS (
        SELECT *,
               last_value(okey IGNORE NULLS) OVER w AS last_orderkey,
               last_value(price IGNORE NULLS) OVER w AS last_price
        FROM tagged
        WINDOW w AS (PARTITION BY key ORDER BY ts, is_event, okey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, key AS user_id,
           last_orderkey AS o_orderkey, last_price AS o_totalprice
    FROM filled
    WHERE is_event = 1 AND last_orderkey IS NOT NULL
    ORDER BY event_id
    """,
    tags=("relational", "join", "asof"),
)
def join_asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each event matched to the user's most recent order
    at event time. Spark lacks a native as-of join; the scalable
    encoding is union + last(ignorenulls) over a (key, time) window —
    one shuffle on user, no per-row subqueries. Ties broken
    (ts, is_event, orderkey) so the order row lands before same-ts
    events deterministically."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_event"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("okey"),
        F.lit(None).cast("double").alias("price"),
        F.col("event_id"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("key")
        .orderBy("ts", "is_event", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = o.unionByName(e).select(
        "*",
        F.last("okey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("price", ignorenulls=True).over(w).alias("last_price"),
    )
    return (
        filled.filter((F.col("is_event") == 1) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("last_orderkey").alias("o_orderkey"),
            F.col("last_price").alias("o_totalprice"),
        )
        .orderBy("event_id")
    )


@register(
    "join_salted_skew",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("relational", "join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salted join — the hot-key pattern for when AQE's skew
    split isn't available (e.g., bucketed inputs): the large side gets
    a deterministic salt from a secondary column, the small side
    explodes × SALT replicas, the join key becomes (key, salt). Result
    is provably identical to the plain join (the oracle IS the plain
    join); each hot key's rows spread across SALT tasks."""
    salt_n = 8
    o = _t(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(salt_n)).cast("int")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "scalar_subquery_above_avg",
    oracle=f"""
    SELECT c_custkey, round(c_acctbal, 6) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT {davg_sql("c_acctbal")} FROM customer)
    ORDER BY c_custkey
    """,
    tags=("relational", "subquery"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global average balance.
    The 1-row aggregate broadcasts; no correlated per-row execution."""
    c = _t(spark, sf_dir, "customer")
    avg_df = c.agg(davg(F.col("c_acctbal")).alias("_avg"))
    return (
        c.join(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .select("c_custkey", F.round("c_acctbal", 6).alias("acctbal"))
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# sorts / limits / set ops / pivot
# --------------------------------------------------------------------------


@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("relational", "sort"),
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject —
    per-partition heaps of size k merged on the driver; never a full
    sort, never a full shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@register(
    "topk_pagination",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
    tags=("relational", "sort"),
)
def topk_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (page 2 of a sorted listing): offset+limit over a
    total order. Spark plans offset+limit together (CollectLimit with
    skip) — still no global sort; deeper pages cost more, so keyset
    pagination (WHERE sortkey < last_seen) is the 100 TB pattern."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 6).alias("totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(10)
    )


@register(
    "setop_except_all",
    oracle="""
    SELECT n_nationkey AS nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    )
    ORDER BY nationkey
    """,
    tags=("relational", "setop"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, occurrence-counted): removes
    one occurrence per match instead of deduplicating — the correct
    semantics when rows are events, not sets."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).orderBy("nationkey")


@register(
    "setop_nations_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("relational", "setop"),
)
def setop_nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): planned as an aggregate + semi join."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "setop_nations_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("relational", "setop"),
)
def setop_nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): anti-join encoding of set difference."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@register(
    "setop_union_all_counts",
    oracle="""
    SELECT nationkey, count(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey
    """,
    tags=("relational", "setop"),
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: pure concatenation of partitions, zero shuffle."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


@register(
    "sql_interface_revenue",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("relational", "sql"),
)
def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL-string surface: temp view + ``spark.sql`` —
    identical Catalyst plan to the DataFrame API (they are the same
    logical algebra); exists so SQL-first users of the engine are a
    first-class audience."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        FROM v_orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "agg_ordered_collect",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_custkey) AS top_names,
           string_agg(CAST(c_custkey AS VARCHAR), ','
                      ORDER BY c_acctbal DESC, c_custkey) AS top_keys
    FROM (
        SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    WHERE rn <= 3
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("relational", "agg"),
)
def agg_ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string/array aggregation (listagg): top-3 customers per
    segment concatenated in rank order. collect_list order is
    nondeterministic in a distributed agg, so the engine ranks first
    and array_sorts (rank, value) structs — same pattern as the search
    context assembly."""
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    top = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    ranked_name = F.struct(F.col("rn"), F.col("c_name").alias("v"))
    ranked_key = F.struct(F.col("rn"), F.col("c_custkey").alias("v"))
    return (
        top.groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(ranked_name)), lambda s: s.getField("v")
                ),
                ",",
            ).alias("top_names"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(ranked_key)),
                    lambda s: s.getField("v").cast("string"),
                ),
                ",",
            ).alias("top_keys"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "nested_agg_big_spenders",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey, c_nationkey,
               {dsum_sql("o_totalprice")} AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_custkey, c_nationkey
    ),
    nation_avg AS (
        SELECT c_nationkey,
               {dsum_sql("total_spend")} / count(*) AS avg_spend
        FROM spend GROUP BY c_nationkey
    )
    SELECT s.o_custkey AS custkey, s.c_nationkey AS nationkey,
           round(s.total_spend, 6) AS total_spend,
           round(n.avg_spend, 6) AS nation_avg_spend
    FROM spend s JOIN nation_avg n ON s.c_nationkey = n.c_nationkey
    WHERE s.total_spend > 2 * n.avg_spend
    ORDER BY custkey
    """,
    tags=("relational", "agg", "subquery"),
)
def nested_agg_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level nested aggregation (TPC-H Q20 family): per-customer
    totals compared against their nation's average of those totals.
    The inner aggregate reuses its own output for the outer one — one
    extra shuffle on the nation key, no rescan of the fact table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", "c_nationkey")
        .agg(dsum(F.col("o_totalprice")).alias("total_spend"))
    )
    nation_avg = spend.groupBy("c_nationkey").agg(
        (dsum(F.col("total_spend")) / F.count(F.lit(1))).alias("avg_spend")
    )
    return (
        spend.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("total_spend") > 2 * F.col("avg_spend"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
            F.round("total_spend", 6).alias("total_spend"),
            F.round("avg_spend", 6).alias("nation_avg_spend"),
        )
        .orderBy("custkey")
    )


@register(
    "agg_price_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000 AS bucket_lo,
           count(*) AS n,
           {dsum_sql("o_totalprice")} AS bucket_revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY bucket
    """,
    tags=("relational", "agg"),
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by arithmetic bucketing — the profiling
    primitive (one hash aggregate; bucket count independent of data
    size, so the shuffle is O(buckets))."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"), (bucket * 50000).alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("bucket_revenue"),
        )
        .orderBy("bucket")
    )


@register(
    "pivot_status_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("relational", "pivot"),
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (never let pivot scan for
    distinct values at scale — that is an extra full pass)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
        .orderBy("c_mktsegment")
    )


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, round(val, 6) AS val
    FROM (
        SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    WHERE p_partkey % 20 = 0
    ORDER BY p_partkey, measure
    """,
    tags=("relational", "pivot"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide→long without multiple scans."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return (
        p.select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retailprice", "size"], "measure", "val")
        .select("p_partkey", "measure", F.round("val", 6).alias("val"))
        .orderBy("p_partkey", "measure")
    )


# --------------------------------------------------------------------------
# mutation patterns: MERGE, CDC diff, deterministic sampling
# --------------------------------------------------------------------------


@register(
    "merge_upsert_orders",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 != 0
    ),
    source AS (
        SELECT o_orderkey, round(o_totalprice * 1.1, 6) AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT t.o_orderkey AS orderkey,
           round(coalesce(s.o_totalprice, t.o_totalprice), 6) AS totalprice,
           CASE WHEN s.o_orderkey IS NULL THEN 'kept' ELSE 'updated' END AS action
    FROM target t LEFT JOIN source s USING (o_orderkey)
    UNION ALL
    SELECT s.o_orderkey, round(s.o_totalprice, 6), 'inserted'
    FROM source s ANTI JOIN target t USING (o_orderkey)
    ORDER BY orderkey
    """,
    tags=("relational", "merge"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the reference's upsert, main.py:172, as a
    declarative three-way merge): WHEN MATCHED update, WHEN NOT MATCHED
    insert, else keep. Expressed as one full-outer join on the merge key
    — ONE shuffle, AQE-skew-splittable, no row-by-row upsert loop. At
    100 TB the target stays partitioned by the merge key so only
    changed partitions rewrite (dynamic partition overwrite)."""
    o = _t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey", "o_totalprice")
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 1.1, 6).alias("s_totalprice")
    )
    merged = target.join(source, "o_orderkey", "full_outer")
    return (
        merged.select(
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.coalesce("s_totalprice", "o_totalprice"), 6).alias("totalprice"),
            F.when(F.col("s_totalprice").isNull(), "kept")
            .when(F.col("o_totalprice").isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
        )
        .orderBy("orderkey")
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH snap_a AS (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-06-01'
    ),
    snap_b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 1.5, 6)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-09-01' AND o_orderkey % 11 != 0
    )
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change
    FROM snap_a a FULL JOIN snap_b b USING (o_orderkey)
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice != b.o_totalprice
    ORDER BY orderkey
    """,
    tags=("relational", "cdc"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture by snapshot diff: classify rows as
    insert/update/delete between two table versions via one full-outer
    join on the key, dropping unchanged rows. The scale path hash-
    partitions both snapshots identically on write so the diff join is
    shuffle-free (bucketed storage); a row-hash column lets the update
    check compare one 64-bit value instead of every column."""
    o = _t(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice"
    )
    snap_b = (
        o.filter(
            (F.col("o_orderdate") < F.lit("1997-09-01").cast("timestamp"))
            & (F.col("o_orderkey") % 11 != 0)
        )
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 1.5, 6)
            )
            .otherwise(F.col("o_totalprice"))
            .alias("b_totalprice"),
        )
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("orderkey"),
            F.when(F.col("a.o_orderkey").isNull(), "insert")
            .when(F.col("b.o_orderkey").isNull(), "delete")
            .otherwise("update")
            .alias("change"),
            F.col("a.o_totalprice").alias("pa"),
            F.col("b.b_totalprice").alias("pb"),
        )
        .filter(F.col("pa").isNull() | F.col("pb").isNull() | (F.col("pa") != F.col("pb")))
        .select("orderkey", "change")
        .orderBy("orderkey")
    )


@register(
    "sample_deterministic_hash",
    oracle=f"""
    WITH hashed AS (
        SELECT o_orderkey, o_totalprice,
               {sha_hash32_sql("CAST(o_orderkey AS VARCHAR)", seed=7)} AS h
        FROM orders
    )
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice
    FROM hashed WHERE h % 100 < 5
    ORDER BY o_orderkey
    """,
    tags=("relational", "sampling"),
)
def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample by key hash — unlike df.sample(), the
    same keys are selected on every run, on every engine, at every
    scale, so samples are reproducible across pipeline versions and
    joinable with each other (a sampled fact joins a sampled dim iff
    both hash the join key). Embarrassingly parallel: a map-side
    filter, no shuffle, fully pushed past the scan's column pruning."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.round("o_totalprice", 6).alias("totalprice"),
            (sha_hash32(F.col("o_orderkey").cast("string"), seed=7) % 100).alias("bucket"),
        )
        .filter(F.col("bucket") < 5)
        .select("o_orderkey", "totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "agg_heavy_hitters",
    oracle="""
    WITH counts AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(n * 1.0 / sum(n) OVER (), 6) AS share
    FROM counts
    QUALIFY share >= 0.1
    ORDER BY n DESC, event_type
    """,
    tags=("relational", "agg"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (frequency >= 10% of the stream): hash agg
    with map-side partial combine, then a single-row broadcast of the
    total. The approximate scale path is a count-min sketch per
    partition merged on the driver (see approx_distinct_parts for the
    sketch-family pattern); exact stays feasible whenever the key
    cardinality (not the row count) fits a shuffle."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return (
        counts.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .filter(F.col("share") >= 0.1)
        .orderBy(F.desc("n"), "event_type")
    )


# --------------------------------------------------------------------------
# iterative graph analytics + slowly-changing dimensions
# --------------------------------------------------------------------------


@register(
    "graph_pagerank",
    oracle="""
    WITH nk AS (SELECT n_nationkey AS node, n_regionkey AS r FROM nation),
    ring AS (
        SELECT node,
               coalesce(lead(node) OVER (PARTITION BY r ORDER BY node),
                        min(node) OVER (PARTITION BY r)) AS dst
        FROM nk
    ),
    hub AS (SELECT node, min(node) OVER (PARTITION BY r) AS dst FROM nk),
    edges AS (
        SELECT node AS src, dst FROM ring WHERE node != dst
        UNION ALL
        SELECT node, dst FROM hub WHERE node != dst
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT count(*) AS cnt FROM nk),
    r0 AS (SELECT node, 1.0 / (SELECT cnt FROM n) AS rank FROM nk),
    r1 AS (
        SELECT nk.node,
               0.15 / (SELECT cnt FROM n)
               + 0.85 * coalesce(sum(r.rank / d.outdeg), 0) AS rank
        FROM nk
        LEFT JOIN edges e ON e.dst = nk.node
        LEFT JOIN r0 r ON r.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY nk.node
    ),
    r2 AS (
        SELECT nk.node,
               0.15 / (SELECT cnt FROM n)
               + 0.85 * coalesce(sum(r.rank / d.outdeg), 0) AS rank
        FROM nk
        LEFT JOIN edges e ON e.dst = nk.node
        LEFT JOIN r1 r ON r.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY nk.node
    ),
    r3 AS (
        SELECT nk.node,
               0.15 / (SELECT cnt FROM n)
               + 0.85 * coalesce(sum(r.rank / d.outdeg), 0) AS rank
        FROM nk
        LEFT JOIN edges e ON e.dst = nk.node
        LEFT JOIN r2 r ON r.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY nk.node
    )
    SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node
    """,
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 power iterations (damping 0.85) over a deterministic
    graph built from the nation table (intra-region ring + hub edges).
    Each iteration is contribution-join + hash agg — the canonical
    iterative-analytics shape. At 100 TB: pre-partition edges by dst so
    every iteration reuses one shuffle; cache the rank frontier;
    high-degree hubs are the skew risk (AQE skew-join or pre-aggregate
    contributions per (dst, src-partition) before the final combine)."""
    from pyspark.sql.window import Window

    nk = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), F.col("n_regionkey").alias("r")
    )
    wr = Window.partitionBy("r").orderBy("node")
    wmin = Window.partitionBy("r")
    ring = nk.select(
        "node",
        F.coalesce(F.lead("node").over(wr), F.min("node").over(wmin)).alias("dst"),
    )
    hub = nk.select("node", F.min("node").over(wmin).alias("dst"))
    edges = (
        ring.filter(F.col("node") != F.col("dst"))
        .unionByName(hub.filter(F.col("node") != F.col("dst")))
        .select(F.col("node").alias("src"), "dst")
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_nodes = nk.count()
    ranks = nk.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    contrib_src = edges.join(deg, "src")
    for _ in range(3):
        contribs = (
            contrib_src.join(ranks, contrib_src.src == ranks.node)
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nk.join(contribs, nk.node == contribs.dst, "left").select(
            "node",
            (
                F.lit(0.15 / n_nodes) + 0.85 * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


@register(
    "scd2_user_event_history",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE user_id % 50 = 0
    ),
    marked AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS chg
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ),
    versions AS (
        SELECT user_id, event_type, island,
               min(ts) AS valid_from, count(*) AS n_events
        FROM islands GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to,
           CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                IS NULL AS INT) AS is_current,
           n_events
    FROM versions
    ORDER BY user_id, valid_from
    """,
    tags=("relational", "scd"),
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from an event stream:
    collapse consecutive equal attribute values (gaps-and-islands),
    then derive [valid_from, valid_to) intervals and the is_current
    flag. All windows share one PARTITION BY user_id ordering, so Spark
    plans a single shuffle and sorts once per partition. At 100 TB the
    incremental variant merges only users seen in the new batch against
    the open (is_current) slice of the history table."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    islands = marked.withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    return (
        versions.select(
            "user_id",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(wv).alias("valid_to"),
            F.lead("valid_from").over(wv).isNull().cast("int").alias("is_current"),
            "n_events",
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "layout_zorder_stats",
    oracle="""
    WITH dims AS (
        SELECT o_orderkey,
               o_custkey % 16 AS cb,
               CAST(month(o_orderdate) - 1 AS BIGINT) AS mb
        FROM orders
    ),
    z AS (
        SELECT o_orderkey, cb, mb,
               ((cb // 1) % 2) * 1 + ((mb // 1) % 2) * 2
             + ((cb // 2) % 2) * 4 + ((mb // 2) % 2) * 8
             + ((cb // 4) % 2) * 16 + ((mb // 4) % 2) * 32
             + ((cb // 8) % 2) * 64 + ((mb // 8) % 2) * 128 AS zval
        FROM dims
    )
    SELECT zval // 16 AS file_id, count(*) AS n_rows,
           min(cb) AS min_cb, max(cb) AS max_cb,
           min(mb) AS min_mb, max(mb) AS max_mb
    FROM z GROUP BY file_id ORDER BY file_id
    """,
    tags=("relational", "layout"),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout: interleave the bits of two
    query dimensions (customer bucket × order month), sort by the
    z-value, and cut into files. The per-file min/max column stats this
    query emits are exactly what a reader's data-skipping consults: a
    z-ordered file covers a small RECTANGLE in (cb, mb) space, so a
    predicate on EITHER dimension prunes most files — unlike a linear
    sort, which only prunes on its leading column. Bit interleave is
    pure integer arithmetic (JVM codegen, no UDF)."""
    o = _t(spark, sf_dir, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 16).alias("cb"),
        (F.month("o_orderdate") - 1).cast("long").alias("mb"),
    )
    zbits = sum(
        ((F.col("cb") / (1 << i)).cast("long") % 2) * (1 << (2 * i))
        + ((F.col("mb") / (1 << i)).cast("long") % 2) * (1 << (2 * i + 1))
        for i in range(4)
    )
    z = dims.withColumn("zval", zbits)
    return (
        z.groupBy((F.col("zval") / 16).cast("long").alias("file_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cb").alias("min_cb"),
            F.max("cb").alias("max_cb"),
            F.min("mb").alias("min_mb"),
            F.max("mb").alias("max_mb"),
        )
        .orderBy("file_id")
    )


@register(
    "agg_equidepth_histogram",
    headline=True,
    oracle="""
    WITH b AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT bucket, count(*) AS n,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    tags=("relational", "agg"),
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: 10 buckets of equal row
    count with their value ranges — the histogram shape optimizers and
    skew diagnostics want (equi-WIDTH buckets collapse under
    heavy-tailed prices; see agg_price_histogram for that contrast).
    Tie-broken on the key so bucket edges are deterministic.

    Scale shape: ntile's naive plan is a partition-less window (global
    sort of the fact table). Decomposed instead as the same two-pass
    prefix sum curation_shard_assignment uses: equi-width PRE-buckets
    on the value (broadcast min/max scalar; prefix-ordered partitions
    reproduce the global (price, key) order exactly), rank within each
    pre-bucket in parallel, then a bounded per-bucket cumsum broadcast
    back. ntile(k) over n rows front-loads the remainder: the first
    q = n%k buckets hold s+1 rows (s = n//k), the rest s — so rank r
    maps to bucket floor((r-1)/(s+1))+1 inside the first q*(s+1) rows
    and q + floor((r-1-q*(s+1))/s)+1 after (the simpler floor((r-1)k/n)
    spreads the remainder and diverges whenever k does not divide n —
    caught by the property test in tests/test_scale_patterns.py). No
    stage sorts the corpus in one task; pre-bucket skew is bounded by
    the 64-way split + AQE."""
    from pyspark.sql.window import Window

    n_pre = 64
    o = _t(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_totalprice").alias("v_lo"), F.max("o_totalprice").alias("v_hi")
    )
    width = (F.col("v_hi") - F.col("v_lo")) / n_pre
    pre = (
        o.select("o_totalprice", "o_orderkey")
        .crossJoin(F.broadcast(rng))
        .withColumn(
            "pb",
            F.when(F.col("v_hi") == F.col("v_lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_pre - 1),
                    F.floor((F.col("o_totalprice") - F.col("v_lo")) / width).cast(
                        "int"
                    ),
                )
            ),
        )
    )
    wb = Window.partitionBy("pb").orderBy("o_totalprice", "o_orderkey")
    ranked = pre.withColumn("rn", F.row_number().over(wb))
    counts = pre.groupBy("pb").agg(F.count(F.lit(1)).alias("c"))
    # bounded exclusive cumsum over the 64-row pre-bucket table — the
    # only partition-less window, never the corpus
    wo = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(wo), F.lit(0))
    ).select("pb", "off")
    total = counts.agg(F.sum("c").alias("n_total"))
    r0 = F.col("off") + F.col("rn") - 1  # 0-based global rank
    s = F.floor(F.col("n_total") / 10)
    q = F.col("n_total") % 10
    cut = q * (s + 1)
    bucket = (
        F.when(r0 < cut, F.floor(r0 / (s + 1)))
        .otherwise(q + F.floor((r0 - cut) / F.greatest(s, F.lit(1))))
        .cast("int")
        + 1
    )
    b = (
        ranked.join(F.broadcast(offsets), "pb")
        .crossJoin(F.broadcast(total))
        .select("o_totalprice", bucket.alias("bucket"))
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "dq_audit_orders",
    oracle="""
    SELECT 'row_count' AS metric, CAST(count(*) AS BIGINT) AS value FROM orders
    UNION ALL
    SELECT 'null_custkey', count(*) FILTER (o_custkey IS NULL) FROM orders
    UNION ALL
    SELECT 'distinct_status', count(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'dup_orderkeys',
           (SELECT count(*) FROM
             (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
    UNION ALL
    SELECT 'orphan_custkeys', count(*) FROM orders
    ANTI JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'future_orderdates',
           count(*) FILTER (o_orderdate > TIMESTAMP '1999-01-01') FROM orders
    ORDER BY metric
    """,
    tags=("relational", "quality"),
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (deequ-style constraint suite) as ONE query:
    completeness (null rate), uniqueness (duplicate keys), referential
    integrity (orphan foreign keys, broadcast anti-join), domain checks
    (future dates), cardinality. Emitted long-form (metric, value) so
    the audit of every table lands in one quality ledger. All six
    checks share one scan per table; at 100 TB this runs as a single
    multi-aggregate pass, not six jobs."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = o.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.countDistinct("o_orderstatus").cast("long").alias("distinct_status"),
        F.count(
            F.when(F.col("o_orderdate") > F.lit("1999-01-01").cast("timestamp"), 1)
        ).alias("future_orderdates"),
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("dup_orderkeys"))
    )
    orphans = (
        # customer is SF-growing — the anti-join strategy is AQE's call
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_custkeys"))
    )
    wide = base.crossJoin(dups).crossJoin(orphans)
    return (
        wide.unpivot([], list(wide.columns), "metric", "value")
        .orderBy("metric")
    )


@register(
    "diag_key_skew",
    oracle="""
    WITH per_key AS (
        SELECT o_custkey AS key, count(*) AS n FROM orders GROUP BY o_custkey
    ),
    stats AS (
        SELECT max(n) AS max_n, round(avg(n), 6) AS avg_n, count(*) AS n_keys
        FROM per_key
    )
    SELECT k.key, k.n,
           round(k.n / s.avg_n, 6) AS skew_ratio,
           s.n_keys
    FROM per_key k CROSS JOIN stats s
    ORDER BY k.n DESC, k.key
    LIMIT 5
    """,
    tags=("relational", "diagnostics"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: per-key row counts vs the mean — the
    pre-flight check that decides between a plain shuffle join, salting,
    or AQE skew handling for a given key column. One hash agg plus a
    single-row broadcast of the summary; run it on the 1% deterministic
    sample (sample_deterministic_hash) at 100 TB — hot keys survive
    sampling by definition."""
    o = _t(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = per_key.agg(
        F.round(F.avg("n"), 6).alias("avg_n"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("avg_n"), 6).alias("skew_ratio"),
            "n_keys",
        )
        .orderBy(F.desc("n"), "key")
        .limit(5)
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey != l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey != l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("relational", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 family (suppliers who kept orders waiting, adapted to
    the fixture's shipdate-vs-orderdate lateness): the EXISTS /
    NOT EXISTS pair becomes a LEFT SEMI plus a LEFT ANTI self-join with
    non-equi residual conditions — the hardest standard TPC-H plan
    shape. Both probe sides re-shuffle on l_orderkey, so at 100 TB
    bucketing lineitem by orderkey collapses all three joins onto one
    co-partitioning; the supplier dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        # supplier is SF-growing — AQE picks the join strategy
        sole_late.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("relational", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 family (order-priority checking, lateness adapted to
    shipdate vs orderdate+30d): a correlated EXISTS with a non-equi
    correlated predicate — Catalyst decorrelates it into a left semi
    join with the date comparison as a residual join condition, so the
    priority count never double-counts multi-line orders."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "agg_corr_moments",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           round((count(*) * {dsum_sql("l_extendedprice * l_quantity")}
                   - {dsum_sql("l_extendedprice")} * {dsum_sql("l_quantity")})
                 / (sqrt(count(*) * {dsum_sql("l_extendedprice * l_extendedprice")}
                         - {dsum_sql("l_extendedprice")} * {dsum_sql("l_extendedprice")})
                    * sqrt(count(*) * {dsum_sql("l_quantity * l_quantity")}
                           - {dsum_sql("l_quantity")} * {dsum_sql("l_quantity")})), 6)
               AS corr_price_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation rebuilt from exact decimal co-moments (Σxy,
    Σx, Σy, Σx², Σy²) — like agg_stats_moments, the built-in corr()
    accumulates doubles in partition order and is not reproducible;
    the moment form is one partial+final pass and bit-stable at any
    parallelism. (price and quantity are independent in the generator,
    so the interesting assertion is corr ≈ 0 — the value is exact
    either way.)"""
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    n = F.count(F.lit(1))
    sxy, sx, sy = dsum(x * y), dsum(x), dsum(y)
    sxx, syy = dsum(x * x), dsum(y * y)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(n.alias("n"), F.round(corr, 6).alias("corr_price_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_median_mode",
    oracle="""
    WITH med AS (
        SELECT o_orderstatus, round(median(o_totalprice), 6) AS median_price
        FROM orders GROUP BY o_orderstatus
    ),
    pc AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    mode_pick AS (
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority) AS rn
        FROM pc
    )
    SELECT m.o_orderstatus, m.median_price, p.mode_priority, p.mode_n
    FROM med m JOIN mode_pick p
      ON m.o_orderstatus = p.o_orderstatus AND p.rn = 1
    ORDER BY m.o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + mode per group. Median interpolates identically in both
    engines (single sort-based pass here; at 100 TB swap for
    approx_percentile's mergeable sketch). The built-in mode() is
    tie-nondeterministic in every engine — the engine rule is mode via
    count + rank with an explicit tiebreak, which also yields the
    mode's frequency for free."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price")
    )
    pc = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), "o_orderpriority")
    mode_pick = (
        pc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )
    return (
        med.join(mode_pick, "o_orderstatus")
        .select("o_orderstatus", "median_price", "mode_priority", "mode_n")
        .orderBy("o_orderstatus")
    )


@register(
    "agg_revenue_concentration",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               {dsum_sql("o_totalprice")} AS spend
        FROM orders GROUP BY o_custkey
    ),
    deciled AS (
        SELECT o_custkey, spend,
               ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        FROM per_cust
    ),
    totals AS (SELECT {dsum_sql("spend")} AS total FROM (SELECT CAST(spend AS DOUBLE) AS spend FROM per_cust))
    SELECT decile,
           count(*) AS n_customers,
           round({dsum_sql("spend")}, 6) AS decile_spend,
           round({dsum_sql("spend")} / (SELECT total FROM totals), 6) AS share
    FROM deciled
    GROUP BY decile
    ORDER BY decile
    """,
    tags=("relational", "agg"),
)
def agg_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile (the 80/20 audit):
    per-customer decimal-exact spend → spend-ranked decile → decile
    share of total. Aggregate first, rank the aggregate, never sort
    raw facts — but customer cardinality still GROWS with the corpus,
    so a global ntile window (one task holding every customer) is not
    100 TB-safe either. The decile is rebuilt with the same two-pass
    prefix-sum rank agg_equidepth_histogram proves: equi-width
    pre-buckets on spend (descending, matching the rank order), a
    pb-keyed rank window, a bounded 64-row offset cumsum broadcast
    back, then ntile's front-loaded remainder formula maps the global
    rank to its bucket. The plain-ntile oracle pins the decomposition
    exact."""
    from pyspark.sql.window import Window

    n_pre = 64
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum(F.col("o_totalprice")).alias("spend"))
    total = per_cust.agg(dsum(F.col("spend")).alias("total"))
    rng = per_cust.agg(F.min("spend").alias("v_lo"), F.max("spend").alias("v_hi"))
    width = (F.col("v_hi") - F.col("v_lo")) / n_pre
    pre = per_cust.crossJoin(F.broadcast(rng)).withColumn(
        "pb",
        F.when(F.col("v_hi") == F.col("v_lo"), F.lit(0)).otherwise(
            # descending spend order: richest customers land in pb 0
            F.least(
                F.lit(n_pre - 1),
                F.floor((F.col("v_hi") - F.col("spend")) / width).cast("int"),
            )
        ),
    )
    wb = Window.partitionBy("pb").orderBy(F.desc("spend"), "o_custkey")
    ranked = pre.withColumn("rn", F.row_number().over(wb))
    counts = pre.groupBy("pb").agg(F.count(F.lit(1)).alias("c"))
    # bounded exclusive cumsum over the 64-row pre-bucket table — the
    # only partition-less window, never the customer set
    wo = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(wo), F.lit(0))
    ).select("pb", "off")
    n_total = counts.agg(F.sum("c").alias("n_total"))
    r0 = F.col("off") + F.col("rn") - 1  # 0-based global rank
    s = F.floor(F.col("n_total") / 10)
    q = F.col("n_total") % 10
    cut = q * (s + 1)
    decile_col = (
        F.when(r0 < cut, F.floor(r0 / (s + 1)))
        .otherwise(q + F.floor((r0 - cut) / F.greatest(s, F.lit(1))))
        .cast("int")
        + 1
    )
    deciled = (
        ranked.join(F.broadcast(offsets), "pb")
        .crossJoin(F.broadcast(n_total))
        .select("spend", decile_col.alias("decile"))
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("spend")).alias("spend_raw"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.round(F.col("spend_raw"), 6).alias("decile_spend"),
            # share divides the UNROUNDED sum, mirroring the oracle
            F.round(F.col("spend_raw") / F.col("total"), 6).alias("share"),
        )
        .orderBy("decile")
    )


@register(
    "agg_argmax_order",
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT o_orderstatus,
           o_orderkey AS top_orderkey,
           round(o_totalprice, 6) AS top_price
    FROM ranked WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ARGMAX per group via struct-max: max over
    (price, orderkey) pairs compares lexicographically, so ties on
    price resolve to the larger key — unlike max_by(), whose tie
    winner is whichever partition reports first. One hash aggregate,
    partial+final, no window, no sort of the full table — the argmax
    shape to prefer at 100 TB (the oracle uses the window form to
    prove they agree)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.max(F.struct("o_totalprice", "o_orderkey")).alias("top"))
        .select(
            "o_orderstatus",
            F.col("top.o_orderkey").alias("top_orderkey"),
            F.round(F.col("top.o_totalprice"), 6).alias("top_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sample_stratified_per_lang",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, lang,
               {sha_hash32_sql("CAST(doc_id AS VARCHAR)", seed=11)} AS h
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        FROM hashed
    )
    SELECT lang, doc_id FROM ranked WHERE rn <= 20
    ORDER BY lang, doc_id
    """,
    tags=("relational", "sampling"),
)
def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: exactly 20 docs per language,
    chosen by seeded key-hash order — unlike sampleBy(), the selection
    is identical on every run and engine, and every stratum is EXACTLY
    filled (sampleBy is binomial, so small strata over- or under-fill).
    One shuffle on the stratum key; the hash order means adding new
    docs only displaces samples, never reshuffles whole strata — the
    per-language training-mix budgeter."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        sha_hash32(F.col("doc_id").cast("string"), seed=11).alias("h"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# Triangle counting with degree orientation (Suri & Vassilvitskii,
# "Counting Triangles and the Curse of the Last Reducer", WWW 2011).
# Graph: parts are vertices; an edge joins two parts bought in the same
# order (co-purchase graph). Orders hold at most 7 lineitems, so pair
# generation is a bounded-block self-join — linear in orders, never
# quadratic in parts (the entity-resolution "blocking" discipline).
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
    WITH po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
    ), deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
        ) GROUP BY node
    ), oriented AS (
        -- orient each edge from the endpoint with smaller (degree, id)
        -- to the larger, so every wedge pivot has bounded out-degree
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS a,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS b,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN du.d ELSE dv.d END AS da,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS db,
               e.u AS ou, e.v AS ov
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ), tri AS (
        SELECT count(*) AS n_triangles
        FROM oriented e1
        JOIN oriented e2
          ON e1.b = e2.a AND (e1.da, e1.a) < (e2.da, e2.a)
        JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT count(*) FROM deg) AS n_vertices,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
           round(CAST(3 * (SELECT n_triangles FROM tri) AS DOUBLE)
                 / CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS DOUBLE), 6) AS transitivity
    """,
    tags=("relational", "graph"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count + transitivity over the co-purchase graph,
    using degree orientation: each undirected edge points from its
    lower-(degree, id) endpoint to the higher, so wedge enumeration
    pivots on low-degree vertices and the worst reducer is O(m^{3/2})
    total work instead of O(max_deg^2) — the standard fix for skewed
    power-law graphs at cluster scale.

    Scale shape: three hash-partitioned equi-joins (edge build blocked
    on orderkey — orders hold <= 7 lineitems, so pair generation is
    linear in orders — wedge join on the pivot vertex, closure check
    on the (a, b) pair); nothing collects. The wedge condition compares
    (degree, id) tuples so the orientation is a strict total order —
    each triangle is produced by exactly one of its three vertices."""
    li = load_table(spark, sf_dir, "lineitem")
    po = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedge_lt = (F.col("e1.da") < F.col("e2.da")) | (
        (F.col("e1.da") == F.col("e2.da")) & (F.col("e1.a") < F.col("e2.a"))
    )
    tri = (
        e1.join(e2, (F.col("e1.b") == F.col("e2.a")) & wedge_lt)
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_vertices",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                (3 * F.col("n_triangles")).cast("double") / F.col("n_wedges"), 6
            ).alias("transitivity"),
        )
    )


@register(
    "agg_hll_sketch_rollup",
    oracle="""
    SELECT n_regionkey,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_customers,
           CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_nations,
           true AS within_rsd
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("relational", "agg", "approx"),
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-nation HLL sketches of distinct
    customers (hll_sketch_agg) UNIONED to region level (hll_union_agg)
    without touching raw values again — the pre-aggregation contract
    that makes 100 TB distinct-count dashboards incremental: store the
    sketch column at the fine grain, merge upward at query time.
    Register-maximum union is order-independent, so estimates are
    deterministic at any partition count. Sketch bytes/estimates are
    DataSketches-specific, so the driver-checked output carries the
    BOUNDED-ERROR WITNESS ``within_rsd`` (lgK=12 ⇒ rsd ≈ 1.6%;
    |est − exact|/exact ≤ 0.05) next to the exact rollup — nation
    custkey sets are disjoint, so the exact region count is the sum of
    per-nation exact counts, reusing the same two-level shape. pytest
    still pins the raw estimates."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sk"),
            F.countDistinct("c_custkey").alias("nd"),
        )
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
            F.sum("nd").alias("exact_customers"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .select(
            "n_regionkey",
            "exact_customers",
            "n_nations",
            (
                F.abs(F.col("est") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.05
            ).alias("within_rsd"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "join_asof_forward_tolerance",
    oracle="""
    WITH tagged AS (
        SELECT user_id AS key, ts, event_id,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_probe,
               CASE WHEN event_type = 'purchase' THEN event_id END AS pkey
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    filled AS (
        SELECT *,
               first_value(pkey IGNORE NULLS) OVER w AS next_purchase,
               first_value(CASE WHEN pkey IS NOT NULL THEN ts END
                           IGNORE NULLS) OVER w AS next_ts
        FROM tagged
        WINDOW w AS (PARTITION BY key ORDER BY ts, is_probe DESC, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id AS view_event, key AS user_id, next_purchase,
           (epoch_us(next_ts) - epoch_us(ts)) // 1000000 AS secs_until
    FROM filled
    WHERE is_probe = 1 AND next_purchase IS NOT NULL
      AND epoch_us(next_ts) - epoch_us(ts) <= CAST(3600000000 AS BIGINT)
    ORDER BY view_event
    """,
    tags=("relational", "join", "asof"),
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (pandas merge_asof
    direction='forward'): every view event matched to the same user's
    NEXT purchase, kept only when it converts within an hour — the
    clickstream attribution join. Same union-free window encoding as
    the backward variant (one stream, two roles): first_value over the
    forward frame, one shuffle on the user key at any scale; the
    tolerance is a free post-filter in exact integer microseconds.
    Ties order views before purchases at equal ts (is_probe DESC) so a
    same-instant purchase still attributes, deterministically."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        F.col("user_id").alias("key"),
        "ts",
        "event_id",
        (F.col("event_type") == "view").cast("int").alias("is_probe"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "pkey"
        ),
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts"), F.col("is_probe").desc(), F.col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = tagged.select(
        "*",
        F.first("pkey", ignorenulls=True).over(w).alias("next_purchase"),
        F.first(
            F.when(F.col("pkey").isNotNull(), F.col("ts")), ignorenulls=True
        ).over(w).alias("next_ts"),
    )
    micros = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    return (
        filled.filter(
            (F.col("is_probe") == 1)
            & F.col("next_purchase").isNotNull()
            & (micros <= 3600 * 1000000)
        )
        .select(
            F.col("event_id").alias("view_event"),
            F.col("key").alias("user_id"),
            "next_purchase",
            F.floor(micros / 1000000).cast("long").alias("secs_until"),
        )
        .orderBy("view_event")
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT r.r_name, t.c_name, t.c_acctbal
    FROM region r,
    LATERAL (
        SELECT c.c_name, c.c_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY c.c_acctbal DESC, c.c_name
        LIMIT 2
    ) t
    ORDER BY r.r_name, t.c_acctbal DESC, t.c_name
    """,
    tags=("relational", "join", "sql"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join: per outer row (region), an
    ordered-and-limited dependent subquery (top-2 customers by account
    balance). Catalyst decorrelates this into a ranked window over the
    joined input — i.e. the same physical shape as a window top-k, not
    a per-row re-execution, so at 100 TB it costs one shuffle on the
    correlation key rather than |outer| subquery scans. The reference
    has no lateral surface at all; this is the SQL-first ergonomic form
    of ``search_topk_per_source``."""
    _t(spark, sf_dir, "region").createOrReplaceTempView("v_lat_region")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_lat_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_customer")
    return spark.sql(
        """
        SELECT r.r_name, t.c_name, t.c_acctbal
        FROM v_lat_region r,
        LATERAL (
            SELECT c.c_name, c.c_acctbal
            FROM v_lat_customer c
            JOIN v_lat_nation n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY c.c_acctbal DESC, c.c_name
            LIMIT 2
        ) t
        ORDER BY r.r_name, t.c_acctbal DESC, t.c_name
        """
    )


# --------------------------------------------------------------------------
# round 5: weighted sampling, weighted quantiles, nearest as-of join
# --------------------------------------------------------------------------


@register(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH hashed AS (
        SELECT o_orderkey, o_totalprice,
               sha256('11:' || CAST(o_orderkey AS VARCHAR)) AS hx
        FROM orders
    ),
    keyed AS (
        SELECT o_orderkey, o_totalprice,
               CAST(round(-ln(({{h}} + 1) / 4294967296.0)
                          / o_totalprice * 1000000000) AS BIGINT) AS key_nano
        FROM hashed
    )
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice, key_nano
    FROM keyed
    ORDER BY key_nano, o_orderkey
    LIMIT 20
    """.replace("{h}", __import__(
        "articulation_vector_db_api_spark.functions.hashing", fromlist=["hex_to_u32_sql"]
    ).hex_to_u32_sql("hx")),
    tags=("relational", "sampling"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, the algorithm Spark itself uses for weighted
    takeSample): each row draws u from a DETERMINISTIC per-key hash and
    keeps key = -ln(u)/w; the global k smallest keys are the sample,
    and expected inclusion is proportional to weight w (o_totalprice).
    The reservoir is just a top-k — TakeOrderedAndProject's per-
    partition heaps merge on the driver, so no shuffle of the corpus
    and no sequential scan, which is what makes A-ES the 100 TB
    algorithm while classic reservoir sampling (one sequential pass)
    is not. Keys are rounded to integer nano-units before ranking so
    Java and C libm ln() agree bit-wise at the comparison."""
    o = _t(spark, sf_dir, "orders")
    u = (sha_hash32(F.col("o_orderkey").cast("string"), seed=11) + 1) / F.lit(
        4294967296.0
    )
    key_nano = F.round(
        -F.log(u) / F.col("o_totalprice") * 1000000000
    ).cast("long")
    return (
        o.select(
            "o_orderkey",
            F.round("o_totalprice", 6).alias("totalprice"),
            key_nano.alias("key_nano"),
        )
        .orderBy("key_nano", "o_orderkey")
        .limit(20)
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_orderkey, l_linenumber,
               l_extendedprice, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
    ),
    cum AS (
        SELECT *,
               sum(qty) OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice, l_orderkey, l_linenumber
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
               sum(qty) OVER (PARTITION BY l_returnflag) AS tw
        FROM w
    )
    SELECT l_returnflag,
           round(min(l_extendedprice), 6) AS weighted_median,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (each price weighted by its quantity): the first
    price in sorted order whose cumulative weight reaches half the
    total. percentile_cont can't express per-row weights, so the oracle
    uses the textbook running-sum window — but a direct window
    PARTITION BY returnflag gives parallelism 3 (one reducer sorts ~2M
    rows per group; measured 9.6× wall-clock at 10× data). Instead, the
    distributed two-pass prefix-sum decomposition
    (operators/quantiles.py, pack_sequences_token_budget's shape):
    price-range sub-buckets → per-bucket weights → tiny prefix window →
    exact boundary row inside the one target bucket — every heavy stage
    parallelizes by (group, bucket). All threshold comparisons are
    exact bigint. Randomized equivalence vs a direct python reference
    is pinned in tests/test_weighted_ops.py."""
    from ..operators.quantiles import weighted_median_bucketed

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        weighted_median_bucketed(
            li,
            group_col="l_returnflag",
            value_col="l_extendedprice",
            weight_col="qty",
            tie_cols=["l_orderkey", "l_linenumber"],
        )
        .select(
            "l_returnflag",
            F.round("weighted_median", 6).alias("weighted_median"),
            "total_weight",
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
        SELECT o_custkey AS key, o_orderdate AS ts, 0 AS is_event,
               o_orderkey AS okey, NULL::BIGINT AS event_id
        FROM orders
        UNION ALL
        SELECT user_id, ts, 1, NULL, event_id FROM events
    ),
    filled AS (
        SELECT *,
               last_value(okey IGNORE NULLS) OVER wb AS prev_okey,
               last_value(CASE WHEN is_event = 0 THEN ts END IGNORE NULLS)
                   OVER wb AS prev_ts,
               first_value(okey IGNORE NULLS) OVER wf AS next_okey,
               first_value(CASE WHEN is_event = 0 THEN ts END IGNORE NULLS)
                   OVER wf AS next_ts
        FROM tagged
        WINDOW wb AS (PARTITION BY key ORDER BY ts, is_event, okey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY key ORDER BY ts, is_event, okey
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    chosen AS (
        SELECT event_id, key,
               CASE WHEN prev_okey IS NULL THEN next_okey
                    WHEN next_okey IS NULL THEN prev_okey
                    WHEN epoch_us(ts) - epoch_us(prev_ts)
                         <= epoch_us(next_ts) - epoch_us(ts) THEN prev_okey
                    ELSE next_okey END AS o_orderkey,
               CASE WHEN prev_okey IS NULL
                         THEN epoch_us(next_ts) - epoch_us(ts)
                    WHEN next_okey IS NULL
                         THEN epoch_us(ts) - epoch_us(prev_ts)
                    ELSE least(epoch_us(ts) - epoch_us(prev_ts),
                               epoch_us(next_ts) - epoch_us(ts)) END AS dist_us
        FROM filled WHERE is_event = 1
    )
    SELECT event_id, key AS user_id, o_orderkey,
           dist_us // 1000000 AS dist_s
    FROM chosen WHERE o_orderkey IS NOT NULL
    ORDER BY event_id
    """,
    tags=("relational", "join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (direction='nearest' in pandas.merge_asof):
    each event takes the user's CLOSEST order in time, backward winning
    ties. Same union + window encoding as the backward as-of — one
    extra mirrored window (first_value over the following frame) gets
    the forward candidate, a projection picks the nearer; still ONE
    shuffle on the key, no per-row subquery, no range self-join blowup.
    Distances are integer microseconds end to end."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_event"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("okey"),
        F.col("event_id"),
    )
    wb = (
        Window.partitionBy("key")
        .orderBy("ts", "is_event", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("key")
        .orderBy("ts", "is_event", "okey")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ots = F.when(F.col("is_event") == 0, F.col("ts"))
    filled = o.unionByName(e).select(
        "*",
        F.last("okey", ignorenulls=True).over(wb).alias("prev_okey"),
        F.last(ots, ignorenulls=True).over(wb).alias("prev_ts"),
        F.first("okey", ignorenulls=True).over(wf).alias("next_okey"),
        F.first(ots, ignorenulls=True).over(wf).alias("next_ts"),
    )
    t_us = F.unix_micros("ts")
    back_us = t_us - F.unix_micros("prev_ts")
    fwd_us = F.unix_micros("next_ts") - t_us
    chosen = filled.filter(F.col("is_event") == 1).select(
        "event_id",
        "key",
        F.when(F.col("prev_okey").isNull(), F.col("next_okey"))
        .when(F.col("next_okey").isNull(), F.col("prev_okey"))
        .when(back_us <= fwd_us, F.col("prev_okey"))
        .otherwise(F.col("next_okey"))
        .alias("o_orderkey"),
        F.when(F.col("prev_okey").isNull(), fwd_us)
        .when(F.col("next_okey").isNull(), back_us)
        .otherwise(F.least(back_us, fwd_us))
        .alias("dist_us"),
    )
    return (
        chosen.filter(F.col("o_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            "o_orderkey",
            F.expr("dist_us DIV 1000000").alias("dist_s"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# round 5: iterative graph analytics over a 1500-node customer graph
# (intra-nation ring + nation-hub bridges; ~60-node rings at sf0.01 so
# a bounded iteration count leaves a DETERMINISTIC partial state)
# --------------------------------------------------------------------------

_CUST_EDGES_SQL = """
    nodes AS (SELECT c_custkey AS node, c_nationkey AS grp FROM customer),
    ring AS (
        SELECT node, grp,
               coalesce(lead(node) OVER (PARTITION BY grp ORDER BY node),
                        min(node) OVER (PARTITION BY grp)) AS nxt
        FROM nodes
    ),
    hubs AS (SELECT grp, min(node) AS hub FROM nodes GROUP BY grp),
    raw_edges AS (
        SELECT node AS a, nxt AS b FROM ring WHERE node != nxt
        UNION ALL
        SELECT h1.hub, h2.hub
        FROM hubs h1 JOIN hubs h2 ON h2.grp = h1.grp + 1
    ),
    edges AS (
        SELECT a AS src, b AS dst FROM raw_edges
        UNION ALL
        SELECT b, a FROM raw_edges
    )
"""


def _customer_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric edge list: per-nation ring over custkey order plus a
    chain of nation-hub bridges, so the whole graph is ONE connected
    component with long shortest paths — the shape that makes bounded
    iteration counts produce non-trivial partial states."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node"), F.col("c_nationkey").alias("grp")
    )
    w = Window.partitionBy("grp").orderBy("node")
    ring = c.select(
        "node",
        "grp",
        F.coalesce(
            F.lead("node").over(w),
            F.min("node").over(Window.partitionBy("grp")),
        ).alias("nxt"),
    ).filter(F.col("node") != F.col("nxt"))
    hubs = c.groupBy("grp").agg(F.min("node").alias("hub"))
    h2 = hubs.select((F.col("grp") - 1).alias("grp"), F.col("hub").alias("hub2"))
    bridges = hubs.join(h2, "grp").select(
        F.col("hub").alias("a"), F.col("hub2").alias("b")
    )
    raw = ring.select(F.col("node").alias("a"), F.col("nxt").alias("b")).unionByName(
        bridges
    )
    return raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def _lp_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT n.node,
               least(p.lbl, coalesce(min(q.lbl), p.lbl)) AS lbl
        FROM nodes n
        JOIN {prev} p ON p.node = n.node
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN {prev} q ON q.node = e.src
        GROUP BY n.node, p.lbl
    )"""


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH {_CUST_EDGES_SQL},
    l0 AS (SELECT node, node AS lbl FROM nodes),
    {_lp_round_sql("l0", "l1")},
    {_lp_round_sql("l1", "l2")},
    {_lp_round_sql("l2", "l3")}
    SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n_nodes
    FROM l3 GROUP BY lbl ORDER BY lbl
    """,
    tags=("graph", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation, 3 synchronous rounds (the deterministic
    variant of LPA community detection; also the inner loop of
    large-star connected components): every node adopts the minimum of
    its own and its neighbors' labels. After 3 rounds each label has
    travelled exactly 3 hops — a deterministic partial state the oracle
    reproduces with 3 unrolled self-joins. Scale shape per round: edge
    ⋈ label join (hash on node) + min-agg; at 100 TB pre-partition
    edges by dst once and every round reuses that partitioning, so the
    per-round cost is one shuffle of the label frontier, not the edge
    set. Convergence detection (count of changed labels) is one extra
    agg per round; 3 rounds here keeps the oracle closed-form."""
    edges = _customer_edges(spark, sf_dir)
    nodes = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(3):
        contrib = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).groupBy(F.col("dst").alias("node")).agg(F.min("lbl").alias("nbr"))
        labels = (
            labels.join(contrib, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
    return (
        labels.groupBy(F.col("lbl").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("label")
    )


@register(
    "graph_bfs_hops",
    oracle=f"""
    WITH {_CUST_EDGES_SQL},
    src AS (SELECT min(node) AS s FROM nodes),
    d0 AS (SELECT s AS node, 0 AS dist FROM src),
    d1 AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d0
            UNION ALL
            SELECT e.dst, d.dist + 1 FROM d0 d JOIN edges e ON e.src = d.node
        ) GROUP BY node
    ),
    d2 AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d1
            UNION ALL
            SELECT e.dst, d.dist + 1 FROM d1 d JOIN edges e ON e.src = d.node
        ) GROUP BY node
    ),
    d3 AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d2
            UNION ALL
            SELECT e.dst, d.dist + 1 FROM d2 d JOIN edges e ON e.src = d.node
        ) GROUP BY node
    )
    SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM d3 GROUP BY dist ORDER BY dist
    """,
    tags=("graph", "iterative"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted BFS from the minimum-key node, 3 relaxation rounds:
    dist(v) = min(dist(v), min over in-neighbors dist(u)+1). Reports
    the frontier profile (node count + key range per distance) — the
    reachability histogram a lineage/debugging tool asks of a 100 TB
    edge set. Same reused-partitioning shape as label propagation; the
    frontier frame stays tiny (only reached nodes carry rows) so each
    round's join broadcasts the frontier, never shuffles the edges."""
    edges = _customer_edges(spark, sf_dir)
    nodes = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    src = nodes.agg(F.min("node").alias("node")).select(
        "node", F.lit(0).alias("dist")
    )
    dist = src
    for _ in range(3):
        expanded = edges.join(
            F.broadcast(dist).withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        dist = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return (
        dist.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )


@register(
    "agg_countif_family",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
               AS n_big,
           CAST(count(*) FILTER (WHERE o_orderpriority LIKE '1%') AS BIGINT)
               AS n_urgent,
           CAST(CASE WHEN bool_and(o_totalprice > 900) THEN 1 ELSE 0 END AS INT)
               AS all_over_900,
           CAST(CASE WHEN bool_or(o_totalprice > 400000) THEN 1 ELSE 0 END AS INT)
               AS any_over_400k
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_countif_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate family: count_if / FILTER clauses and the
    boolean quantifiers every_/any_value-style predicates reduce to.
    All partial-aggregable (map-side combine), so the shuffle carries
    one row per (group, agg) regardless of corpus size."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
            F.count_if(F.col("o_orderpriority").startswith("1")).alias(
                "n_urgent"
            ),
            F.every(F.col("o_totalprice") > 900).cast("int").alias(
                "all_over_900"
            ),
            F.some(F.col("o_totalprice") > 400000).cast("int").alias(
                "any_over_400k"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_bit_aggregates",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey & 4095) AS BIGINT) AS key_bit_and,
           CAST(bit_or(o_orderkey & 4095) AS BIGINT) AS key_bit_or,
           CAST(bit_xor(o_orderkey & 4095) AS BIGINT) AS key_bit_xor
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates — the reduction form of bitmap indexes and
    feature masks. Associative + commutative, so they partial-combine
    map-side and are insensitive to partitioning and merge order (the
    property that makes them safe distributed aggregates)."""
    o = _t(spark, sf_dir, "orders")
    masked = F.col("o_orderkey").bitwiseAND(F.lit(4095))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(masked).alias("key_bit_and"),
            F.bit_or(masked).alias("key_bit_or"),
            F.bit_xor(masked).alias("key_bit_xor"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_trimmed_mean",
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus, o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders
    ),
    kept AS (
        SELECT o_orderstatus, o_totalprice, n
        FROM ranked
        WHERE rn > n // 10 AND rn <= n - n // 10
    )
    SELECT o_orderstatus,
           CAST(min(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                 / count(*), 6) AS trimmed_mean
    FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean — the robust-statistics aggregate
    monitoring pipelines prefer over plain avg when tails are dirty.
    Encoded as rank-window + boundary filter + decimal-exact mean: one
    shuffle on the group key serves the window AND the final agg.
    The rank boundaries are integer arithmetic, the mean accumulates
    in decimal — no float-order sensitivity anywhere."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rn") > F.expr("n DIV 10"))
        & (F.col("rn") <= F.col("n") - F.expr("n DIV 10"))
    )
    return (
        kept.groupBy("o_orderstatus")
        .agg(
            F.min("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("trimmed_mean"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "join_bucketed_noshuffle",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           c.c_mktsegment, round(o.o_totalprice, 6) AS totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY c.c_custkey, o.o_orderkey
    LIMIT 1000
    """,
    tags=("relational", "join"),
)
def join_bucketed_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE fact-dim join via bucketed storage: both tables are
    written bucketBy(8, custkey) + sortBy, so the sort-merge join reads
    co-located buckets and the plan contains ZERO hash exchanges
    (tools/check_plans.py pins that). This is THE pre-paid-shuffle
    pattern at 100 TB — the one-time bucketed write amortizes across
    every subsequent join on the key, which is why chunk/embedding
    tables ship bucketed by id (operators/ingest.py:119). Tables are
    fixture-scoped and rebuilt only when missing."""
    import os
    import re
    import shutil
    from urllib.parse import urlparse

    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir).strip("_")
    tbl_o, tbl_c = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    # the catalog is in-memory per session while the warehouse dir
    # persists: a table absent from THIS session's catalog must have
    # its stale location cleared before the bucketed rewrite
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl, src, key in (
        (tbl_o, "orders", "o_custkey"),
        (tbl_c, "customer", "c_custkey"),
    ):
        if not spark.catalog.tableExists(tbl):
            shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
            _t(spark, sf_dir, src).write.bucketBy(8, key).sortBy(key).mode(
                "overwrite"
            ).saveAsTable(tbl)
    o = spark.table(tbl_o)
    c = spark.table(tbl_c)
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "c_mktsegment",
            F.round("o_totalprice", 6).alias("totalprice"),
        )
        .orderBy("c_custkey", "o_orderkey")
        .limit(1000)
    )


@register(
    "agg_grouping_id_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR)
                AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority, status, priority
    """,
    tags=("relational", "agg"),
)
def agg_grouping_id_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets with explicit grouping() markers: one pass emits
    the detail grain, both single-axis rollups, and the grand total,
    with per-column grouping flags so consumers can tell a real NULL
    from a rollup placeholder (the reason grouping() exists).

    Scale: Spark expands grouping sets map-side (each input row fans
    out once per set) and aggregates all grains in ONE shuffle keyed on
    (keys, grouping_id) — four grains for the price of one job, vs four
    separate scans+unions. Arbitrary sets aren't reachable from the
    DataFrame groupBy (only cube/rollup are), so this one goes through
    spark.sql — same Catalyst Expand+Aggregate plan either way."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "gsets_orders"
    )
    return spark.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                   AS revenue
        FROM gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, status, priority
    """)


@register(
    "pivot_priority_multi_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
               AS urgent_n,
           CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                    FILTER (o_orderpriority = '1-URGENT'), 0) AS VARCHAR)
                AS DOUBLE) AS urgent_rev,
           CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT)
               AS high_n,
           CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                    FILTER (o_orderpriority = '2-HIGH'), 0) AS VARCHAR)
                AS DOUBLE) AS high_rev,
           CAST(count(*) FILTER (o_orderpriority NOT IN
                    ('1-URGENT', '2-HIGH')) AS BIGINT) AS other_n,
           CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                    FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')),
                    0) AS VARCHAR) AS DOUBLE) AS other_rev
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def pivot_priority_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with TWO measures per pivoted value (count and revenue per
    priority bucket) — the wide-report shape BI tools emit. The
    priority domain is bucketed to a fixed list first, so the output
    schema is static (a pivot whose column set depends on the data is a
    schema-drift hazard in any warehouse).

    Scale: an explicit value list lets Spark skip the extra
    distinct-values job a blind pivot needs, and the whole thing is one
    hash aggregate keyed on o_orderstatus — conditional partial aggs
    map-side, a |statuses|-row shuffle."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
               F.col("o_orderpriority"))
        .otherwise("OTHER")
    )
    dec = F.col("o_totalprice").cast("decimal(30,8)")
    pivoted = (
        o.select("o_orderstatus", bucket.alias("prio"), dec.alias("price"))
        .groupBy("o_orderstatus")
        .pivot("prio", ["1-URGENT", "2-HIGH", "OTHER"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("price"), F.lit(0).cast("decimal(30,8)"))
            .cast("double")
            .alias("rev"),
        )
    )
    # pivot emits NULL (not 0) for a (status, priority) combination with
    # NO rows — the in-agg coalesce can't fill those, so zero-fill here
    # to match the oracle's FILTER semantics on sparser data
    z = lambda c, t: F.coalesce(F.col(c), F.lit(0).cast(t))  # noqa: E731
    return pivoted.select(
        "o_orderstatus",
        z("`1-URGENT_n`", "long").alias("urgent_n"),
        z("`1-URGENT_rev`", "double").alias("urgent_rev"),
        z("`2-HIGH_n`", "long").alias("high_n"),
        z("`2-HIGH_rev`", "double").alias("high_rev"),
        z("OTHER_n", "long").alias("other_n"),
        z("OTHER_rev", "double").alias("other_rev"),
    ).orderBy("o_orderstatus")


@register(
    "sample_train_val_test_split",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, lang, n_chars,
               {sha_hash32_sql("CAST(doc_id AS VARCHAR)", seed=13)} % 100 AS b
        FROM documents
    ),
    labeled AS (
        SELECT lang, n_chars,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM hashed
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
    FROM labeled
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    tags=("relational", "sampling"),
)
def sample_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by key hash, with
    the per-split × language balance report a training run records
    before touching a GPU. Hash-of-key (not df.randomSplit) means the
    assignment is stable across runs, engines, and scale-ups — a doc
    never migrates between splits when the corpus grows, so eval
    contamination can't creep in via resharding.

    Scale: assignment is a map-side expression (no shuffle); the audit
    aggregate shuffles |splits × langs| rows. The split column would be
    the output's partitionBy key so each consumer reads only its
    split."""
    d = load_table(spark, sf_dir, "documents")
    b = sha_hash32(F.col("doc_id").cast("string"), seed=13) % 100
    split = (
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "agg_hll_portable_registers",
    oracle=f"""
    WITH hashed AS (
        SELECT n.n_regionkey, n.n_nationkey,
               {sha_hash32_sql("CAST(c.c_custkey AS VARCHAR)", seed=29)} AS h
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    regs AS (  -- per-(nation, bucket) register = max rank
        SELECT n_regionkey, n_nationkey, h % 64 AS bucket,
               max(CASE WHEN h // 64 = 0 THEN 27
                        ELSE 27 - length(bin(h // 64)) END) AS r
        FROM hashed
        GROUP BY n_regionkey, n_nationkey, bucket
    ),
    rolled AS (  -- region rollup touches only registers, never raw rows
        SELECT n_regionkey, bucket, max(r) AS r
        FROM regs GROUP BY n_regionkey, bucket
    ),
    est AS (
        SELECT n_regionkey,
               count(*) AS n_buckets,
               sum(power(2.0, -r)) + (64 - count(*)) AS s,
               64 - count(*) AS zeros
        FROM rolled GROUP BY n_regionkey
    ),
    ex AS (
        SELECT n.n_regionkey,
               count(DISTINCT c.c_custkey) AS exact_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_regionkey
    )
    SELECT est.n_regionkey,
           CAST(ex.exact_customers AS BIGINT) AS exact_customers,
           round(CASE WHEN (0.709 * 64 * 64 / s) <= 2.5 * 64 AND zeros > 0
                      THEN 64 * ln(64.0 / zeros)
                      ELSE 0.709 * 64 * 64 / s END, 6) AS est_customers
    FROM est JOIN ex ON est.n_regionkey = ex.n_regionkey
    ORDER BY est.n_regionkey
    """,
    tags=("relational", "agg", "approx"),
)
def agg_hll_portable_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from first principles (Flajolet et al. 2007,
    public paper) with PORTABLE registers: bucket = 6 hash bits, rank =
    leading-zero count of the remaining 26 bits via bin()-length (pure
    integer ops, so every engine computes identical registers — unlike
    agg_hll_sketch_rollup, whose DataSketches bytes are engine-private,
    this sketch cross-checks hash-exact against the oracle). Nation
    registers roll up to regions by register MAX — the mergeability
    that makes 100 TB distinct-count dashboards incremental.

    Float determinism: 2^-r terms are exact dyadic rationals whose sums
    fit a double's 52-bit mantissa, so the harmonic sum is
    order-independent — safe under any partitioning. Scale: raw rows
    are touched by exactly one aggregation; the rollup and estimate run
    on ≤ |nations|×64 register rows."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    m = 64
    h = sha_hash32(F.col("c_custkey").cast("string"), seed=29)
    w = (h / m).cast("long")  # truncating: h and m non-negative
    rank = F.when(w == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.bin(w))
    )
    regs = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_regionkey", "n_nationkey", (h % m).alias("bucket"), rank.alias("rk"))
        .groupBy("n_regionkey", "n_nationkey", "bucket")
        .agg(F.max("rk").alias("r"))
    )
    rolled = regs.groupBy("n_regionkey", "bucket").agg(F.max("r").alias("r"))
    est = rolled.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (
            F.sum(F.pow(F.lit(2.0), -F.col("r")))
            + (F.lit(m) - F.count(F.lit(1)))
        ).alias("s"),
        (F.lit(m) - F.count(F.lit(1))).alias("zeros"),
    )
    ex = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.count_distinct("c_custkey").cast("long").alias("exact_customers"))
    )
    raw = 0.709 * m * m / F.col("s")
    hll = F.when(
        (raw <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return (
        est.join(ex, "n_regionkey")
        .select(
            "n_regionkey",
            "exact_customers",
            F.round(hll, 6).alias("est_customers"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "dq_freshness_by_type",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               max(ts) AS latest,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    ),
    corpus AS (SELECT max(ts) AS head FROM events)
    SELECT event_type, latest, n_events,
           CAST(date_diff('second', latest, head) AS BIGINT) AS lag_sec,
           CAST(date_diff('second', latest, head) > 1800 AS INT)
               AS slo_breach
    FROM per_type, corpus
    ORDER BY event_type
    """,
    tags=("relational", "dq"),
)
def dq_freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness SLO audit: per-stream high-water mark vs the corpus
    head, with a breach flag at 30 minutes — the first alert any
    ingestion pipeline wires up (a partition that silently stopped
    arriving shows up here before it shows up as wrong numbers).

    Scale: two partial+final aggregates (per-type and global max) and a
    single-row broadcast join — one scan, constant-size shuffles. On a
    partitioned landing table the per-type max reads only parquet
    footer stats."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("latest"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    head = e.agg(F.max("ts").alias("head"))
    lag_sec = (F.unix_timestamp("head") - F.unix_timestamp("latest")).cast("long")
    return (
        per_type.crossJoin(F.broadcast(head))
        .select(
            "event_type",
            "latest",
            "n_events",
            lag_sec.alias("lag_sec"),
            (lag_sec > 1800).cast("int").alias("slo_breach"),
        )
        .orderBy("event_type")
    )


@register(
    "join_null_aware_anti",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (
        SELECT l_partkey FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity >= 48
    )
    ORDER BY p_partkey
    """,
    tags=("relational", "join"),
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware anti join: single-column ``NOT IN (subquery)``. This
    is NOT the same operator as NOT EXISTS (`join_anti_customers_no_
    urgent`): SQL's tri-state NOT IN must return zero rows if the inner
    list contains even one NULL, so Catalyst cannot rewrite it to a
    plain LeftAnti over a nullable key — it plans a BroadcastHashJoin
    with isNullAwareAntiJoin=true (parquet columns are nullable by
    declaration, so the non-null proof is unavailable). The fixture's
    l_partkey holds no actual NULLs, hence the result is the meaningful
    difference set and DuckDB's NOT IN agrees row-for-row.

    Scale: the inner side reduces to a broadcast hash set (distinct
    partkeys after a pushed-down returnflag/quantity scan filter);
    the probe is map-side, no shuffle of `part`. At 100 TB an inner
    side too big to broadcast must fall back to NOT EXISTS plus an
    explicit IS NOT NULL guard — the docs for that trade-off live in
    SCALE.md (joins)."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("v_naaj_part")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_naaj_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM v_naaj_part
        WHERE p_partkey NOT IN (
            SELECT l_partkey FROM v_naaj_lineitem
            WHERE l_returnflag = 'R' AND l_quantity >= 48
        )
        ORDER BY p_partkey
        """
    )


@register(
    "maintenance_compact_roundtrip",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           {dsum_sql("l_quantity")} AS sum_qty,
           {dsum_sql("l_extendedprice")} AS sum_price,
           CAST(1 AS INT) AS files_compacted
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "maintenance"),
)
def maintenance_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip over the versioned snapshot
    table (operators/maintenance.py): ingest lineitem as 48 small
    files (version 1), bin-pack with compact_snapshot (version 2,
    coalesce — no shuffle), then aggregate the COMPACTED read. The
    oracle is the same aggregate over the raw fixture, so any row lost
    or duplicated by the rewrite hash-fails; `files_compacted` is
    computed from the manifest (did the file count actually drop?) and
    pinned to 1 by the oracle, so a compaction that stops compacting
    also fails rather than degrading silently.

    SIDE-EFFECTFUL BUILDER via similarity._build_once (flock-guarded
    all-or-nothing marker): a partial build — killed between the
    ingest and the compaction — is detected by the missing completion
    marker and rebuilt from scratch, and the marker payload records
    the ACTUAL version numbers write_snapshot returned (a crash inside
    write_snapshot itself can skip version 1 entirely, so they are
    never hardcoded).

    Scale: compaction reads current-version footers for exact sizing,
    coalesces to ceil(bytes/target) — the rewrite never shuffles, and
    at 100 TB it runs per-partition against only the partitions whose
    file census breaches the small-file threshold."""
    import json as _json
    import os as _os3

    from ..operators.maintenance import (
        compact_snapshot,
        read_manifest,
        read_snapshot,
        write_snapshot,
    )
    from .similarity import _build_once

    def _build(store: str) -> dict:
        li = _t(spark, sf_dir, "lineitem")
        v_small = write_snapshot(
            li.repartition(48), store, note="small-file ingest"
        )
        v_compact = compact_snapshot(spark, store)
        return {"v_small": v_small, "v_compact": v_compact}

    path = _build_once(spark, "compactrt", sf_dir, _build)
    with open(_os3.path.join(path, "_STORE_COMPLETE")) as f:
        built = _json.load(f)
    man = read_manifest(path)
    small = int(man["versions"][str(built["v_small"])]["n_files"])
    compacted = int(man["versions"][str(built["v_compact"])]["n_files"])
    return (
        read_snapshot(spark, path, version=built["v_compact"])
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
        .withColumn(
            "files_compacted", F.lit(1 if compacted < small else 0).cast("int")
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "scan_schema_evolution_log",
    oracle=f"""
    WITH unioned AS (
        SELECT o_orderkey, o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT coalesce(o_orderpriority, '<pre-evolution>') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue
    FROM unioned
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("relational", "maintenance", "scan"),
)
def scan_schema_evolution_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-column schema evolution over the versioned snapshot log:
    version 1 lands orders WITHOUT o_orderpriority, version 2 lands the
    widened schema, and the mergeSchema log read unifies them —
    null-filling the column for pre-evolution rows — before a normal
    aggregate. The oracle reproduces the two-epoch union explicitly, so
    a read path that dropped old versions, double-read one, or
    mis-filled the evolved column hash-fails.

    SIDE-EFFECTFUL BUILDER via similarity._build_once (flock-guarded
    all-or-nothing completion marker: a build killed between the two
    epochs would otherwise re-run BOTH writes on retry and
    double-count epoch 1 in the log).

    Scale: the log read is a parquet union whose listing cost is
    manifest-sized; mergeSchema pays one footer per file — the
    documented policy is evolve rarely and let compaction rewrite old
    versions into the current schema (operators/maintenance.py)."""
    from ..operators.maintenance import read_snapshot_log, write_snapshot
    from .similarity import _build_once

    def _build(store: str) -> None:
        o = _t(spark, sf_dir, "orders")
        write_snapshot(
            o.filter(F.col("o_orderkey") % 2 == 0).select(
                "o_orderkey", "o_totalprice"
            ),
            store,
            note="epoch 1: narrow schema",
        )
        write_snapshot(
            o.filter(F.col("o_orderkey") % 2 == 1).select(
                "o_orderkey", "o_totalprice", "o_orderpriority"
            ),
            store,
            note="epoch 2: +o_orderpriority",
        )

    path = _build_once(spark, "schemaevo", sf_dir, _build)
    log = read_snapshot_log(spark, path, merge_schema=True)
    return (
        log.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<pre-evolution>")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("priority")
    )


@register(
    "join_dpp_partitioned_fact",
    oracle=f"""
    WITH dim AS (
        SELECT CAST(y AS INT) AS y, CAST(y % 3 AS INT) AS cls
        FROM range(1992, 1999) t(y)
    )
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue
    FROM orders JOIN dim ON year(o_orderdate) = y
    WHERE cls = 0
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("relational", "join", "scan"),
)
def join_dpp_partitioned_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is STORED partitioned
    by o_year; the join to a filtered year dimension makes Catalyst
    inject a dynamicpruning subquery into the fact scan's
    PartitionFilters, so only the dimension's surviving years are read
    — at 100 TB the difference between scanning 2 of 7 year partitions
    and all of them, decided at runtime from the dim filter (no
    hand-written fact predicate). The plan contract pins the
    dynamicpruningexpression; the oracle pins the values.

    SIDE-EFFECTFUL BUILDER (ann_ivf_stored_probe contract): the
    partitioned fact builds once per (fixture, Spark app) under .tmp."""
    import os as _os2

    from .similarity import _app_scoped_store

    path = _app_scoped_store(spark, "dppfact", sf_dir)
    if not _os2.path.exists(_os2.path.join(path, "_SUCCESS")):
        o = _t(spark, sf_dir, "orders")
        (
            o.withColumn("o_year", F.year("o_orderdate"))
            .repartition("o_year")
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(path)
        )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(y, y % 3) for y in range(1992, 1999)], "y INT, cls INT"
    ).filter(F.col("cls") == 0)
    return (
        fact.join(F.broadcast(dim), fact.o_year == dim.y)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("o_year")
    )


@register(
    "graph_weighted_sssp",
    oracle=f"""
    WITH {_CUST_EDGES_SQL},
    wedges AS (
        SELECT src, dst, (src + dst) % 7 + 1 AS w FROM edges
    ),
    src0 AS (SELECT min(node) AS s FROM nodes),
    d0 AS (SELECT s AS node, 0 AS dist FROM src0),
    d1 AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d0
            UNION ALL
            SELECT e.dst, d.dist + e.w FROM d0 d JOIN wedges e ON e.src = d.node
        ) GROUP BY node
    ),
    d2 AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d1
            UNION ALL
            SELECT e.dst, d.dist + e.w FROM d1 d JOIN wedges e ON e.src = d.node
        ) GROUP BY node
    ),
    d3 AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d2
            UNION ALL
            SELECT e.dst, d.dist + e.w FROM d2 d JOIN wedges e ON e.src = d.node
        ) GROUP BY node
    )
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM d3 GROUP BY dist ORDER BY dist
    """,
    tags=("graph", "iterative"),
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED single-source shortest path (Bellman-Ford relaxation,
    3 rounds) from the minimum-key node: dist(v) = min(dist(v), min
    over in-edges dist(u) + w(u,v)), with deterministic integer edge
    weights w = (src+dst) % 7 + 1. The weighted twin of
    graph_bfs_hops: hop count no longer equals cost, so a round can
    IMPROVE an already-reached node through a heavier-hop/lighter-
    weight path — the relaxation semantics Dijkstra's heap avoids
    paying a distributed coordination cost for. Bounded rounds make
    the partial state closed-form; the oracle unrolls the same 3
    relaxations.

    Scale: identical shape to BFS — the frontier frame (reached nodes
    only) broadcasts into the edge join each round, edges never
    shuffle; rounds scale as graph diameter, and at 100 TB the edge
    set is pre-partitioned by src once and reused across rounds."""
    edges = _customer_edges(spark, sf_dir).withColumn(
        "w", (F.col("src") + F.col("dst")) % 7 + 1
    )
    nodes = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    dist = nodes.agg(F.min("node").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    for _ in range(3):
        expanded = edges.join(
            F.broadcast(dist).withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return (
        dist.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, 8)) AS rep),
    hx AS (
        SELECT rep, o_totalprice,
               sha256('11:' || CAST(o_orderkey AS VARCHAR) || ':'
                      || CAST(rep AS VARCHAR)) AS hexd
        FROM orders CROSS JOIN reps
    ),
    uu AS (
        SELECT rep, o_totalprice,
               ({hex_to_u32_sql("hexd")}) % 1000000 AS u
        FROM hx
    ),
    kk AS (
        SELECT rep, o_totalprice,
               CAST(u >= 367879 AS INT) + CAST(u >= 735759 AS INT)
             + CAST(u >= 919699 AS INT) + CAST(u >= 981012 AS INT)
             + CAST(u >= 996340 AS INT) + CAST(u >= 999406 AS INT) AS k
        FROM uu
    )
    SELECT CAST(rep AS INT) AS replicate,
           CAST(sum(k) AS BIGINT) AS n_eff,
           round({dsum_sql("k * o_totalprice")} / sum(k), 6) AS boot_mean
    FROM kk GROUP BY rep ORDER BY replicate
    """,
    tags=("relational", "sampling", "stats"),
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google) — the resampling
    scheme that works on distributed data because it never needs a
    global sample-with-replacement pass: each row draws an independent
    Poisson(1) replication count PER REPLICATE, so every replicate's
    weighted mean is one map-side expression plus a hash aggregate.
    Draws are DETERMINISTIC (seeded sha256 of (orderkey, replicate) ->
    uniform -> fixed integer inverse-CDF cutoffs at the 1e-6 grid,
    tail merged at k=6), so both engines and any cluster layout
    produce the identical 8 replicate means — reproducible confidence
    intervals, the property df.sample() cannot give. The spread of
    boot_mean across replicates IS the standard-error estimate.

    Scale: the x8 replicate fan-out happens map-side (explode of a
    literal range); nothing shuffles but 8 partial aggregates. The
    modulo-1e6 uniform has a 2^-32-scale bias, identical on both
    engines — determinism is the contract, not unbiasedness in the
    33rd bit."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rep = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("rep"),
    )
    u = (
        sha_hash32(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("rep").cast("string"),
            ),
            seed=11,
        )
        % 1000000
    )
    k = sum(
        (u >= F.lit(c)).cast("int")
        for c in (367879, 735759, 919699, 981012, 996340, 999406)
    )
    weighted = rep.select(
        "rep", "o_totalprice", k.alias("k")
    )
    return (
        weighted.groupBy(F.col("rep").cast("int").alias("replicate"))
        .agg(
            F.sum("k").cast("long").alias("n_eff"),
            F.round(
                dsum(F.col("k") * F.col("o_totalprice")) / F.sum("k"), 6
            ).alias("boot_mean"),
        )
        .orderBy("replicate")
    )


@register(
    "join_scd2_temporal",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE user_id % 50 = 0
    ),
    marked AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS chg
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ),
    versions AS (
        SELECT user_id, event_type AS attr, island, min(ts) AS valid_from
        FROM islands GROUP BY user_id, event_type, island
    ),
    days AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        FROM ev
    ),
    pit AS (
        SELECT dy.user_id, dy.d, v.attr, v.valid_from,
               row_number() OVER (PARTITION BY dy.user_id, dy.d
                                  ORDER BY v.valid_from DESC, v.island DESC)
                   AS rn
        FROM days dy JOIN versions v
          ON v.user_id = dy.user_id AND v.valid_from <= dy.d
    )
    SELECT user_id, d AS as_of_day, attr, valid_from
    FROM pit WHERE rn = 1
    ORDER BY user_id, as_of_day
    """,
    tags=("relational", "scd", "join"),
)
def join_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against the SCD2 dimension
    (scd2_user_event_history builds it; this query CONSUMES it): for
    every (user, day-start) in the activity grid, resolve the
    dimension version in effect at that instant — the temporal-join
    primitive behind 'features as of the label timestamp' in ML
    training joins, where joining the CURRENT dimension row instead of
    the as-of row is the classic leakage bug. Days before a user's
    first version resolve to nothing (inner semantics) — no attribute
    existed yet.

    Plan: versions-per-user is bounded (attribute changes, not
    events), so the day-grid ⋈ versions candidate join stays
    |days|×|versions-per-user| and the argmax-by-valid_from window
    collapses it — the same bounded-candidates shape as
    join_asof_event_order, reused on an interval dimension. At 100 TB
    the dimension side is the small one: broadcast it, or bucket both
    sides by user_id and the join co-locates."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    islands = marked.withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = islands.groupBy(
        "user_id", F.col("event_type").alias("attr"), "island"
    ).agg(F.min("ts").alias("valid_from"))
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    v = versions.alias("v")
    dy = days.alias("dy")
    cand = dy.join(
        v,
        (F.col("v.user_id") == F.col("dy.user_id"))
        & (F.col("v.valid_from") <= F.col("dy.d")),
    )
    # island DESC tie-break: two same-instant versions (possible if a
    # user ever logs two different-type events at one timestamp) must
    # resolve to the LATER island identically on both engines
    wp = Window.partitionBy("dy.user_id", "dy.d").orderBy(
        F.col("v.valid_from").desc(), F.col("v.island").desc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            F.col("dy.user_id").alias("user_id"),
            F.col("dy.d").alias("as_of_day"),
            "attr",
            "valid_from",
        )
        .orderBy("user_id", "as_of_day")
    )


@register(
    "graph_k_core",
    oracle=f"""
    WITH {_CUST_EDGES_SQL},
    anchors AS (SELECT node FROM nodes WHERE node % 7 = 0),
    chain_raw AS (
        SELECT node AS a, node + 1000000 AS b FROM anchors
        UNION ALL
        SELECT node + 1000000, node + 2000000 FROM anchors
    ),
    all_edges AS (
        SELECT src, dst FROM edges
        UNION ALL SELECT a, b FROM chain_raw
        UNION ALL SELECT b, a FROM chain_raw
    ),
    d0 AS (SELECT src, count(*) AS deg FROM all_edges GROUP BY src),
    keep1 AS (SELECT src AS node FROM d0 WHERE deg >= 2),
    e1 AS (
        SELECT e.src, e.dst FROM all_edges e
        JOIN keep1 a ON e.src = a.node
        JOIN keep1 b ON e.dst = b.node
    ),
    d1 AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src),
    keep2 AS (SELECT src AS node FROM d1 WHERE deg >= 2),
    e2 AS (
        SELECT e.src, e.dst FROM e1 e
        JOIN keep2 a ON e.src = a.node
        JOIN keep2 b ON e.dst = b.node
    ),
    d2 AS (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
    keep3 AS (SELECT src AS node FROM d2 WHERE deg >= 2),
    e3 AS (
        SELECT e.src, e.dst FROM e2 e
        JOIN keep3 a ON e.src = a.node
        JOIN keep3 b ON e.dst = b.node
    )
    SELECT CAST((SELECT count(*) FROM keep1) AS BIGINT) AS n_round1,
           CAST((SELECT count(*) FROM keep2) AS BIGINT) AS n_round2,
           CAST((SELECT count(*) FROM keep3) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e3) AS BIGINT) AS n_directed_edges,
           (SELECT min(node) FROM keep3) AS min_node,
           (SELECT max(node) FROM keep3) AS max_node
    """,
    tags=("graph", "iterative"),
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core decomposition with REAL multi-round peeling: the
    customer ring+bridge graph is augmented with length-2 pendant
    chains hung off every 7th customer (node -> node+1e6 ->
    node+2e6), so round 1 peels the chain tails (degree 1), round 2
    peels the now-exposed middles, and round 3 converges — each round
    removes exactly what the previous round exposed, the property a
    single filter cannot fake (the r5 review found the original
    3-core variant degenerate on this topology: empty after round 2,
    proving nothing). The surviving 2-core is exactly the original
    ring+bridge node set; the per-round survivor counts are emitted so
    the oracle checks the PEELING TRAJECTORY, not just the fixpoint,
    and the node stats come from the keep-set on both engines (the
    review also caught Spark deriving them from the edge set — a
    silent divergence on graphs with isolated survivors).

    Scale shape per round: one degree aggregation + two semi-joins,
    all keyed on node; the edge frame shrinks monotonically.
    localCheckpoint per round — the 3-reference lineage otherwise
    compounds until Catalyst chokes (operators/graph.py's CC lesson)."""
    base = _customer_edges(spark, sf_dir)
    anchors = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    ).select(F.col("c_custkey").alias("node"))
    chain = anchors.select(
        F.col("node").alias("a"), (F.col("node") + 1_000_000).alias("b")
    ).unionByName(
        anchors.select(
            (F.col("node") + 1_000_000).alias("a"),
            (F.col("node") + 2_000_000).alias("b"),
        )
    )
    edges = (
        base.unionByName(chain.select(F.col("a").alias("src"), F.col("b").alias("dst")))
        .unionByName(chain.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    round_counts = []
    keep = None
    for _ in range(3):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= 2).select(F.col("src").alias("node"))
        edges = (
            edges.join(keep.withColumnRenamed("node", "src"), "src", "semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        round_counts.append(keep.count())
    return (
        keep.agg(
            F.min("node").alias("min_node"), F.max("node").alias("max_node")
        )
        .crossJoin(
            edges.agg(F.count(F.lit(1)).cast("long").alias("n_directed_edges"))
        )
        .select(
            F.lit(round_counts[0]).cast("long").alias("n_round1"),
            F.lit(round_counts[1]).cast("long").alias("n_round2"),
            F.lit(round_counts[2]).cast("long").alias("n_nodes"),
            "n_directed_edges",
            "min_node",
            "max_node",
        )
    )


@register(
    "graph_common_neighbors",
    oracle=f"""
    WITH {_CUST_EDGES_SQL},
    wedges AS (
        SELECT e1.dst AS a, e2.dst AS b, e1.src AS via
        FROM edges e1 JOIN edges e2
          ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    scored AS (
        SELECT a, b, count(*) AS common
        FROM wedges GROUP BY a, b
    ),
    non_adjacent AS (
        SELECT s.a, s.b, s.common
        FROM scored s
        WHERE NOT EXISTS (
            SELECT 1 FROM edges e WHERE e.src = s.a AND e.dst = s.b
        )
    )
    SELECT a, b, CAST(common AS BIGINT) AS common_neighbors
    FROM non_adjacent
    ORDER BY common_neighbors DESC, a, b
    LIMIT 20
    """,
    tags=("graph",),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction: for every NON-adjacent pair,
    count shared neighbors via the degree-oriented wedge join (the
    same shape as graph_triangle_count's wedge stage) and rank the
    top-20 missing links — the classic 'people you may know'
    primitive. All-integer scoring, so parity is exact; the adjacency
    check is an anti-join, not a lookup loop.

    Scale: wedge counts explode on hub nodes (deg² per hub) — the
    production guard is degree-capping the via node before the wedge
    join (drop or sample super-hubs, which carry little link-prediction
    signal anyway), the same frequent-shingle pruning discipline the
    dedup suite documents. Pairs shuffle on (a, b); the anti-join
    partitions on the same key."""
    edges = _customer_edges(spark, sf_dir)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(F.col("e1.dst").alias("a"), F.col("e2.dst").alias("b"))
    scored = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
    adj = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    return (
        scored.join(adj, ["a", "b"], "left_anti")
        .select("a", "b", F.col("common").cast("long").alias("common_neighbors"))
        .orderBy(F.desc("common_neighbors"), "a", "b")
        .limit(20)
    )


@register(
    "sql_pipe_interface",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue,
           round({davg_sql("o_totalprice")}, 6) AS avg_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "sql"),
)
def sql_pipe_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4.0's `|>` operator chaining — the
    linear FROM-first dialect): the same logical algebra as
    sql_interface_revenue's classic SELECT, declared as a pipeline of
    WHERE → AGGREGATE → EXTEND → ORDER BY stages. Exists so the
    engine's SQL-string surface covers BOTH dialects; Catalyst compiles
    them to the identical plan, which the shared oracle proves on
    values.

    Scale posture is the plan's, not the syntax's: pushed-down scan
    filter, partial+final hash aggregate, one exchange on the group
    key."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_pipe")
    return spark.sql(
        """
        FROM v_orders_pipe
        |> WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                         AS revenue
           GROUP BY o_orderstatus
        |> EXTEND ROUND(revenue / n_orders, 6) AS avg_price
        |> SELECT o_orderstatus, n_orders, revenue, avg_price
        |> ORDER BY o_orderstatus
        """
    )


# One SQL text, two engines: the recursive hierarchy walk is written
# in the ANSI dialect subset Spark 4 and DuckDB share, so the oracle
# IS the query string (modulo the table binding).
_RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE chain(s_suppkey, root, depth) AS (
    SELECT s_suppkey, s_suppkey AS root, CAST(0 AS INT) AS depth
    FROM {sup} WHERE s_suppkey < 10
    UNION ALL
    SELECT s.s_suppkey, c.root, CAST(c.depth + 1 AS INT)
    FROM {sup} s JOIN chain c
      ON CAST((s.s_suppkey - (s.s_suppkey % 10)) / 10 AS BIGINT) = c.s_suppkey
   WHERE s.s_suppkey >= 10
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(min(s_suppkey) AS BIGINT) AS min_key,
       CAST(max(s_suppkey) AS BIGINT) AS max_key,
       CAST(count(DISTINCT root) AS BIGINT) AS n_roots
FROM chain GROUP BY depth ORDER BY depth
"""


@register(
    "sql_recursive_cte_hierarchy",
    oracle=_RECURSIVE_HIERARCHY_SQL.format(sup="supplier"),
    tags=("relational", "sql"),
)
def sql_recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (Spark 4's UnionLoop operator): a
    decimal-digit hierarchy over suppliers (parent(s) = s div 10,
    roots are keys < 10) walked to every depth, then per-depth
    membership stats. The exact SQL text runs on both engines — the
    strongest possible parity statement for the iterative-query
    surface, and the declarative twin of the hand-rolled loops the
    engine uses where recursion must be skew-bounded
    (operators/graph.py's alternating-star CC).

    Scale shape: Catalyst plans the recursion as UnionLoop with the
    anchor and step as ordinary pushdown-optimized joins — each
    iteration joins the FRONTIER (one depth's rows) against the base
    table on an equi-key, so per-round state is a hierarchy level,
    never the closure; depth is bounded by log10(|supplier|). The
    aggregate on top is the usual partial+final pair."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("v_sup_rec")
    return spark.sql(_RECURSIVE_HIERARCHY_SQL.format(sup="v_sup_rec"))


@register(
    "maintenance_vacuum_retention",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dsum_sql("o_totalprice")} AS revenue,
           CAST(2 AS INT) AS n_vacuumed,
           CAST(1 AS INT) AS retired_dirs_gone,
           CAST(1 AS INT) AS retained_readable
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "maintenance"),
)
def maintenance_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention VACUUM over the versioned snapshot table — the last
    missing table-maintenance verb beside compaction and schema
    evolution: four full-table versions land (growing subsets of
    orders, v4 = everything), vacuum_snapshots(keep_last=2) retires
    v1/v2, and the query aggregates the CURRENT read. The oracle pins
    the aggregate over the full fixture (current must still be v4's
    content) plus three proof flags computed from the store itself:
    exactly 2 versions retired, their data directories actually gone
    from disk, and the retained older version (v3) still readable for
    time travel. Any of vacuum deleting too much, too little, or
    leaving manifest entries pointing at deleted data hash-fails.

    SIDE-EFFECTFUL BUILDER (similarity._build_once contract).

    Scale: the vacuum itself is manifest-sized work plus directory
    deletes — the data path is never read; the documented contract is
    Delta/Iceberg's — retention window must exceed the longest reader
    lifetime, since readers pin paths, not manifest entries."""
    import json as _json
    import os

    from ..operators.maintenance import (
        read_manifest,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )
    from .similarity import _build_once

    def _build(p: str) -> None:
        table = os.path.join(p, "table")
        o = _t(spark, sf_dir, "orders")
        for k in (1, 2, 3, 4):
            write_snapshot(
                o.filter(F.col("o_orderkey") % 4 < k),
                table,
                note=f"epoch {k}",
            )
        retired = vacuum_snapshots(table, keep_last=2)
        retired_gone = all(
            not os.path.exists(os.path.join(table, f"v={v}")) for v in retired
        )
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "vacuum.json"), "w") as f:
            _json.dump({"retired": retired, "gone": retired_gone}, f)

    store = _build_once(spark, "vacuumret", sf_dir, _build)
    table = os.path.join(store, "table")
    with open(os.path.join(store, "vacuum.json")) as f:
        proof = _json.load(f)
    man = read_manifest(table)
    retained = sorted(int(v) for v in man["versions"])
    # executed for its exception side effect: an unreadable retained
    # version raises and fails the whole query (a count() can never be
    # negative, so no boolean dance — the flag is the non-raise)
    read_snapshot(spark, table, version=retained[0]).limit(1).count()
    retained_readable = 1
    return (
        read_snapshot(spark, table)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .withColumn("n_vacuumed", F.lit(len(proof["retired"])).cast("int"))
        .withColumn(
            "retired_dirs_gone", F.lit(1 if proof["gone"] else 0).cast("int")
        )
        .withColumn("retained_readable", F.lit(retained_readable).cast("int"))
        .orderBy("o_orderstatus")
    )


@register(
    "events_ab_test_lift",
    oracle=f"""
    WITH pc AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purch
        FROM events GROUP BY user_id
    ),
    med AS (SELECT quantile_cont(n_purch, 0.5) AS m FROM pc),
    assigned AS (
        SELECT {sha_hash32_sql("CAST(user_id AS VARCHAR)", seed=13)} % 2 AS arm,
               CAST(n_purch > med.m AS INT) AS converted
        FROM pc, med
    ),
    arms AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
                   AS c_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
                   AS c_b
        FROM assigned
    )
    SELECT n_a, c_a, n_b, c_b,
           round(CAST(c_a AS DOUBLE) / n_a, 6) AS cvr_a,
           round(CAST(c_b AS DOUBLE) / n_b, 6) AS cvr_b,
           round((CAST(c_b AS DOUBLE) / n_b) / (CAST(c_a AS DOUBLE) / n_a)
                 - 1.0, 6) AS rel_lift,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
                ELSE round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                     / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS z_score
    FROM arms
    """,
    tags=("relational", "stats", "sampling"),
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with DETERMINISTIC assignment: users
    hash into arms via the seeded sha bucket (the
    sample_deterministic_hash discipline — assignment is reproducible
    across runs, engines, and reshuffles, which is what makes
    experiment analysis auditable), conversion = purchase count above
    the cross-user median (a median split, so conversion is
    nondegenerate at every scale factor — 'any purchase' saturates to
    100% on this fixture and the z-score's pooled variance hits 0),
    and the readout computes per-arm conversion, relative lift, and
    the pooled two-proportion z-score (NULL-guarded for the
    all-or-nothing edge on BOTH engines). Every float input is an
    integer count plus one exact interpolated median; both engines
    evaluate the identically-parenthesized formula — exact parity.

    Scale: one per-user aggregate, one scalar median broadcast, then a
    single global 4-counter reduce — constant bytes over the wire."""
    ev = _t(spark, sf_dir, "events")
    pc = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_purch")
    )
    med = pc.agg(F.percentile("n_purch", F.lit(0.5)).alias("m"))
    assigned = pc.crossJoin(F.broadcast(med)).select(
        (sha_hash32(F.col("user_id").cast("string"), seed=13) % 2).alias("arm"),
        (F.col("n_purch") > F.col("m")).cast("int").alias("converted"),
    )
    arms = assigned.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    ca, na = F.col("c_a").cast("double"), F.col("n_a")
    cb, nb = F.col("c_b").cast("double"), F.col("n_b")
    conv = F.col("c_a") + F.col("c_b")
    pop = F.col("n_a") + F.col("n_b")
    pooled = conv.cast("double") / pop
    z = F.round(
        (cb / nb - ca / na)
        / F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        6,
    )
    return arms.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(ca / na, 6).alias("cvr_a"),
        F.round(cb / nb, 6).alias("cvr_b"),
        F.round((cb / nb) / (ca / na) - F.lit(1.0), 6).alias("rel_lift"),
        F.when((conv == 0) | (conv == pop), F.lit(None).cast("double"))
        .otherwise(z)
        .alias("z_score"),
    )


@register(
    "agg_benford_first_digit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice >= 1.0
    ),
    counts AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
    SELECT d AS first_digit,
           CAST(n AS BIGINT) AS n_values,
           round(CAST(n AS DOUBLE) / t, 6) AS observed_share,
           round(log10(1.0 + 1.0 / d), 6) AS benford_share,
           round(CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / d), 6)
               AS deviation
    FROM counts, tot
    ORDER BY first_digit
    """,
    tags=("relational", "dq", "stats"),
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit: the distribution of leading
    digits of order totals vs the log10(1 + 1/d) expectation — the
    classic fabricated-data / fraud screen for financial columns.
    The digit extraction goes through an integer truncation and
    string slice (identical on both engines — no float formatting),
    and the Benford expectation is a per-digit constant, so the only
    float work is two rounded divisions.

    Scale: map-side digit projection into a 9-row aggregate; the total
    joins back as a single-row broadcast."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    # floor() explicitly on both sides: DuckDB's double->BIGINT cast
    # ROUNDS while Spark's TRUNCATES — floor first makes them agree
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("t"))
    share = F.col("n").cast("double") / F.col("t")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.col("n").cast("long").alias("n_values"),
            F.round(share, 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(share - benford, 6).alias("deviation"),
        )
        .orderBy("first_digit")
    )


@register(
    "agg_mad_robust",
    oracle="""
    WITH med AS (
        SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS m
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           round(max(med.m), 6) AS median_price,
           round(quantile_cont(abs(o.o_totalprice - med.m), 0.5), 6) AS mad,
           round(1.4826 * quantile_cont(abs(o.o_totalprice - med.m), 0.5), 6)
               AS robust_sigma
    FROM orders o JOIN med ON o.o_orderstatus = med.o_orderstatus
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
    tags=("relational", "agg", "stats"),
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    estimate (and robust_sigma = 1.4826·MAD, the normal-consistent
    scale) that outliers cannot drag the way they drag stddev: the
    backbone of robust z-scoring in data-quality screens
    (events_anomaly_zscore's robust twin). Two-pass shape: group
    medians, broadcast back, median of absolute deviations — both
    medians are the exact interpolated percentile the agg_percentiles
    convention already proved engine-identical.

    Scale: two aggregates over the same grouping key (the second
    reuses the first's partitioning) plus a broadcast of K group
    medians; exact medians sort per group — swap approx_percentile at
    100 TB, same plan shape."""
    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("m")
    )
    agged = (
        o.join(F.broadcast(med), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.max("m").alias("m"),
            # ONE exact percentile per group (it buffers+sorts every
            # value — the expensive part); mad and robust_sigma both
            # derive from it in the projection
            F.percentile(
                F.abs(F.col("o_totalprice") - F.col("m")), F.lit(0.5)
            ).alias("p"),
        )
    )
    return agged.select(
        "o_orderstatus",
        F.round("m", 6).alias("median_price"),
        F.round("p", 6).alias("mad"),
        F.round(F.lit(1.4826) * F.col("p"), 6).alias("robust_sigma"),
    ).orderBy("o_orderstatus")


@register(
    "join_interval_overlap_pairs",
    oracle="""
    WITH spans AS (
        SELECT user_id,
               min(epoch_us(ts)) AS s,
               max(epoch_us(ts)) AS e
        FROM events WHERE user_id % 10 = 0
        GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
    FROM spans a JOIN spans b
      ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    ORDER BY overlap_us DESC, user_a, user_b
    LIMIT 20
    """,
    tags=("relational", "join", "interval"),
)
def join_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP self-join: each user's activity span
    [first event, last event], paired with every other user whose span
    intersects, ranked by overlap length (integer micros — exact
    parity). The interval-intersection predicate (a.s <= b.e AND
    b.s <= a.e) is the concurrency/conflict primitive behind meeting
    clash detection, co-presence analytics, and resource double-
    booking checks; events_interval_coverage measures one user's
    UNION of intervals, this measures CROSS-user intersection.

    Scale: the span table is one row per key (aggregated first, so the
    pair join is keys², not events²); at 100 TB bucket spans into
    coarse time bins and join bin-adjacent buckets only — the standard
    interval-join banding that keeps candidate pairs near-linear."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    spans = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("s"),
        F.max(F.unix_micros("ts")).alias("e"),
    )
    a = spans.alias("a")
    b = spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            )
            .cast("long")
            .alias("overlap_us"),
        )
        .orderBy(F.desc("overlap_us"), "user_a", "user_b")
        .limit(20)
    )


@register(
    "agg_cms_portable",
    oracle=f"""
    WITH base AS (
        SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
    ),
    hx AS (
        SELECT k,
               sha256('101:' || k) AS x1, sha256('102:' || k) AS x2,
               sha256('103:' || k) AS x3, sha256('104:' || k) AS x4
        FROM base
    ),
    hh AS (
        SELECT k,
               {hex_to_u32_sql("x1")} % 64 AS b1,
               {hex_to_u32_sql("x2")} % 64 AS b2,
               {hex_to_u32_sql("x3")} % 64 AS b3,
               {hex_to_u32_sql("x4")} % 64 AS b4
        FROM hx
    ),
    regs AS (
        SELECT 1 AS j, b1 AS bucket, count(*) AS c FROM hh GROUP BY b1
        UNION ALL
        SELECT 2, b2, count(*) FROM hh GROUP BY b2
        UNION ALL
        SELECT 3, b3, count(*) FROM hh GROUP BY b3
        UNION ALL
        SELECT 4, b4, count(*) FROM hh GROUP BY b4
    ),
    top AS (
        SELECT k, count(*) AS true_count
        FROM base GROUP BY k
        ORDER BY true_count DESC, CAST(k AS BIGINT) LIMIT 8
    ),
    probe AS (
        SELECT t.k, t.true_count, h.j, h.bucket
        FROM top t, LATERAL (
            SELECT 1 AS j, {hex_to_u32_sql("sha256('101:' || t.k)")} % 64
                       AS bucket
            UNION ALL
            SELECT 2, {hex_to_u32_sql("sha256('102:' || t.k)")} % 64
            UNION ALL
            SELECT 3, {hex_to_u32_sql("sha256('103:' || t.k)")} % 64
            UNION ALL
            SELECT 4, {hex_to_u32_sql("sha256('104:' || t.k)")} % 64
        ) h
    )
    SELECT CAST(p.k AS BIGINT) AS custkey,
           CAST(p.true_count AS BIGINT) AS true_count,
           CAST(min(r.c) AS BIGINT) AS cms_estimate
    FROM probe p JOIN regs r ON p.j = r.j AND p.bucket = r.bucket
    GROUP BY p.k, p.true_count
    ORDER BY custkey
    """,
    tags=("relational", "agg", "approx"),
)
def agg_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch built from first principles (Cormode &
    Muthukrishnan 2005, public paper) with PORTABLE registers, the
    same discipline as agg_hll_portable_registers: depth 4 x width 64,
    row hashes are seeded sha256 prefixes (pure integer ops, so both
    engines compute IDENTICAL registers and the sketch cross-checks
    hash-exact — unlike engine-private sketch bytes). The probe reads
    estimates for the 8 true heaviest order customers
    (deterministically tie-broken) as min over the 4 addressed
    registers; the CMS guarantee estimate >= true count holds by
    construction and the oracle recomputes both sides.

    Scale shape: ONE pass over raw rows emits 4 register increments
    each (map-side combined); the sketch is d x w = 256 rows no matter
    the corpus, registers MERGE by addition across partitions/days,
    and the probe joins 32 probe rows against the broadcast sketch.
    This is how a 100 TB pipeline answers per-key frequency questions
    without a per-key groupBy."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("k")
    )

    def addr(col, j):
        return F.struct(
            F.lit(j).alias("j"),
            (sha_hash32(col, seed=100 + j) % 64).alias("bucket"),
        )

    seeds = (1, 2, 3, 4)
    pairs = o.select(
        F.explode(F.array(*[addr(F.col("k"), j) for j in seeds])).alias("e")
    ).select("e.j", "e.bucket")
    regs = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    top = (
        o.groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.col("k").cast("long"))
        .limit(8)
    )
    probe = top.select(
        "k",
        "true_count",
        F.explode(F.array(*[addr(F.col("k"), j) for j in seeds])).alias("e"),
    ).select("k", "true_count", "e.j", "e.bucket")
    return (
        probe.join(F.broadcast(regs), ["j", "bucket"])
        .groupBy("k", "true_count")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
        .select(
            F.col("k").cast("long").alias("custkey"),
            F.col("true_count").cast("long").alias("true_count"),
            "cms_estimate",
        )
        .orderBy("custkey")
    )
