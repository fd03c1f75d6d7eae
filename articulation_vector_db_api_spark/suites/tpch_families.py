"""TPC-H query families not yet covered by the relational suite.

The reference has no relational query surface at all (its only query
engine is Pinecone's remote ANN, /root/reference/main.py:184-189); these
queries exist to prove the engine's planner-facing coverage on the
driver's TPC-H-ish fixtures. The fixture schema is reduced — there is no
``partsupp`` table and lineitem lacks shipmode/commitdate/receiptdate —
so Q9/Q12/Q16/Q20/Q22 are faithful *adaptations* that preserve the
query's plan shape (the join topology, subquery style, and aggregation
pattern) against the available columns. Q2 and Q11 are inexpressible
without partsupp and are intentionally absent (noted in COVERAGE.md).

Every money aggregate rides the exact decimal path (functions/numeric)
so results are order-independent at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg_sql, dsum, dsum_sql
from ..registry import register
from ..sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "tpch", "agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side revenue forecast. All four predicates
    push into the parquet scan; the aggregate is a single partial+final
    pair with one grouped row — at 100 TB this query is I/O-bound and
    reads only 4 of 11 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS amount
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "tpch", "join"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: fixtures lack partsupp/ps_supplycost, so
    amount is gross discounted revenue). Five-way join: fact ⋈ three
    broadcast dims (part filtered by name, supplier, nation) ⋈ orders
    sort-merge on orderkey. The p_name LIKE filter prunes part before
    the broadcast, shrinking the build side ~6×."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        # part/supplier grow with SF — AQE decides; nation (25) keeps
        # its hint
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(_disc_price()).alias("amount"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "tpch", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20. The
    orderdate window filters orders *before* the join (partition-prunable
    at scale); nation broadcasts; the final top-20 is
    TakeOrderedAndProject — no global sort. Tie-break on c_custkey keeps
    the limit deterministic."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 30) AS BIGINT)
             AS lateness_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY lateness_bucket
    """,
    tags=("relational", "tpch", "agg"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: fixtures lack l_shipmode/commitdate, so
    the group key is a 30-day ship-lateness bucket). Conditional counts
    by priority class over an orders ⋈ lineitem sort-merge join; the
    CASE sums are map-side partials, so the shuffle carries one row per
    bucket per task."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "lateness_bucket",
            F.floor(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / 30
            ).cast("bigint"),
        )
        .groupBy("lateness_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("lateness_bucket")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("relational", "tpch", "join", "agg"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, including
    zero-order customers via LEFT OUTER JOIN with an ON-clause filter
    (the filter must not become a WHERE — that would drop the NULL
    rows). Double aggregation; the second groupBy is tiny (≤ distinct
    counts), so its shuffle is negligible at any scale."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {dsum_sql(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    )} / {dsum_sql("l_extendedprice * (1 - l_discount)")} AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("relational", "tpch", "join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. part broadcasts;
    both sums are exact-decimal partials so the final double division is
    bit-identical on both engines regardless of combine order."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return (
        # part grows with SF — AQE decides the join strategy
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.00) * dsum(promo) / dsum(_disc_price())).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("relational", "tpch", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue
    CTE is computed once; its one-row max broadcasts back as a scalar
    join (no second scan of lineitem). Revenue equality is safe because
    both sides come off the exact decimal path."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_disc_price()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("relational", "tpch", "join", "agg"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier-per-part relationships come
    from lineitem instead of the absent partsupp; the excluded-supplier
    subquery keys on negative acctbal instead of the absent comment).
    NOT IN compiles to a broadcast left-anti join — safe here because
    s_suppkey is non-null; count(DISTINCT) shuffles (brand,size,suppkey)
    then re-aggregates."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    # bad_supp and the filtered part table both grow with SF — the
    # anti/semi strategies are AQE's call per actual build size
    li = _t(spark, sf_dir, "lineitem").join(
        bad_supp,
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {dsum_sql("l_quantity")} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    tags=("relational", "tpch", "subquery", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a quantity threshold. The
    IN-subquery is an aggregate-then-semi-join: lineitem groups once to
    find big orders, then semi-joins back. At 100 TB the big-order set
    is small (threshold-selective), so the semi-join broadcasts and
    lineitem is scanned exactly twice with no cartesian risk. Integer
    quantities keep the HAVING threshold exact in double."""
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").join(
        big_orders.withColumnRenamed("l_orderkey", "bo_orderkey"),
        F.col("o_orderkey") == F.col("bo_orderkey"),
        "left_semi",
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("relational", "tpch", "join"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-clause predicate over an equi-join.
    The join key stays equi (partkey) so Catalyst still plans a
    broadcast hash join; the OR-of-ANDs is a post-join residual filter.
    Catalyst also derives the common p_size/l_quantity bounds for scan
    pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        # part grows with SF — AQE decides
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(dsum(_disc_price()).alias("revenue"))
    )


@register(
    "q20_promo_stock_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 500
    )
    ORDER BY s_name
    """,
    tags=("relational", "tpch", "subquery"),
)
def q20_promo_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: the partsupp availqty threshold becomes
    a shipped-quantity threshold over lineitem). Nested subquery →
    aggregate-then-semi-join; the qualifying-supplier set grows with
    SF, so AQE picks the semi-join strategy. Integer quantities make
    the HAVING comparison exact."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # the PROMO part slice and the qualifying-supplier set both grow
    # with SF — AQE decides both joins
    qualifying = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 500)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(
            qualifying,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q22_dormant_customers",
    oracle=f"""
    WITH eligible AS (
        SELECT substring(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE substring(c_name, 17, 2) IN ('00','03','07','11','17','23','29')
    )
    SELECT cntrycode, count(*) AS numcust,
           {dsum_sql("c_acctbal")} AS totacctbal
    FROM eligible
    WHERE c_acctbal > (
        SELECT {davg_sql("c_acctbal")} FROM eligible WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01'
    )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("relational", "tpch", "subquery", "antijoin"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: the phone country code becomes the last
    two digits of c_name — fixtures have no c_phone). Above-average
    account balance via a broadcast scalar subquery (exact decimal avg,
    so the > comparison is bit-identical on both engines), NOT EXISTS →
    left-anti join against recent orders ("dormant" = no order since
    1999 — every fixture customer has *some* order, so the unfiltered
    TPC-H form would be empty). The anti-join probe side is the small
    filtered customer set, so orders never shuffles."""
    cust = _t(spark, sf_dir, "customer")
    eligible = cust.select(
        F.substring("c_name", 17, 2).alias("cntrycode"), "c_custkey", "c_acctbal"
    ).filter(
        F.col("cntrycode").isin("00", "03", "07", "11", "17", "23", "29")
    )
    avg_bal = (
        eligible.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(30,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# -- Q2 / Q11: the two families the fixtures cannot express directly
# (no partsupp table). partsupp is DERIVED deterministically from
# part × supplier using the TPC-H spec's own part-supplier association
# (dbgen: supplier i of a part = (partkey + i*(S/4 + (partkey-1)/S))
# mod S + 1, i in 0..3 — public TPC-H 3.0 spec §4.2.3), with cost and
# quantity as integer hash functions of the pair. Both engines build
# the identical table in-query (integer arithmetic only: cost kept in
# CENTS so every aggregation is exact), which makes full value oracles
# possible for both families.

_PARTSUPP_SQL = """
    derived_partsupp AS (
        SELECT p_partkey AS ps_partkey,
               ((p_partkey + i.i * (s.cnt // 4 + (p_partkey - 1) // s.cnt))
                   % s.cnt) + 1 AS ps_suppkey,
               (p_partkey * 31 + ((p_partkey + i.i * (s.cnt // 4
                   + (p_partkey - 1) // s.cnt)) % s.cnt) + 1) % 9999 + 1
                   AS ps_availqty,
               (p_partkey * 29 + (((p_partkey + i.i * (s.cnt // 4
                   + (p_partkey - 1) // s.cnt)) % s.cnt) + 1) * 11) % 90000
                   + 10000 AS ps_costcents
        FROM part
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) AS i
        CROSS JOIN (SELECT count(*) AS cnt FROM supplier) AS s
    )
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey")
    cnt = _t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("cnt"))
    ps = (
        part.join(F.broadcast(cnt))
        .select(
            "p_partkey",
            "cnt",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .withColumn(
            "ps_suppkey",
            (
                (
                    F.col("p_partkey")
                    + F.col("i")
                    * (
                        F.expr("cnt DIV 4")
                        + F.expr("(p_partkey - 1) DIV cnt")
                    )
                )
                % F.col("cnt")
            )
            + 1,
        )
    )
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        "ps_suppkey",
        ((F.col("p_partkey") * 31 + F.col("ps_suppkey")) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            (F.col("p_partkey") * 29 + F.col("ps_suppkey") * 11) % 90000 + 10000
        ).alias("ps_costcents"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    costs AS (
        SELECT ps_partkey, ps_suppkey, ps_costcents
        FROM derived_partsupp JOIN eu ON ps_suppkey = s_suppkey
    ),
    min_cost AS (
        SELECT ps_partkey, min(ps_costcents) AS min_cents
        FROM costs GROUP BY ps_partkey
    )
    SELECT round(e.s_acctbal, 6) AS s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_brand,
           CAST(c.ps_costcents AS DOUBLE) / 100.0 AS ps_supplycost
    FROM part p
    JOIN costs c ON p.p_partkey = c.ps_partkey
    JOIN min_cost m ON c.ps_partkey = m.ps_partkey
                   AND c.ps_costcents = m.min_cents
    JOIN eu e ON c.ps_suppkey = e.s_suppkey
    WHERE p.p_size = 15 AND p.p_type = 'MEDIUM'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("relational", "tpch", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the European supplier(s) quoting the partition-wide minimum cost —
    a correlated-min subquery decorrelated into one aggregate + one
    equi-join on (partkey, cost). Cost lives in integer CENTS so the
    min and the equality are exact on both engines; the region-filtered
    supplier dimension is SF-growing so AQE picks its join; top-100
    plans as
    TakeOrderedAndProject. partsupp itself is derived (header comment)
    — fixtures ship no partsupp table."""
    ps = _derived_partsupp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # eu (region-filtered suppliers) grows with SF — AQE decides
    costs = ps.join(eu, ps.ps_suppkey == eu.s_suppkey).select(
        "ps_partkey", "ps_suppkey", "ps_costcents"
    )
    min_cost = costs.groupBy("ps_partkey").agg(
        F.min("ps_costcents").alias("min_cents")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "MEDIUM")
    )
    return (
        part.join(costs, part.p_partkey == costs.ps_partkey)
        .join(
            min_cost,
            (costs.ps_partkey == min_cost.ps_partkey)
            & (costs.ps_costcents == min_cost.min_cents),
        )
        .join(eu, costs.ps_suppkey == eu.s_suppkey)
        .select(
            F.round("s_acctbal", 6).alias("s_acctbal"),
            "s_name",
            "n_name",
            part.p_partkey,
            "p_brand",
            (F.col("ps_costcents").cast("double") / 100.0).alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    scoped AS (
        SELECT ps_partkey, ps_availqty * ps_costcents AS value_cents
        FROM derived_partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    ),
    total AS (SELECT sum(value_cents) AS total_cents FROM scoped)
    SELECT ps_partkey,
           CAST(sum(value_cents) AS DOUBLE) / 100.0 AS stock_value
    FROM scoped CROSS JOIN total
    GROUP BY ps_partkey, total_cents
    HAVING sum(value_cents) > total_cents * 0.001
    ORDER BY stock_value DESC, ps_partkey
    """,
    tags=("relational", "tpch", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value for
    one nation's suppliers, kept only where it exceeds a fraction of
    the nation total. value = availqty × cost accumulates in integer
    CENTS (BIGINT — exact, order-independent), so the HAVING threshold
    is bit-identical on both engines; the grand total broadcasts back
    as a one-row scalar. partsupp derived as in Q2."""
    ps = _derived_partsupp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    scoped = (
        # one nation's suppliers still grow with SF — AQE decides the
        # outer join; the 1-row filtered nation keeps its hint
        ps.join(sup.join(F.broadcast(nat),
                         sup.s_nationkey == nat.n_nationkey)
                .select("s_suppkey"),
                ps.ps_suppkey == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_availqty") * F.col("ps_costcents")).alias("value_cents"),
        )
    )
    total = scoped.agg(F.sum("value_cents").alias("total_cents"))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("value_cents").alias("part_cents"))
        .join(F.broadcast(total))
        .filter(F.col("part_cents") > F.col("total_cents") * 0.001)
        .select(
            "ps_partkey",
            (F.col("part_cents").cast("double") / 100.0).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )
