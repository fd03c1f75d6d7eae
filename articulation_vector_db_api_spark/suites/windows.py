"""Window-function suite (SURVEY §2.2 'Window — ranking / analytic').

Absent in the reference (its only ordering is Pinecone's global top-k,
/root/reference/main.py:184-189); first-class here. Determinism policy:
every window ORDER BY is either a total order (tiebreak on a key) or
uses only tie-insensitive functions (rank/dense_rank, range frames);
running sums ride the exact decimal path.

Scale: a window shuffles once on its PARTITION BY key. Partition-less
windows move everything to one task and are forbidden outside ≤k-row
inputs (engine rule; see operators/search.py context assembly)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dsum, dsum_sql
from ..registry import register
from ..sources.readers import load_table

_DEC = "decimal(30,8)"


@register(
    "window_rank_customers",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           round(c_acctbal, 6) AS acctbal,
           row_number() OVER w AS rn,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    tags=("window",),
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window with a total order (acctbal DESC, custkey):
    row_number and ntile are deterministic because the sort key is
    unique."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 6).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_rank_ties",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
    ORDER BY o_orderkey
    """,
    tags=("window",),
)
def window_rank_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank under real ties: both depend only on the sort
    KEY VALUE, so they stay deterministic when many rows share a
    priority (row_number would not — engine rule: never emit
    row_number over a non-total order)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_running_sum",
    headline=True,
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS running_spend,
           count(*) OVER w AS n_orders_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (running total per customer over order time).
    Decimal accumulation keeps the prefix sums bit-stable."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
                "running_spend"
            ),
            F.count(F.lit(1)).over(w).alias("n_orders_so_far"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_moving_avg",
    headline=True,
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE)
             / count(*) OVER w AS moving_avg_3,
           round(min(o_totalprice) OVER w, 6) AS min_3,
           round(max(o_totalprice) OVER w, 6) AS max_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row frame (3-order moving stats per customer)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            (
                F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
                / F.count(F.lit(1)).over(w)
            ).alias("moving_avg_3"),
            F.round(F.min("o_totalprice").over(w), 6).alias("min_3"),
            F.round(F.max("o_totalprice").over(w), 6).alias("max_3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           round(value, 6) AS value,
           round(lag(value) OVER w, 6) AS prev_value,
           round(lead(value) OVER w, 6) AS next_value,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_micros
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event time per user — the session-gap primitive
    (streaming suite builds sessionization on exactly this)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(F.lag("value").over(w), 6).alias("prev_value"),
            F.round(F.lead("value").over(w), 6).alias("next_value"),
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
                "gap_micros"
            ),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice, 6) AS totalprice,
           count(*) OVER w AS n_in_band,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS band_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: value-based bounds include all peers, so the frame
    is tie-insensitive and deterministic without a tiebreak column."""
    o = load_table(spark, sf_dir, "orders")
    # DataFrame rangeBetween only takes integer offsets; a fractional
    # band needs the SQL frame syntax
    frame = (
        "OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 6).alias("totalprice"),
            F.expr(f"count(*) {frame}").alias("n_in_band"),
            F.expr(
                f"CAST(sum(CAST(o_totalprice AS {_DEC})) {frame} AS DOUBLE)"
            ).alias("band_sum"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "events_session_funnel",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    ),
    per_session AS (
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
        FROM sessions
        GROUP BY user_id, session_id
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN first_click IS NOT NULL
                          AND last_purchase IS NOT NULL
                          AND first_click <= last_purchase
                    THEN 1 ELSE 0 END) AS BIGINT) AS converted_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "events"),
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized funnel analysis: gaps-and-islands sessionization
    (30-min inactivity) → per-session click→purchase conversion →
    per-user rollup. Three layered windows/aggregates in one job — the
    product-analytics shape over the events table."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(cum))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    converted = (
        F.col("first_click").isNotNull()
        & F.col("last_purchase").isNotNull()
        & (F.col("first_click") <= F.col("last_purchase"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(converted.cast("int")).cast("long").alias("converted_sessions"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("user_id")
    )


@register(
    "events_weekly_retention",
    oracle="""
    WITH user_weeks AS (
        SELECT DISTINCT user_id,
               CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(week) AS cohort_week FROM user_weeks GROUP BY user_id
    )
    SELECT c.cohort_week, w.week,
           count(DISTINCT w.user_id) AS active_users
    FROM user_weeks w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY c.cohort_week, w.week
    ORDER BY cohort_week, week
    """,
    tags=("window", "events"),
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first active week, counted
    in every later week — the (cohort, period) distinct-count matrix.
    Two aggregates + one user-keyed equi-join (the cohort side is
    population-growing, so AQE picks its strategy); at 100 TB swap the
    exact distinct for approx_count_distinct per cell."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7.0
    ).cast("long")
    user_weeks = e.select("user_id", week.alias("week")).distinct()
    # cohort carries one row per USER — population-growing, so no
    # forced broadcast; the user_id equi-join is AQE's call
    cohort = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        user_weeks.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week")
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           round(first_value(value) OVER w, 6) AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an unbounded frame with a total order — each
    user's first and last event in one pass (no self-join)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.round(F.first("value").over(w), 6).alias("first_val"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "window_nth_value",
    oracle="""
    SELECT DISTINCT user_id,
           nth_value(event_type, 2) OVER w AS second_type,
           nth_value(event_type, 3) OVER w AS third_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    tags=("window",),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over an unbounded frame: each user's 2nd/3rd event type
    (NULL when fewer events exist). Total order (ts, event_id) makes the
    nth row — and thus the result — deterministic across engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.nth_value("event_type", 2).over(w).alias("second_type"),
            F.nth_value("event_type", 3).over(w).alias("third_type"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY event_type, day
    ),
    scored AS (
        SELECT event_type, day, n,
               round(avg(n) OVER w, 6) AS mu,
               round(stddev_samp(n) OVER w, 6) AS sigma,
               count(*) OVER w AS n_hist
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n, mu, sigma,
           round((n - mu) / sigma, 6) AS z
    FROM scored
    WHERE n_hist = 7 AND sigma > 0 AND abs((n - mu) / sigma) > 1.5
    ORDER BY event_type, day
    """,
    tags=("window", "events", "diagnostics"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per-type daily counts z-scored against
    a trailing 7-day window (window excludes the current day, so a spike
    can't mask itself). One agg + one window over the same partitioning
    — a single shuffle on event_type. The streaming twin is
    stream_sliding_window + a stateful baseline; counts are integers so
    the moments are exact before the final rounding."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "day",
        "n",
        F.round(F.avg("n").over(w), 6).alias("mu"),
        F.round(F.stddev_samp("n").over(w), 6).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(
            (F.col("n_hist") == 7) & (F.col("sigma") > 0) & (F.abs(z) > 1.5)
        )
        .select("event_type", "day", "n", "mu", "sigma", F.round(z, 6).alias("z"))
        .orderBy("event_type", "day")
    )


@register(
    "events_peak_concurrency",
    headline=True,
    oracle="""
    WITH intervals AS (
        SELECT ts AS t0, ts + INTERVAL 5 MINUTE AS t1 FROM events
    ),
    deltas AS (
        SELECT t0 AS t, 1 AS delta FROM intervals
        UNION ALL
        SELECT t1 AS t, -1 AS delta FROM intervals
    ),
    sweep AS (
        SELECT t, delta,
               sum(delta) OVER (ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS concurrent
        FROM deltas
    )
    SELECT CAST(t AS DATE) AS day,
           CAST(max(concurrent) AS BIGINT) AS peak_concurrent
    FROM sweep GROUP BY day ORDER BY day
    """,
    tags=("window", "events"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency (max overlapping 5-minute activity intervals)
    via the classic +1/-1 boundary sweep, decomposed so no stage sees
    the corpus in one task: running sum WITHIN each calendar day
    (parallel window partitioned by day), plus a carried boundary
    offset per day (exclusive cumsum of per-day delta totals — a
    bounded ~month-sized table, the only partition-less window)
    broadcast back. Identical topology to curation_shard_assignment /
    pack_sequences_token_budget: day count grows with the time range,
    never with event volume, so the offset table stays tiny at 100 TB.
    Ends sort before starts at the same instant (delta ASC) so touching
    intervals don't double-count; a day prefix-orders (t, delta), so
    the per-day decomposition reproduces the global sweep exactly."""
    e = load_table(spark, sf_dir, "events")
    starts = e.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = e.select(
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends).withColumn("day", F.col("t").cast("date"))
    wd = Window.partitionBy("day").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = deltas.withColumn("local_run", F.sum("delta").over(wd))
    day_totals = deltas.groupBy("day").agg(F.sum("delta").alias("day_total"))
    # bounded exclusive cumsum over the per-day table (rows = #days,
    # never #events) — the one acceptable partition-less window
    wo = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = day_totals.withColumn(
        "off", F.coalesce(F.sum("day_total").over(wo), F.lit(0))
    ).select("day", "off")
    return (
        local.join(F.broadcast(offsets), "day")
        .groupBy("day")
        .agg(F.max(F.col("off") + F.col("local_run")).alias("peak_concurrent"))
        .orderBy("day")
    )


@register(
    "events_decay_weighted_score",
    oracle=f"""
    WITH anchor AS (SELECT max(ts) AS now FROM events),
    terms AS (
        SELECT user_id,
               round(value * exp(-(epoch_us((SELECT now FROM anchor))
                                   - epoch_us(ts)) / 86400000000.0 / 30.0), 6)
                   AS term
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           round({dsum_sql('term')}, 6) AS decayed_score,
           count(*) AS n_purchases
    FROM terms GROUP BY user_id
    HAVING count(*) >= 3
    ORDER BY user_id
    """,
    tags=("window", "events"),
)
def events_decay_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score: sum of purchase values weighted
    by exp(-age/30d) relative to the corpus max timestamp (broadcast
    scalar). The recency weighting every ranking/training-mix pipeline
    uses. Per-term rounding pins libm exp() cross-engine; the decimal
    sum makes the per-user total order-independent at any parallelism."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("now"))
    terms = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.round(
                F.col("value")
                * F.exp(
                    -(
                        (F.unix_micros("now") - F.unix_micros("ts"))
                        / 86400000000.0
                        / 30.0
                    )
                ),
                6,
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.round(dsum(F.col("term")), 6).alias("decayed_score"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .filter(F.col("n_purchases") >= 3)
        .orderBy("user_id")
    )


@register(
    "rollup_hierarchical_time",
    oracle="""
    SELECT event_type,
           date_trunc('month', CAST(ts AS DATE)) AS month,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 6)
               AS sum_value
    FROM events
    GROUP BY event_type, month
    ORDER BY event_type, month
    """,
    tags=("window", "events", "rollup"),
)
def rollup_hierarchical_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the MONTHLY rollup is
    computed FROM the daily rollup, never from raw events — the oracle
    aggregates raw directly, proving the two-level reaggregation is
    lossless. That holds because the partial states are mergeable
    (counts add; sums ride DECIMAL, which is associative — a double sum
    would drift on reassociation). At 100 TB this is the materialized
    cascade: raw → daily (stored, incrementally refreshed per
    watermark) → monthly (refreshed from daily), so month queries read
    ~30× less than raw and backfills touch only changed days."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).alias("sum_value_dec"),
    )
    return (
        daily.groupBy(
            "event_type", F.date_trunc("month", F.col("day")).cast("date").alias("month")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value_dec").cast("double"), 6).alias("sum_value"),
        )
        .orderBy("event_type", "month")
    )


@register(
    "window_cume_dist",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window",),
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist: relative standing within a partition.
    Both depend only on the sort VALUE (tie-insensitive), so no
    tiebreak column is needed — same determinism class as rank()."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("window",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4): equal-depth quartile assignment per segment. Unlike
    rank/percent_rank, ntile depends on the physical row ORDER (ties get
    different tiles), so the window orders by (acctbal DESC, custkey) —
    a total order — to stay deterministic across engines and runs."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@register(
    "events_gap_filled_daily",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day,
               t.event_type
        FROM bounds, (SELECT DISTINCT event_type FROM events) t
    ),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type, day
    )
    SELECT s.event_type, s.day, coalesce(d.n, 0) AS n
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    WHERE s.event_type IN ('click', 'purchase')
    ORDER BY s.event_type, s.day
    """,
    tags=("window", "events"),
)
def events_gap_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series: a complete (day × type) spine generated
    with sequence() + explode, left-joined against the sparse daily
    counts so silent days report 0 instead of vanishing — the
    difference between a dashboard that shows an outage and one that
    hides it. The spine is |days| × |types| rows (tiny, broadcast); the
    aggregate side shuffles once. Zero-fill must happen AFTER the agg —
    filling raw events would fabricate rows at fact grain."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    types = e.select("event_type").distinct().filter(
        F.col("event_type").isin("click", "purchase")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
        )
        .crossJoin(types)
    )
    daily = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # broadcast the RIGHT side: a left join can only build its right
    # (daily is |days|×|types| after aggregation — always broadcastable)
    return (
        spine.join(F.broadcast(daily), ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("event_type", "day")
    )


@register(
    "events_ohlc_bars",
    oracle="""
    WITH b AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket,
               event_type, ts, event_id, value
        FROM events
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY bucket, event_type
                                  ORDER BY ts, event_id) AS rn_first,
               row_number() OVER (PARTITION BY bucket, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM b
    )
    SELECT bucket, event_type,
           round(max(CASE WHEN rn_first = 1 THEN value END), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(CASE WHEN rn_last = 1 THEN value END), 6) AS close,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS volume
    FROM ranked
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
    tags=("window", "events", "rollup"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: OHLC bars (open/high/low/
    close, count, decimal-exact volume) per 5-minute bucket per event
    type. Open/close use the struct-min/max trick — min(struct(ts,
    event_id, value)) picks the value at the earliest (ts, event_id)
    without a window pass, so the whole rollup is ONE partial+final
    aggregation: the map side reduces every partition to at most
    |buckets|×|types| rows before the shuffle. That is the property
    that makes continuous-aggregate maintenance cheap at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "5 minutes").getField("start").alias("bucket")
    first_s = F.struct("ts", "event_id", "value")
    return (
        e.groupBy(bucket, "event_type")
        .agg(
            F.round(F.min(first_s).getField("value"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max(first_s).getField("value"), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("volume"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + CAST(floor(value * 60) AS BIGINT) * 1000000 AS e
        FROM events WHERE value > 0
    ),
    marked AS (
        SELECT *,
               CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) >= s
                    THEN 0 ELSE 1 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT *, sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island,
               min(s) AS start_us, max(e) AS end_us, count(*) AS n_iv
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           count(*) AS n_islands,
           CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(sum(end_us - start_us) AS BIGINT) // 1000000 AS covered_s
    FROM merged GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "events"),
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage (gaps-and-islands over real intervals):
    each event opens an interval [ts, ts + value minutes); overlapping
    intervals per user are merged and the query reports how much
    wall-clock each user actually covered. The classic encoding — an
    interval starts a new island iff no earlier interval's running max
    end reaches it — needs ONE window pass and one aggregate, versus
    the naive self-join's O(n^2) overlap test. All arithmetic is
    integer microseconds, so sums are order-exact. Scale: both windows
    and both aggregates share the user_id partitioning — one shuffle
    total; per-user interval counts are bounded, no skew risk."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    s = F.unix_micros("ts")
    iv = e.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + F.floor(F.col("value") * 60).cast("long") * 1000000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.max("e").over(w_prev) >= F.col("s"), F.lit(0)).otherwise(F.lit(1)),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("n_iv").alias("n_intervals"),
            # integer division on both sides — float division then cast
            # drifts one ulp at ~1e11 micros
            F.expr("sum(end_us - start_us) DIV 1000000").alias("covered_s"),
        )
        .orderBy("user_id")
    )


@register(
    "window_running_distinct",
    oracle="""
    WITH firsts AS (
        SELECT event_type, user_id,
               min(CAST(date_trunc('day', ts) AS DATE)) AS first_day
        FROM events GROUP BY event_type, user_id
    ),
    daily AS (
        SELECT event_type, first_day AS day, count(*) AS new_users
        FROM firsts GROUP BY event_type, first_day
    )
    SELECT event_type, day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_distinct_users
    FROM daily ORDER BY event_type, day
    """,
    tags=("window", "events"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over time — count(DISTINCT) OVER is
    unsupported by every engine's window operator (state would be a
    set, not a scalar), so the scalable encoding is first-occurrence
    reduction: distinct-to-date(d) = rows whose FIRST day <= d. One
    hash agg collapses (type, user) to its first day, a second rolls
    new users per day, and a plain running sum finishes — the expensive
    distinct never touches a window. Scale: the first agg is the big
    one and partial-combines map-side; everything after operates on
    |types|x|days| rows."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_distinct_users"),
    ).orderBy("event_type", "day")


@register(
    "events_threshold_debounce",
    oracle="""
    WITH over_t AS (
        SELECT user_id, event_id, ts, value
        FROM events WHERE value >= 90
    ),
    marked AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                    THEN 1 ELSE 0 END AS new_burst
        FROM over_t
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    bursts AS (
        SELECT *, CAST(sum(new_burst) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS burst
        FROM marked
    )
    SELECT user_id, burst AS alert_seq,
           min(event_id) AS alert_event_id,
           CAST(count(*) AS BIGINT) AS suppressed,
           round(max(value), 6) AS peak_value
    FROM bursts GROUP BY user_id, burst
    ORDER BY user_id, alert_seq
    """,
    tags=("window", "events"),
)
def events_threshold_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing: a reading over threshold fires an alert only
    if no over-threshold reading occurred in the previous 10 minutes;
    followers inside the burst are suppressed but counted, and the
    burst's peak rides along. Monitoring pipelines run exactly this
    dedup before paging. Same gaps-and-islands machinery as
    sessionization, applied AFTER the threshold filter — which is the
    trick: the window only ever sees the (sparse) exceedances, so the
    debounce costs a filter plus a window over a fraction of the
    corpus. The streaming twin holds last-alert-ts per user in
    applyInPandasWithState; this is its deterministic batch oracle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") >= 90)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_burst",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 600000000), 1
        ).otherwise(0),
    )
    bursts = marked.withColumn("burst", F.sum("new_burst").over(w_run))
    return (
        bursts.groupBy("user_id", F.col("burst").alias("alert_seq"))
        .agg(
            F.min("event_id").alias("alert_event_id"),
            F.count(F.lit(1)).alias("suppressed"),
            F.round(F.max("value"), 6).alias("peak_value"),
        )
        .orderBy("user_id", "alert_seq")
    )


@register(
    "events_funnel_time_bound",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    conv AS (
        SELECT c.user_id, c.event_id,
               CAST(CASE WHEN EXISTS (
                   SELECT 1 FROM purchases p
                   WHERE p.user_id = c.user_id
                     AND p.ts > c.ts
                     AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
               ) THEN 1 ELSE 0 END AS INT) AS converted
        FROM clicks c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(sum(converted) AS BIGINT) AS n_converted
    FROM conv GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "events"),
)
def events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: a click converts only if the SAME user
    purchases within the next hour (the attribution-window semantics
    ad analytics actually uses, vs events_session_funnel's same-session
    rule). Encoded without a range self-join: one user-keyed window
    takes the minimum FUTURE purchase time at each click (min over the
    following frame on a union'd, type-tagged stream), then a constant
    comparison. One shuffle on user_id; the window state is a single
    timestamp — compare the EXISTS-subquery form, which plans as a
    per-user nested loop. Scale: identical shape to the as-of join
    family; skewed users split by AQE."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    # purchases sort BEFORE same-ts clicks (kind 0 < 1) so a same-ts
    # purchase is NOT in a click's strict future — matches p.ts > c.ts
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = tagged.withColumn("next_p", F.min("p_ts").over(wf))
    conv = nxt.filter(F.col("kind") == 1).select(
        "user_id",
        "event_id",
        F.when(
            F.col("next_p").isNotNull()
            & (
                F.unix_micros("next_p") - F.unix_micros("ts")
                <= 3600000000
            ),
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return (
        conv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum("converted").alias("n_converted"),
        )
        .orderBy("user_id")
    )


@register(
    "window_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           round(value, 6) AS value,
           round(list_sort(list(value) OVER w)
                 [(len(list(value) OVER w) + 1) // 2], 6) AS rolling_median
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window",),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a 5-row sliding frame — no engine supports
    percentile as a native window state (the state is the whole frame),
    so the encoding collects the frame into an array and picks the
    sorted midpoint. Legitimate ONLY for small constant frames: state
    is O(frame), and the array ops stay codegen. For wide frames the
    scale path is two heaps or a t-digest in a custom stateful op —
    this query pins the exact-small-frame contract."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    return (
        e.select(
            "user_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(
                F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int")), 6
            ).alias("rolling_median"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "events_resample_interpolate",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr,
               t.event_type
        FROM bounds, (SELECT DISTINCT event_type FROM events
                      WHERE event_type IN ('click', 'purchase')) t
    ),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               avg(value) AS obs
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type, hr
    ),
    joined AS (
        SELECT s.event_type, s.hr, h.obs,
               epoch(s.hr) AS e
        FROM spine s LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hr = h.hr
    ),
    bracketed AS (
        SELECT event_type, hr, obs, e,
               last_value(obs IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN obs IS NOT NULL THEN e END IGNORE NULLS)
                   OVER w_prev AS pe,
               first_value(obs IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN obs IS NOT NULL THEN e END IGNORE NULLS)
                   OVER w_next AS ne
        FROM joined
        WINDOW
          w_prev AS (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hr,
           CAST(obs IS NOT NULL AS INT) AS observed,
           round(CASE
               WHEN obs IS NOT NULL THEN obs
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv) * (e - pe) / (ne - pe)
               WHEN pv IS NOT NULL THEN pv
               ELSE nv END, 6) AS value_interp
    FROM bracketed
    ORDER BY event_type, hr
    """,
    tags=("window", "events"),
)
def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-to-hourly with linear interpolation: aggregate the
    irregular event stream to an hourly grid, then fill silent hours by
    interpolating between the bracketing observations (edges carry the
    nearest value). The standard time-series densification before any
    windowed model feature.

    The bracketing values come from two frame-bounded windows with
    ignorenulls last/first — one forward, one backward pass per
    partition, no self-join. Scale: the interpolation runs on the
    AGGREGATED grid (|hours| × |types| rows), never on raw events, so
    the window state is trivially small; the raw stream is touched by
    exactly one shuffle (the hourly groupBy)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = e.select("event_type").distinct()
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    ).crossJoin(types)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.avg("value").alias("obs"))
    joined = spine.join(F.broadcast(hourly), ["event_type", "hr"], "left").select(
        "event_type", "hr", "obs", F.unix_timestamp("hr").alias("e")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_e = F.when(F.col("obs").isNotNull(), F.col("e"))
    b = joined.select(
        "event_type",
        "hr",
        "obs",
        "e",
        F.last("obs", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_e, ignorenulls=True).over(w_prev).alias("pe"),
        F.first("obs", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_e, ignorenulls=True).over(w_next).alias("ne"),
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("e") - F.col("pe"))
            / (F.col("ne") - F.col("pe")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return b.select(
        "event_type",
        "hr",
        F.col("obs").isNotNull().cast("int").alias("observed"),
        F.round(interp, 6).alias("value_interp"),
    ).orderBy("event_type", "hr")


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    trans AS (
        SELECT src, dst, count(*) AS n
        FROM seq WHERE dst IS NOT NULL
        GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) /
                 sum(n) OVER (PARTITION BY src), 6) AS p
    FROM trans
    ORDER BY src, dst
    """,
    tags=("window", "events"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next=dst | current=src), the base model for
    next-action prediction and for flagging bot-like sessions (rows
    whose transition likelihood is improbably high).

    Scale: ONE shuffle on user_id orders each user's history for the
    lead(); the transition count then collapses map-side to ≤ |types|²
    rows, and the row-normalizing window runs on that tiny matrix.
    Tie-break on (ts, event_id) makes the sequence — and the matrix —
    deterministic under concurrent timestamps."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return trans.select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.sum("n").over(wsrc), 6).alias("p"),
    ).orderBy("src", "dst")


@register(
    "window_percent_change_wow",
    oracle="""
    WITH weekly AS (
        SELECT event_type, date_trunc('week', ts) AS wk,
               CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total
        FROM events
        GROUP BY event_type, wk
    )
    SELECT event_type, wk, round(total, 6) AS total,
           round(100.0 * (total - lag(total) OVER w)
                 / lag(total) OVER w, 6) AS pct_change
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY wk)
    ORDER BY event_type, wk
    """,
    tags=("window", "events"),
)
def window_percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change per event type — the reporting
    staple. The delta runs on the AGGREGATED weekly grid, so the lag
    window's state is |weeks| rows per type; decimal accumulation keeps
    the weekly totals associative (float sums would drift with
    partitioning), cast to double only at the edge."""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.groupBy(
            "event_type",
            # DuckDB's week-trunc yields DATE; match it (both are Monday-start)
            F.to_date(F.date_trunc("week", "ts")).alias("wk"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(30,8)"))
            .cast("double")
            .alias("total")
        )
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    prev = F.lag("total").over(w)
    return weekly.select(
        "event_type",
        "wk",
        F.round("total", 6).alias("total"),
        F.round(100.0 * (F.col("total") - prev) / prev, 6).alias("pct_change"),
    ).orderBy("event_type", "wk")


@register(
    "window_activity_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grouped AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS island_key
        FROM days
    ),
    islands AS (
        SELECT user_id, island_key,
               CAST(count(*) AS BIGINT) AS streak_days,
               min(d) AS streak_start
        FROM grouped GROUP BY user_id, island_key
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(streak_days) AS BIGINT) AS longest_streak,
           min(streak_start) AS first_active
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window",),
)
def window_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's active DAYS into maximal
    consecutive runs via the date − row_number() constant-key trick,
    then summarize streak count / longest streak per user — the
    engagement-streak query every activity warehouse runs.

    Scale: one distinct (user, day) aggregation (output ≤ users×days,
    far below event count), a per-user window over that compact grid,
    and two more shuffles on the same user_id key — the raw event table
    is scanned once and never shuffled."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "island_key", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = grouped.groupBy("user_id", "island_key").agg(
        F.count(F.lit(1)).cast("long").alias("streak_days"),
        F.min("d").alias("streak_start"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("streak_days").cast("long").alias("longest_streak"),
            F.min("streak_start").alias("first_active"),
        )
        .orderBy("user_id")
    )


@register(
    "events_ewma_daily",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
               {dsum_sql('value')} AS x
        FROM events GROUP BY 1, 2
    ),
    seq AS (
        SELECT user_id, d, x,
               row_number() OVER (PARTITION BY user_id ORDER BY d) AS i
        FROM daily
    ),
    rec AS (
        SELECT user_id, i, x AS s FROM seq WHERE i = 1
        UNION ALL
        SELECT q.user_id, q.i, 0.3 * q.x + 0.7 * r.s
        FROM seq q JOIN rec r ON q.user_id = r.user_id AND q.i = r.i + 1
    )
    SELECT user_id,
           CAST(max(i) AS BIGINT) AS n_days,
           round(arg_max(s, i), 6) AS ewma
    FROM rec
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "timeseries", "udf"),
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3) over each
    user's daily totals — the grouped SEQUENTIAL-RECURSION pattern
    (s_t = a*x_t + (1-a)*s_{t-1}) that window frames cannot express
    exactly: the closed-form prefix-sum rewrite changes float
    association and drifts in the last ulps, so the engine runs the
    recursion as written, per group, inside an Arrow-batched
    applyInPandas. The oracle is a recursive CTE executing the SAME
    per-step arithmetic (0.3*x + 0.7*s, one fused ordering) — both
    engines walk identical IEEE op sequences, which is what makes the
    hash comparison exact rather than tolerance-based. Daily inputs
    come off the exact decimal-sum path first, so the recursion's
    INPUTS are bit-stable at any parallelism too.

    Scale: stage 1 is a plain hash aggregate (user x day); stage 2
    shuffles only the daily table (30 rows/user here, bounded by the
    calendar at 100 TB) and each group's recursion is O(days) in one
    pandas batch. State never crosses groups — full parallelism by
    user."""
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .agg(dsum(F.col("value")).alias("x"))
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        s = None
        for x in pdf["x"]:
            s = float(x) if s is None else 0.3 * float(x) + 0.7 * s
        # rounding happens OUTSIDE, via F.round — Python round() is
        # half-to-even over exact decimals, a third semantics the
        # repo's F.round/DuckDB-round convention does not share
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_days": [len(pdf)],
                "ewma_raw": [s],
            }
        )

    return (
        daily.groupBy("user_id")
        .applyInPandas(ewma, "user_id bigint, n_days bigint, ewma_raw double")
        .select(
            "user_id", "n_days", F.round("ewma_raw", 6).alias("ewma")
        )
        .orderBy("user_id")
    )


@register(
    "events_cep_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST(length(regexp_extract_all(s, 'v[^ep]*p')) AS BIGINT)
               AS n_conversions,
           CAST(contains(s, 'e') AS INT) AS had_error,
           substr(s, 1, 10) AS seq_prefix
    FROM seq
    ORDER BY user_id
    """,
    tags=("window", "events", "cep"),
)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style complex-event pattern matching: each
    user's event history collapses to an ordered symbol string (first
    letter of event_type, ordered by ts then event_id) and the
    conversion pattern `v[^ep]*p` — a view later closed by a purchase
    with no error and no earlier purchase between — is counted with
    non-overlapping regex semantics. The pattern language is
    unambiguous (each match start forces a unique end), so Java and
    RE2-style engines agree and the oracle is exact. This is the CEP
    idiom Spark lacks a native operator for, expressed as
    sort_array(collect_list) + ONE codegen'd regex per user — no
    self-joins, no per-step window passes (compare
    events_funnel_time_bound, which does deadline-bounded step joins).

    Scale: one shuffle (groupBy user); per-user sequences are bounded
    by per-key activity, the regex is linear in sequence length, and
    nothing crosses the network except the packed symbol strings.
    Skewed users cap at their event count — at 100 TB, split
    pathological keys by session first (stream_session_window is the
    splitter)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.col("ts"), F.col("event_id"),
            F.substring("event_type", 1, 1).alias("ch"),
        ).alias("e"),
    )
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list("e")), lambda s: s["ch"]
            ),
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        F.regexp_count(F.col("s"), F.lit(r"v[^ep]*p"))
        .cast("long")
        .alias("n_conversions"),
        F.contains(F.col("s"), F.lit("e")).cast("int").alias("had_error"),
        F.substring("s", 1, 10).alias("seq_prefix"),
    ).orderBy("user_id")


@register(
    "events_token_bucket",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id, epoch_us(ts) AS t, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS i
        FROM events
    ),
    rec AS (
        SELECT user_id, i, t,
               5 AS tokens_before,
               CAST(5 >= 1 AS INT) AS admit,
               5 - 1 AS tokens_after
        FROM seq WHERE i = 1
        UNION ALL
        SELECT q.user_id, q.i, q.t,
               least(5, r.tokens_after
                        + CAST((q.t - r.t) // 60000000 AS INT))
                   AS tokens_before,
               CAST(least(5, r.tokens_after
                             + CAST((q.t - r.t) // 60000000 AS INT)) >= 1
                    AS INT) AS admit,
               least(5, r.tokens_after
                        + CAST((q.t - r.t) // 60000000 AS INT))
                 - CAST(least(5, r.tokens_after
                                 + CAST((q.t - r.t) // 60000000 AS INT)) >= 1
                        AS INT) AS tokens_after
        FROM seq q JOIN rec r ON q.user_id = r.user_id AND q.i = r.i + 1
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(admit) AS BIGINT) AS n_admitted,
           CAST(count(*) - sum(admit) AS BIGINT) AS n_rejected,
           CAST(arg_max(tokens_after, i) AS BIGINT) AS final_tokens
    FROM rec
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "events", "stateful"),
)
def events_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate limiting replayed over history — the
    admission-control primitive (capacity 5, refill 1 token/60 s,
    integer-micros arithmetic): before each event the bucket refills
    floor(gap/60s) tokens capped at 5, the event is admitted iff a
    token is available, and admission consumes one. Per-user totals
    plus the final bucket level. Like events_ewma_daily this is a
    grouped SEQUENTIAL recursion no window frame expresses; unlike the
    EWMA it is ALL-INTEGER, so cross-engine parity is exact by
    construction (the oracle's recursive CTE steps the identical
    integer state machine). Replayed admission tells you what a
    production limiter WOULD have dropped — the calibration loop for
    choosing capacity/refill before deploying the streaming twin
    (stream_threshold_debounce holds the episode version).

    Scale: one shuffle (groupBy user); each group's replay is O(events)
    integer ops in one pandas batch, state never crosses keys."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )

    CAP, PERIOD = 5, 60_000_000

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id"])
        tokens, last_t = CAP, None
        admitted = 0
        for t in pdf["t"]:
            t = int(t)
            if last_t is not None:
                tokens = min(CAP, tokens + (t - last_t) // PERIOD)
            admit = tokens >= 1
            if admit:
                tokens -= 1
                admitted += 1
            last_t = t
        n = len(pdf)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "n_admitted": [admitted],
                "n_rejected": [n - admitted],
                "final_tokens": [tokens],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            bucket,
            "user_id bigint, n_events bigint, n_admitted bigint, "
            "n_rejected bigint, final_tokens bigint",
        )
        .orderBy("user_id")
    )


_DEC2 = "decimal(30,8)"  # the functions/numeric decimal-exact sum type


@register(
    "window_time_range_frame",
    oracle="""
    WITH keyed AS (
        SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events
        WHERE user_id % 25 = 0
    )
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_7d,
           round(CAST(sum(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE), 6)
               AS sum_7d
    FROM keyed
    WINDOW w AS (PARTITION BY user_id ORDER BY t
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "timeseries"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based RANGE frame: each event's trailing 7-DAY window per
    user (count + decimal-exact sum), ordered by event time in integer
    micros so the frame bound is an exact value offset — the
    sliding-by-time analytic (trailing spend, rolling exposure) that
    ROWS frames cannot express when events are irregularly spaced:
    the frame holds whatever fits the interval, not a fixed row
    count. The epoch-micros ordering key makes Spark's rangeBetween
    and the oracle's RANGE PRECEDING bit-identical (both are integer
    comparisons; no calendar arithmetic inside the frame).

    Scale: one shuffle on user_id, one sort per partition; the frame
    scan is the classic two-pointer pass, O(events) per user. Ties on
    t are well-defined: RANGE frames include ALL peer rows of the
    current ordering value on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    keyed = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-604_800_000_000, 0)
    )
    return keyed.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
        F.round(
            F.sum(F.col("value").cast(_DEC2)).over(w).cast("double"), 6
        ).alias("sum_7d"),
    ).orderBy("user_id", "event_id")


@register(
    "events_seasonality_profile",
    oracle="""
    WITH base AS (
        SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
               CAST(value AS DECIMAL(30,8)) AS v
        FROM events
    )
    SELECT dow, hod,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value
    FROM base
    GROUP BY dow, hod
    HAVING count(*) >= 5
    ORDER BY dow, hod
    """,
    tags=("window", "events", "timeseries"),
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal baseline profile: mean activity per (day-of-week x
    hour-of-day) cell — the reference surface anomaly detectors
    compare against (events_anomaly_zscore flags deviations from a
    trailing window; this builds the CALENDAR-periodic expectation,
    the other standard baseline). Sparse cells (<5 events) are dropped
    rather than shipped as noise. DuckDB's dayofweek is 0-based
    Sunday, Spark's 1-based — the oracle shifts (+1), the suite's
    documented convention (scalars.py).

    Scale: one hash aggregate into at most 7x24 cells — partial
    aggregation collapses everything map-side; the profile broadcasts
    back to score live traffic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
            F.col("value").cast(_DEC2).alias("v"),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_value"),
        )
        .filter(F.col("n_events") >= 5)
        .orderBy("dow", "hod")
    )


@register(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.5), 6) AS median_gap_us,
           round(quantile_cont(gap_us, 0.9), 6) AS p90_gap_us,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("window", "events", "timeseries"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time analysis: per event type, the distribution
    of gaps between a user's consecutive events (median/p90/min in
    integer micros) — the churn/engagement primitive behind session
    timeout tuning (stream_session_window's 5-minute gap is a choice
    THIS query calibrates) and burst detection. Gaps are computed per
    USER then aggregated per TYPE, so cross-user boundaries never
    fabricate a gap. Integer gaps feed the exact interpolated
    percentile (F.percentile ≡ quantile_cont, the agg_percentiles
    convention).

    Scale: one user-keyed window pass for the lag, one type-keyed
    aggregate; exact percentiles sort per group — at 100 TB swap
    approx_percentile in, same plan otherwise."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    gaps = ev.select(
        "event_type", (t - F.lag(t).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.round(F.percentile("gap_us", F.lit(0.5)), 6).alias("median_gap_us"),
            F.round(F.percentile("gap_us", F.lit(0.9)), 6).alias("p90_gap_us"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
        )
        .orderBy("event_type")
    )


@register(
    "events_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               count(*) AS c
        FROM events GROUP BY event_type, d
    ),
    pairs AS (
        SELECT a.event_type,
               (CAST(b.c AS DOUBLE) - CAST(a.c AS DOUBLE))
                   / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM pairs
    ),
    med AS (
        SELECT event_type,
               avg(slope) AS trend,   -- one or two middle elements
               max(n) AS n_pairs
        FROM ranked
        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        GROUP BY event_type
    ),
    days AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    )
    SELECT m.event_type, d.n_days,
           CAST(m.n_pairs AS BIGINT) AS n_pairs,
           round(m.trend, 6) AS trend_per_day
    FROM med m JOIN days d USING (event_type)
    ORDER BY m.event_type
    """,
    tags=("windows", "events"),
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type — the median of all
    pairwise day-over-day volume slopes (Theil 1950 / Sen 1968, public
    method): a single wild day cannot swing it, unlike the OLS slope,
    which is why monitoring pipelines fit trends this way. The median
    is the exact middle element (or the mean of the two middles) of
    the sorted slope multiset — no summation over floats, so the value
    is deterministic under any partitioning, and each slope is ONE
    IEEE subtraction/division in an op order the oracle mirrors.

    Scale shape: the pair join is quadratic IN DAYS, not rows — raw
    events collapse to one daily-count row per (type, day) first, so a
    year of 100 TB telemetry is at most ~66k pairs per type, emitted
    map-side from a self-join on the tiny daily frame. The rank/median
    window shuffles per-type slope rows once."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.c").cast("double") - F.col("a.c").cast("double"))
            / F.datediff(F.col("b.d"), F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(
            F.avg("slope").alias("trend"),
            F.max("n").cast("long").alias("n_pairs"),
        )
    )
    days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return (
        med.join(days, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            F.round("trend", 6).alias("trend_per_day"),
        )
        .orderBy("event_type")
    )


@register(
    "events_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               count(*) AS c
        FROM events GROUP BY event_type, d
    ),
    s AS (
        SELECT a.event_type,
               sum(CASE WHEN b.c > a.c THEN 1
                        WHEN b.c < a.c THEN -1 ELSE 0 END) AS s_stat,
               count(*) AS n_pairs
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY a.event_type
    ),
    ties AS (  -- tie correction: groups of equal daily counts
        SELECT event_type,
               sum(m * (m - 1) * (2 * m + 5)) AS tie_term
        FROM (
            SELECT event_type, c, count(*) AS m
            FROM daily GROUP BY event_type, c
        ) GROUP BY event_type
    ),
    n AS (
        SELECT event_type, count(*) AS nd FROM daily GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(n.nd AS BIGINT) AS n_days,
           CAST(s.s_stat AS BIGINT) AS s_stat,
           CAST(n.nd * (n.nd - 1) * (2 * n.nd + 5) - ties.tie_term
                AS BIGINT) AS var18,
           round(CASE WHEN s.s_stat > 0 THEN
                          (CAST(s.s_stat AS DOUBLE) - 1)
                          / sqrt((CAST(n.nd AS DOUBLE) * (n.nd - 1)
                                  * (2 * n.nd + 5) - ties.tie_term) / 18)
                      WHEN s.s_stat < 0 THEN
                          (CAST(s.s_stat AS DOUBLE) + 1)
                          / sqrt((CAST(n.nd AS DOUBLE) * (n.nd - 1)
                                  * (2 * n.nd + 5) - ties.tie_term) / 18)
                      ELSE 0.0 END, 6) AS z_score
    FROM s JOIN ties USING (event_type) JOIN n USING (event_type)
    ORDER BY s.event_type
    """,
    tags=("windows", "events"),
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test (Mann 1945 / Kendall 1975,
    public method) — the significance companion of
    events_theil_sen_trend: S = Σ sign(c_j − c_i) over all day pairs
    (PURE INTEGER, hash-exact), the tie-corrected variance
    18·Var(S) = n(n−1)(2n+5) − Σ m(m−1)(2m+5) (also integer, emitted
    as ``var18``), and the continuity-corrected z-score whose only
    float ops are one division and one sqrt in an op order the oracle
    mirrors. Monitoring pipelines pair exactly these two: Theil-Sen
    says how steep, Mann-Kendall says whether to believe it.

    Scale shape: identical to the Theil-Sen query — the pair join is
    quadratic in DAYS (daily-count rows), never in events; the tie
    census is a two-level aggregate on the same tiny frame."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long"))
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("m"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("m") * (F.col("m") - 1) * (2 * F.col("m") + 5)
            ).alias("tie_term")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    joined = s.join(ties, "event_type").join(n, "event_type")
    nd = F.col("n_days")
    var18 = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")).cast("long")
    sd = F.sqrt(
        (
            nd.cast("double") * (nd - 1) * (2 * nd + 5) - F.col("tie_term")
        )
        / 18
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat").cast("double") - 1) / sd,
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat").cast("double") + 1) / sd,
        )
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "event_type",
        "n_days",
        F.col("s_stat").cast("long").alias("s_stat"),
        var18.alias("var18"),
        F.round(z, 6).alias("z_score"),
    ).orderBy("event_type")


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               count(*) AS c
        FROM events GROUP BY event_type, d
    ),
    seq AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
        FROM daily
    ),
    base AS (  -- 7x the baseline mean, kept integer: sum of first week
        SELECT event_type, sum(c) AS s7
        FROM seq WHERE i <= 7 GROUP BY event_type
    ),
    rec AS (
        SELECT event_type, 0 AS i, CAST(0 AS BIGINT) AS s FROM base
        UNION ALL
        SELECT r.event_type, q.i,
               greatest(CAST(0 AS BIGINT),
                        r.s + 7 * q.c - b.s7 - 14) AS s
        FROM rec r
        JOIN seq q ON q.event_type = r.event_type AND q.i = r.i + 1
        JOIN base b ON b.event_type = r.event_type
    )
    SELECT r.event_type,
           CAST(max(r.i) AS BIGINT) AS n_days,
           CAST(max(b.s7) AS BIGINT) AS baseline7,
           CAST(max(r.s) AS BIGINT) AS max_cusum,
           CAST(min(CASE WHEN r.s > 210 THEN r.i END) AS BIGINT)
               AS first_alarm_day
    FROM rec r JOIN base b USING (event_type)
    WHERE r.i > 0
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
    tags=("windows", "events", "udf"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector (Page 1954, public method)
    over daily event volumes — the sequential alarm a monitoring
    pipeline runs beside the Theil-Sen/Mann-Kendall trend pair:
    s_i = max(0, s_{i-1} + (x_i - mu - k)). Everything is scaled by 7
    so the recursion is ALL-INTEGER (mu = first-week mean enters as
    the raw week sum, slack k = 2 enters as 14): hash-exact with no
    float anywhere, like events_token_bucket. The alarm fires the
    first day the statistic exceeds h = 30 (scaled 210); max_cusum and
    the alarm day are both reported, null when never breached. The
    oracle is a recursive CTE stepping the identical state machine.

    Scale shape: raw events collapse to the bounded daily frame first;
    each type's recursion is O(days) inside one Arrow batch — state
    never crosses groups, full parallelism by type."""
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        counts = [int(v) for v in pdf["c"]]
        s7 = sum(counts[:7])
        s = 0
        mx = 0
        alarm = None
        for i, c in enumerate(counts, start=1):
            s = max(0, s + 7 * c - s7 - 14)
            mx = max(mx, s)
            if alarm is None and s > 210:
                alarm = i
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(counts)],
                "baseline7": [s7],
                "max_cusum": [mx],
                "first_alarm_day": pd.array([alarm], dtype="Int64"),
            }
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(
            walk,
            "event_type string, n_days bigint, baseline7 bigint, "
            "max_cusum bigint, first_alarm_day bigint",
        )
        .orderBy("event_type")
    )
