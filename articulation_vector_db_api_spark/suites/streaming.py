"""Streaming suite (SURVEY §2.2: watermark/windows/state/late data —
all absent in the reference).

Each query REALLY runs through Structured Streaming (readStream →
stateful aggregation → AvailableNow → memory sink); the oracle is the
batch-equivalent SQL, which is exact because AvailableNow drains the
full fixture in order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..streaming.windows import read_events_stream, run_available_now

_DEC = "decimal(30,8)"


def tumbling_window_agg(ev: DataFrame) -> DataFrame:
    """The streaming transformation alone (also plan-audited by
    tools/check_plans.py: StateStoreRestore/Save + partial/final agg)."""
    return (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling_window",
    headline=True,
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("streaming",),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows per event type, computed by
    a real streaming aggregation (state keyed by window×type)."""
    ev = read_events_stream(spark, sf_dir)
    agg = tumbling_window_agg(ev)
    return run_available_now(agg, "tumbling", "complete").orderBy(
        "window_start", "event_type"
    )


@register(
    "stream_sliding_window",
    oracle="""
    WITH expanded AS (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
                   AS window_start,
               value
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY window_start
    ORDER BY window_start
    """,
    tags=("streaming",),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute slide): each event
    lands in exactly two overlapping windows."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )
    return run_available_now(agg, "sliding", "complete").orderBy("window_start")


def session_window_agg(ev: DataFrame) -> DataFrame:
    """The session-window transformation alone (plan-audited by
    tools/check_plans.py: SessionWindowStateStore save/restore)."""
    return (
        ev.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '5 minutes' AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute inactivity gap per user —
    Spark's native session_window stateful operator; the oracle is the
    classic gaps-and-islands rewrite (lag → new-session flag →
    running-sum session ids)."""
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(
        session_window_agg(ev), "session", "complete"
    ).orderBy("user_id", "session_start")


def dedup_count_transform(ev: DataFrame) -> DataFrame:
    """The exactly-once dedup transformation alone (plan-audited by
    tools/check_plans.py: StreamingDeduplicate above the union)."""
    doubled = ev.unionByName(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n_unique
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming",),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the stream unioned with itself
    (every event delivered twice) → dropDuplicates on event_id keyed
    state → per-type counts equal the single-delivery truth."""
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(
        dedup_count_transform(ev), "dedup", "complete"
    ).orderBy("event_type")


@register(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.event_type, c.c_mktsegment,
           round(e.value, 6) AS value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static dimension join: the enrichment pattern (events
    joined to a customer table mid-stream). The static side broadcasts
    per micro-batch; no state is kept."""
    from ..sources.readers import load_table

    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer")
    joined = ev.join(cust, ev.user_id == cust.c_custkey).select(
        "event_id", "event_type", "c_mktsegment", F.round("value", 6).alias("value")
    )
    return run_available_now(joined, "static_join", "append").orderBy("event_id")


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_micros
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '10 minutes'
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join with an event-time interval condition
    (click → purchase within 10 minutes, per user). Watermarks bound
    both join states; the oracle is the equivalent batch interval
    join."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 minutes")),
    ).select(
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_micros"),
    )
    return run_available_now(joined, "ss_join", "append").orderBy(
        "click_id", "purchase_id"
    )


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_type, count(*) AS n_unique
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: duplicate events arriving within
    the watermark horizon collapse, and state for expired keys is
    EVICTED — the production-shaped streaming dedup (plain
    dropDuplicates keeps unbounded state)."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    doubled = ev.unionByName(ev)
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    return run_available_now(agg, "dedup_wm", "complete").orderBy("event_type")


@register(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(max(value), 6) AS max_value,
           min(event_id) AS first_event_id
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator via applyInPandasWithState:
    per-user running stats held in explicit GroupState (the engine's
    slot for sessionization/CEP logic Spark lacks built-ins for).
    Order-insensitive accumulators (count/max/min) keep the output
    exactly batch-equivalent."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        n, mx, first = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["value"].max()
            mx = batch_max if mx is None else max(mx, batch_max)
            batch_first = pdf["event_id"].min()
            first = batch_first if first is None else min(first, batch_first)
        state.update((n, float(mx), int(first)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "max_value": [round(float(mx), 6)],
                "first_event_id": [int(first)],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, max_value DOUBLE, first_event_id BIGINT",
        stateStructType="n BIGINT, mx DOUBLE, first BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_available_now(out, "stateful", "update").orderBy("user_id")


@register(
    "stream_transform_with_state",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           min(event_id) AS first_event_id,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "stateful"),
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (the Spark 4.x arbitrary-state API):
    a StatefulProcessor with explicit ValueState per event type —
    schema-evolvable state, timers, and TTL-capable, superseding
    applyInPandasWithState for new custom operators. Accumulators are
    order-insensitive → exact batch equivalence.

    The state-server protocol needs the ``protobuf`` package; when the
    environment lacks it (this build does), the operator falls back to
    an applyInPandasWithState implementation with identical semantics —
    same output, same oracle, older state API."""
    import pandas as pd

    try:
        import google.protobuf.descriptor  # noqa: F401

        _HAVE_PROTOBUF = True
    except ImportError:
        _HAVE_PROTOBUF = False

    ev = read_events_stream(spark, sf_dir)

    if not _HAVE_PROTOBUF:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def update(key, pdfs, state: GroupState):
            (etype,) = key
            n, first, mx = state.get if state.exists else (0, None, None)
            for pdf in pdfs:
                n += len(pdf)
                bmin = int(pdf["event_id"].min())
                first = bmin if first is None else min(first, bmin)
                bmax = float(pdf["value"].max())
                mx = bmax if mx is None else max(mx, bmax)
            state.update((n, int(first), float(mx)))
            yield pd.DataFrame(
                {
                    "event_type": [etype],
                    "n_events": [n],
                    "first_event_id": [first],
                    "max_value": [round(mx, 6)],
                }
            )

        out = ev.groupBy("event_type").applyInPandasWithState(
            update,
            outputStructType=(
                "event_type STRING, n_events BIGINT, first_event_id BIGINT, max_value DOUBLE"
            ),
            stateStructType="n BIGINT, first BIGINT, mx DOUBLE",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return run_available_now(out, "tws_fallback", "update").orderBy("event_type")

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, first_id BIGINT, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, first, mx = (
                self._state.get() if self._state.exists() else (0, None, None)
            )
            for pdf in rows:
                n += len(pdf)
                bmin = int(pdf["event_id"].min())
                first = bmin if first is None else min(first, bmin)
                bmax = float(pdf["value"].max())
                mx = bmax if mx is None else max(mx, bmax)
            self._state.update((n, first, mx))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "first_event_id": [first],
                    "max_value": [round(mx, 6)],
                }
            )

        def close(self) -> None:
            pass

    out = ev.groupBy("event_type").transformWithStateInPandas(
        TypeStats(),
        outputStructType=(
            "event_type STRING, n_events BIGINT, first_event_id BIGINT, max_value DOUBLE"
        ),
        outputMode="Update",
        timeMode="None",
    )
    return run_available_now(out, "tws", "update").orderBy("event_type")


@register(
    "stream_watermark_append",
    oracle="""
    WITH w AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS horizon FROM events)
    SELECT window_start, n_events
    FROM w, wm
    WHERE window_start + INTERVAL '5 minutes' <= horizon
    ORDER BY window_start
    """,
    tags=("streaming",),
)
def stream_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode tumbling counts: only windows sealed by
    the 10-minute watermark emit; trailing windows stay open in state.

    The emission set IS deterministic, so this carries a full value
    oracle: AvailableNow runs a final no-data micro-batch after the
    data is exhausted (spark.sql.streaming.noDataMicroBatches, on by
    default), which advances the watermark to max(ts) - delay and
    flushes every window whose end <= that horizon — on this fixture
    all but the trailing two windows. The oracle encodes exactly that
    seal rule; a regression in emission semantics (e.g. the flush batch
    not firing) hash-fails rather than hiding behind a rows-only
    check. The same rule is proven under genuine MULTI-batch execution
    (maxFilesPerTrigger=1 over four time-ordered files, watermark
    advancing batch to batch) in tests/test_streaming_unbounded.py."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    return run_available_now(agg, "watermark", "append").orderBy("window_start")


@register(
    "stream_topk_trending",
    oracle="""
    WITH counts AS (
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, n,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY n DESC, event_type) AS rn
        FROM counts
    )
    SELECT window_start, event_type, n, rn
    FROM ranked WHERE rn <= 3
    ORDER BY window_start, rn
    """,
    tags=("streaming",),
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-3 event types per 10-minute window: the windowed
    COUNT runs as a real streaming aggregation (state keyed by
    window×type); the RANKING runs on the sink table afterwards —
    Structured Streaming forbids ranking windows mid-stream, and this
    split is the production pattern anyway (rank at read time, or in
    the foreachBatch writer). State size = windows × types, bounded by
    the watermark horizon."""
    from pyspark.sql.window import Window

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )
    counts = run_available_now(agg, "topk_trending", "complete")
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("window_start", "rn")
    )


@register(
    "stream_ohlc_bars",
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
           count(*) AS n_events
    FROM ranked
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
    tags=("streaming", "rollup"),
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate OHLC: the hypertable rollup
    (events_ohlc_bars) maintained BY THE STREAM — open/close via
    min/max over (ts, event_id, value) structs inside the streaming
    aggregation state, so each bar updates incrementally per
    micro-batch instead of being recomputed. State size = bars ×
    types × one struct, bounded; AvailableNow drains the fixture so
    the batch SQL twin is exact."""
    ev = read_events_stream(spark, sf_dir)
    first_s = F.struct("ts", "event_id", "value")
    agg = (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.round(F.min(first_s).getField("value"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max(first_s).getField("value"), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
    return run_available_now(agg, "ohlc", "complete").orderBy(
        "bucket", "event_type"
    )


@register(
    "stream_curation_admission",
    oracle="""
    WITH q AS (
        SELECT DISTINCT sha256(trim(lower(text))) AS dg, source,
               len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   AS n_tokens
        FROM documents
        WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 10
    )
    SELECT source, count(*) AS n_admitted,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM q GROUP BY source ORDER BY source
    """,
    tags=("streaming", "curation"),
)
def stream_curation_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation gate as a STREAM: documents arrive (delivered twice
    here — the stream unioned with itself — to model at-least-once
    sources), pass the heuristic quality filter, and exactly-once
    admission dedups on (digest, source) in keyed state; per-source
    admitted counts equal the single-delivery batch truth. The dedup
    key is SOURCE-SCOPED deliberately: a digest-only key would
    attribute a text duplicated ACROSS sources to whichever replica
    arrived first — order-dependent, so per-source counts would flicker
    with batch boundaries (observed at sf0.1, where cross-source
    duplicate digests exist); cross-source dedup is the batch dedup_*
    family's job, with a deterministic survivor rule.

    Scale shape: state is one digest per unique document, bounded in
    production by dropDuplicatesWithinWatermark; the quality filter
    runs BEFORE the stateful operator so rejected docs never enter
    state — order matters at 100 TB where the reject rate is high."""
    from ..streaming.windows import read_documents_stream

    docs = read_documents_stream(spark, sf_dir)
    admitted = curation_admission_transform(docs)
    return run_available_now(admitted, "curation_admission", "complete").orderBy(
        "source"
    )


def curation_admission_transform(docs: DataFrame) -> DataFrame:
    """The streaming transformation alone (plan-audited: the filter
    must sit below the dedup StateStore, and the per-source rollup is
    a second stateful agg)."""
    norm = F.trim(F.lower(F.col("text")))
    toks = F.split(norm, r"\s+")
    quality = (
        docs.unionByName(docs)
        .select(
            "source",
            F.sha2(norm, 256).alias("dg"),
            F.size(toks).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 10)
    )
    return (
        quality.dropDuplicates(["dg", "source"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_admitted"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "stream_sliding_distinct_users",
    oracle="""
    WITH expanded AS (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
                   AS window_start,
               user_id
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           count(DISTINCT user_id) AS n_users
    FROM expanded
    GROUP BY window_start
    ORDER BY window_start
    """,
    tags=("streaming",),
)
def stream_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per sliding 10-minute window (5-minute slide),
    computed as ONE streaming aggregation: the user set rides in
    collect_set state per window, so no chained stateful operators are
    needed (chained aggs are restricted mid-stream). At 100 TB swap
    collect_set for approx_count_distinct — the state drops from the
    user set to a fixed HLL sketch per window and the plan shape is
    unchanged; with a watermark, closed windows leave the store."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.size(F.collect_set("user_id")).alias("n_users"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_users",
        )
    )
    return run_available_now(agg, "sliding_distinct", "complete").orderBy(
        "window_start"
    )


@register(
    "stream_threshold_debounce",
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
    )
    SELECT user_id, event_id AS alert_event_id,
           round(value, 6) AS alert_value
    FROM marked WHERE new_burst = 1
    ORDER BY user_id, alert_event_id
    """,
    tags=("streaming", "stateful"),
)
def stream_threshold_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming alert debouncing in explicit GroupState: per user, an
    over-threshold reading fires only if the last ALERT for that user
    is more than 10 minutes old; the state is one timestamp. This is
    the live twin of the batch events_threshold_debounce — the oracle
    (first event of each over-threshold burst) proves the stateful
    operator and the gaps-and-islands batch encoding agree row for
    row. Rows inside one delivery are sorted per key before the state
    walk, so the result is delivery-chunking-independent; across
    micro-batches the file source's in-order delivery plus the
    persisted timestamp keep the same guarantee."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..streaming.windows import read_events_stream, run_available_now

    ev = read_events_stream(spark, sf_dir).filter(F.col("value") >= 90)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        (last_us,) = state.get if state.exists else (None,)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        alerts = []
        for ts, event_id, value in zip(
            rows["ts"], rows["event_id"], rows["value"]
        ):
            t_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is None or t_us - last_us > 600_000_000:
                alerts.append((int(user_id), int(event_id), round(float(value), 6)))
            # every exceedance extends the burst, alert or not
            last_us = t_us
        state.update((last_us,))
        yield pd.DataFrame(
            alerts, columns=["user_id", "alert_event_id", "alert_value"]
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id BIGINT, alert_event_id BIGINT, alert_value DOUBLE"
        ),
        stateStructType="last_us BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_available_now(out, "debounce", "update").orderBy(
        "user_id", "alert_event_id"
    )


@register(
    "stream_stream_left_outer_join",
    headline=True,  # r5: bench-tracked — the heaviest streaming state shape
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    wm AS (
        SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
               - INTERVAL '30 minutes' AS horizon
    )
    SELECT c.click_id, p.purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
    UNION ALL
    SELECT c.click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS BIGINT) AS lag_micros
    FROM c, wm
    WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = c.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes')
      AND c.ts + INTERVAL '10 minutes' < wm.horizon
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: every
    click→purchase match emits as it forms (inner semantics), and a
    click with no purchase emits null-padded only once the watermark
    proves no future purchase can match — i.e. when its match window
    [c_ts, c_ts+10min] falls entirely behind the global watermark.

    The emission set is deterministic under AvailableNow: the final
    no-data micro-batch advances the watermark to
    min(max click ts, max purchase ts) − 30min and evicts (= emits)
    every unmatched click whose window closed; trailing clicks stay in
    state, exactly as they would mid-stream in production. The oracle
    encodes that seal rule — inner matches ∪ unmatched clicks with
    c_ts + 10min < horizon. The same rule is proven under genuine
    MULTI-batch execution (both sides rate-limited to one file per
    micro-batch) in tests/test_streaming_unbounded.py.

    Scale: state is hash-partitioned on user_id on both sides and
    bounded by the 30-minute watermark + 10-minute condition range —
    store size ∝ event rate × 40min, independent of history length."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 minutes")),
        "left_outer",
    ).select(
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_micros"),
    )
    # state_partitions=4 (r15, VERDICT r14 item 4): the +22% r14 drift
    # root-caused to state-store FIXED overhead — stream-stream joins
    # keep 4 store instances per partition and AvailableNow pays every
    # instance twice (data batch + eviction batch); at fixture scale
    # 8 partitions spent ~6 s in the no-data addBatch alone. Measured
    # 8->4: 3.4 s -> 2.5 s steady-state, results identical. Production
    # sizes this to keyspace x throughput, per the runner's contract.
    return run_available_now(
        joined, "ss_left_outer", "append", state_partitions=4
    ).orderBy("click_id", "purchase_id")


@register(
    "stream_stream_full_outer_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    wm AS (
        SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
               - INTERVAL '30 minutes' AS horizon
    )
    SELECT c.click_id, p.purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
    UNION ALL
    SELECT c.click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS BIGINT) AS lag_micros
    FROM c, wm
    WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = c.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes')
      AND c.ts + INTERVAL '10 minutes' < wm.horizon
    UNION ALL
    SELECT CAST(NULL AS BIGINT) AS click_id,
           p.purchase_id,
           CAST(NULL AS BIGINT) AS lag_micros
    FROM p, wm
    WHERE NOT EXISTS (
            SELECT 1 FROM c
            WHERE c.user_id = p.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes')
      AND p.ts < wm.horizon
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream FULL OUTER interval join — both sides'
    eviction semantics in one query. Unmatched clicks seal when their
    forward match window [c_ts, c_ts+10min] closes (as in the left-
    outer query); unmatched purchases seal when the watermark passes
    p_ts itself, because their match window looks BACKWARD
    ([p_ts−10min, p_ts]) and no click later than the watermark horizon
    can still arrive. The oracle encodes both rules against the final
    watermark min(max click ts, max purchase ts) − 30min.

    Scale: same bounded two-sided state as the left-outer variant;
    the full-outer output adds no state, only eviction-time emission."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 minutes")),
        "full_outer",
    ).select(
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_micros"),
    )
    return run_available_now(joined, "ss_full_outer", "append").orderBy(
        "click_id", "purchase_id"
    )


@register(
    "stream_cdc_apply",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, event_type, ts, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_op,
           ts AS last_ts,
           round(value, 6) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "cdc"),
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: the event stream is read as a change feed
    over a user_profile table keyed by user_id — 'error' rows are
    DELETE tombstones, every other type is an UPSERT — and a custom
    stateful operator (applyInPandasWithState) materializes the final
    table: the row each key holds after its LAST change, with deleted
    keys absent. This is the streaming half of merge_upsert_orders /
    cdc_snapshot_diff: the same last-write-wins contract the batch
    MERGE enforces, held incrementally under state.

    Ordering is by CHANGE KEY (ts, event_id), not arrival order: the
    per-key state stores the argmax-by-(ts, event_id) change seen so
    far, an order-insensitive accumulator, so the result is exactly
    batch-equivalent no matter how the source batches or interleaves —
    the property that makes the DuckDB window-function oracle valid.
    Tombstones STAY in state (a newer upsert must beat an older delete
    and vice versa); they are dropped only at publish time.

    Scale: state is one fixed-width row per live key, hash-partitioned
    by user_id across state stores — no window over the raw feed, no
    global sort. The update-mode sink re-emits a key only when its
    winner changes; the trailing per-key argmax over the sink is the
    idempotent 'apply to serving store' step (bounded by keys x
    batches, not by feed length)."""
    ev = read_events_stream(spark, sf_dir)
    out = cdc_apply_transform(ev)
    sink = run_available_now(out, "cdc_apply", "update")
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("last_event_id").desc()
    )
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("last_op") != "error"))
        .select(
            "user_id",
            "last_event_id",
            "last_op",
            F.timestamp_micros("ts_us").alias("last_ts"),
            F.round("last_value", 6).alias("last_value"),
        )
        .orderBy("user_id")
    )


def cdc_apply_transform(ev: DataFrame) -> DataFrame:
    """The stateful changelog-apply transformation alone (plan-audited
    by tools/check_plans.py: FlatMapGroupsInPandasWithState keyed on
    user_id — one state row per live key)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )

    def apply_changes(key, pdfs, state: GroupState):
        (user_id,) = key
        prior = state.get if state.exists else None
        best = prior
        for pdf in pdfs:
            ordered = pdf.sort_values(["ts_us", "event_id"])
            last = ordered.iloc[-1]
            cand = (
                int(last["ts_us"]),
                int(last["event_id"]),
                str(last["event_type"]),
                float(last["value"]),
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if prior is not None and (best[0], best[1]) == (prior[0], prior[1]):
            return  # batch did not beat the stored winner: emit nothing
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "last_event_id": [best[1]],
                "last_op": [best[2]],
                "ts_us": [best[0]],
                "last_value": [best[3]],  # rounded at publish via F.round
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        apply_changes,
        outputStructType=(
            "user_id BIGINT, last_event_id BIGINT, last_op STRING, "
            "ts_us BIGINT, last_value DOUBLE"
        ),
        stateStructType="ts_us BIGINT, event_id BIGINT, op STRING, value DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_snapshot_ingest",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value,
           CAST(1 AS INT) AS multi_batch
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "sink", "maintenance"),
)
def stream_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once STREAMING SINK into the versioned snapshot table:
    the events feed (staged as 4 files, maxFilesPerTrigger=1 → a real
    multi-batch run) commits through the idempotent foreachBatch sink
    (operators/maintenance.py:streaming_snapshot_sink — batch-id-keyed,
    re-deliveries are no-ops), and the query aggregates the ACCUMULATED
    log. The oracle is the same aggregate over the raw fixture, so a
    batch lost, doubled, or half-committed by the sink hash-fails;
    ``multi_batch`` is computed from the manifest (did ≥2 versions
    actually land?) and pinned to 1, so a run that silently collapsed
    to one batch also fails. This registers the sink path that was
    previously pytest-only (tests/test_maintenance.py) as a
    driver-checked query.

    SIDE-EFFECTFUL BUILDER (ann_ivf_stored_probe contract): staging,
    checkpoint, and table build once per app behind an all-or-nothing
    completion marker.

    Scale: each micro-batch is one atomic snapshot version — commit
    cost is manifest-sized, data files are written once and never
    rewritten; the accumulated log reads as a parquet union (the same
    txn-version-per-stream protocol a Delta streaming sink uses)."""
    import os

    from ..operators.maintenance import (
        read_manifest,
        read_snapshot_log,
        streaming_snapshot_sink,
    )
    from ..sources.readers import SCHEMAS, load_table
    from .similarity import _build_once

    def _ingest(p: str) -> None:
        src_dir = os.path.join(p, "src")
        load_table(spark, sf_dir, "events").repartition(4).write.parquet(src_dir)
        sink = streaming_snapshot_sink(os.path.join(p, "table"))
        q = (
            spark.readStream.schema(SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(lambda df, bid: sink(df, bid))
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(p, "ckpt"))
            .start()
        )
        q.awaitTermination()

    store = _build_once(spark, "snap_ingest", sf_dir, _ingest)
    table = os.path.join(store, "table")
    n_versions = len(read_manifest(table)["versions"])
    return (
        read_snapshot_log(spark, table)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .withColumn("multi_batch", F.lit(1 if n_versions >= 2 else 0).cast("int"))
        .orderBy("event_type")
    )
