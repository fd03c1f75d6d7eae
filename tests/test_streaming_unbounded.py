"""The streaming suite's correctness gate replays finite fixtures
(AvailableNow -> batch oracle). This test covers the part a finite
replay can't: the SAME windowed transformation running against a
genuinely unbounded source (rate-micro-batch) under a processing-time
trigger, with results asserted mid-stream while input keeps arriving.

Determinism: rows_per_batch=60, advance_ms=60000 means batch k holds
event times [k min, k+1 min) and values k*60 .. k*60+59, so each
5-minute tumbling window covers exactly 5 batches = 300 rows whose
value sum is an arithmetic series — checkable no matter how many
batches have run when we stop.
"""

from __future__ import annotations

import time

import pytest

from articulation_vector_db_api_spark.streaming.windows import (
    read_unbounded_rate_stream,
)
from articulation_vector_db_api_spark.suites.streaming import tumbling_window_agg

_MIN_BATCHES = 12  # two full 5-minute windows plus a partial third


def test_unbounded_rate_source_tumbling_window(spark):
    ev = read_unbounded_rate_stream(spark)
    agg = tumbling_window_agg(ev)
    q = (
        agg.writeStream.format("memory")
        .queryName("unbounded_tumbling")
        .outputMode("complete")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            lp = q.lastProgress
            if lp is not None and lp["batchId"] >= _MIN_BATCHES:
                break
            time.sleep(0.25)
        else:
            pytest.fail(
                f"unbounded stream did not reach {_MIN_BATCHES} micro-batches"
            )
        # the query is STILL RUNNING — assert on the in-flight state
        assert q.isActive
        rows = sorted(
            spark.table("unbounded_tumbling").collect(),
            key=lambda r: r.window_start,
        )
    finally:
        q.stop()

    # >= 12 batches of 1 minute each -> windows 0 and 1 are complete
    assert len(rows) >= 3
    for k in (0, 1):
        r = rows[k]
        assert r.event_type == "synthetic"
        assert r.n_events == 300
        lo = k * 300
        assert r.total_value == sum(range(lo, lo + 300))
        assert (r.window_end - r.window_start).total_seconds() == 300.0


def test_watermark_append_multi_batch_matches_seal_rule(spark, tmp_path):
    """stream_watermark_append's oracle (emission = windows sealed by
    the final watermark) must hold under REAL multi-batch execution,
    not just a single-drain: stage the events as four time-ordered
    files, rate-limit to one file per micro-batch so the watermark
    advances batch to batch, and the accumulated append output must
    still equal the seal-rule set."""
    import math

    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.sources.readers import (
        SCHEMAS,
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    stage = str(tmp_path / "staged_events")
    for i in range(4):
        chunk = rows[i * n // 4 : (i + 1) * n // 4]
        spark.createDataFrame(chunk, SCHEMAS["events"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stage}/part{i}")

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = q.lastProgress["batchId"] if q.lastProgress else 0
    assert batches >= 3  # rate limit really split the run

    got = {
        (r.window_start, r.n_events)
        for r in spark.table("wm_multibatch").collect()
    }
    # seal rule computed directly from the raw rows
    horizon = max(r.ts for r in rows) - __import__("datetime").timedelta(
        minutes=10
    )
    counts = {}
    for r in rows:
        ws = r.ts.replace(
            minute=(r.ts.minute // 5) * 5, second=0, microsecond=0
        )
        counts[ws] = counts.get(ws, 0) + 1
    want = {
        (ws, c)
        for ws, c in counts.items()
        if ws + __import__("datetime").timedelta(minutes=5) <= horizon
    }
    assert got == want
    assert math.isfinite(len(got)) and len(got) > 0


def test_left_outer_join_multi_batch_matches_seal_rule(spark, tmp_path):
    """stream_stream_left_outer_join's oracle (matches ∪ unmatched
    clicks whose 10-minute window fell behind the final watermark) must
    hold under REAL multi-batch execution: both sides rate-limited to
    one file per micro-batch, watermark advancing batch to batch, state
    evicting (and null-padding) progressively rather than in one drain."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.sources.readers import (
        SCHEMAS,
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    stage = str(tmp_path / "staged_events")
    for i in range(4):
        chunk = rows[i * n // 4 : (i + 1) * n // 4]
        spark.createDataFrame(chunk, SCHEMAS["events"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stage}/part{i}")

    def side(event_type, id_alias, user_alias, ts_alias):
        return (
            spark.readStream.schema(SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stage}/part*")
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user_alias),
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "30 minutes")
        )

    clicks = side("click", "click_id", "c_user", "c_ts")
    purchases = side("purchase", "purchase_id", "p_user", "p_ts")
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
    q = (
        joined.writeStream.format("memory")
        .queryName("lo_join_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert (q.lastProgress["batchId"] if q.lastProgress else 0) >= 3

    got = {
        (r.click_id, r.purchase_id, r.lag_micros)
        for r in spark.table("lo_join_multibatch").collect()
    }

    clicks_raw = [r for r in rows if r.event_type == "click"]
    purch_raw = [r for r in rows if r.event_type == "purchase"]
    horizon = min(
        max(r.ts for r in clicks_raw), max(r.ts for r in purch_raw)
    ) - timedelta(minutes=30)
    want = set()
    for c in clicks_raw:
        matches = [
            p
            for p in purch_raw
            if p.user_id == c.user_id
            and c.ts <= p.ts <= c.ts + timedelta(minutes=10)
        ]
        for p in matches:
            want.add(
                (
                    c.event_id,
                    p.event_id,
                    (p.ts - c.ts) // timedelta(microseconds=1),
                )
            )
        if not matches and c.ts + timedelta(minutes=10) < horizon:
            want.add((c.event_id, None, None))
    assert got == want
    assert any(pid is None for _, pid, _ in got)  # null-padding really fired


def test_windowed_agg_state_recovers_across_restart(spark, tmp_path):
    """Stop a watermarked windowed aggregation mid-stream and restart it
    from the same checkpoint over newly-arrived files: the state store
    must recover, so a window whose events straddle the restart boundary
    emits ONE row with the merged count — and the accumulated append
    output still equals the seal rule over everything ingested."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.sources.readers import (
        SCHEMAS,
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    stage = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")

    def wstart(ts):
        return ts.replace(minute=(ts.minute // 5) * 5, second=0, microsecond=0)

    # restart boundary: nudge off the even split until it lands INSIDE
    # a window (predecessor shares the window), so the boundary window
    # holds events from both incarnations
    mid = next(
        (
            m
            for m in range(n // 2, (3 * n) // 4)
            if wstart(rows[m - 1].ts) == wstart(rows[m].ts)
        ),
        None,
    )
    assert mid is not None, (
        "fixture precondition: no in-window adjacent pair in the third "
        "quartile — pick a different restart boundary"
    )
    bounds = [0, n // 4, mid, (mid + n) // 2, n]

    def land(i):
        spark.createDataFrame(
            rows[bounds[i] : bounds[i + 1]], SCHEMAS["events"]
        ).coalesce(1).write.mode("overwrite").parquet(f"{stage}/part{i}")

    def run_to_completion():
        agg = (
            spark.readStream.schema(SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stage}/part*")
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("window.start").alias("window_start"), "n_events")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(0)
    land(1)
    run_to_completion()  # first incarnation: drains files 0-1, then stops
    land(2)
    land(3)
    run_to_completion()  # second incarnation: SAME checkpoint, new files

    got = {
        (r.window_start, r.n_events)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    horizon = max(r.ts for r in rows) - timedelta(minutes=10)
    counts = {}
    for r in rows:
        ws = r.ts.replace(minute=(r.ts.minute // 5) * 5, second=0, microsecond=0)
        counts[ws] = counts.get(ws, 0) + 1
    want = {
        (ws, c)
        for ws, c in counts.items()
        if ws + timedelta(minutes=5) <= horizon
    }
    assert got == want

    # the boundary window (last pre-restart event's window) must hold
    # events from both incarnations merged by recovered state, and it
    # must appear exactly once in the output
    bws = wstart(rows[mid - 1].ts)
    pre = sum(1 for r in rows[:mid] if wstart(r.ts) == bws)
    post = sum(1 for r in rows[mid:] if wstart(r.ts) == bws)
    assert post > 0, "fixture split must straddle a window for this test"
    emitted = [c for ws, c in got if ws == bws]
    assert emitted == [pre + post]


def test_cdc_apply_multi_batch_changed_only_emission(spark, tmp_path):
    """stream_cdc_apply's two contracts under REAL multi-batch
    execution: (1) the materialized table equals the batch truth no
    matter how the feed batches; (2) a batch that does not beat a
    key's stored (ts, event_id) winner emits NOTHING. Staging the
    files in REVERSE time order makes (2) observable: every user's
    maximal change arrives in their first-seen batch, so later
    batches carry only older events for that user and must be
    silent — exactly one sink row per user."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.sources.readers import (
        SCHEMAS,
        load_table,
    )
    from articulation_vector_db_api_spark.suites.streaming import (
        cdc_apply_transform,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    stage = str(tmp_path / "staged_cdc")
    # part0 = LATEST third ... part2 = earliest third (reverse order)
    thirds = [rows[2 * n // 3 :], rows[n // 3 : 2 * n // 3], rows[: n // 3]]
    for i, chunk in enumerate(thirds):
        spark.createDataFrame(chunk, SCHEMAS["events"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stage}/part{i}")

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    out = cdc_apply_transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cdc_multibatch")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = q.lastProgress["batchId"] if q.lastProgress else 0
    assert batches >= 2  # the rate limit really split the run

    sink = spark.table("cdc_multibatch").collect()

    # batch truth straight from the raw rows (datetime comparison —
    # reconstructing micros via float timestamp() can drift an ulp)
    want = {}
    for r in rows:
        key = r.user_id
        cand = (r.ts, r.event_id)
        if key not in want or cand > (want[key][0], want[key][1]):
            want[key] = (r.ts, r.event_id, r.event_type, r.value)

    # (2) changed-only: exactly one emission per user — later batches
    # held only older events (reverse staging) and stayed silent
    per_user = {}
    for r in sink:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    assert per_user, "sink empty"
    assert all(c == 1 for c in per_user.values()), (
        "a non-improving batch re-emitted a key: "
        f"{ {u: c for u, c in per_user.items() if c > 1} }"
    )
    assert set(per_user) == set(want)

    # (1) the materialized winner per key equals the batch truth
    # (event_id is unique per event, so it pins the winning change)
    got = {r.user_id: (r.last_event_id, r.last_op) for r in sink}
    for u, (_ts, eid, op, _val) in want.items():
        assert got[u] == (eid, op), f"user {u}: {got[u]} != truth ({eid},{op})"
