"""Incrementally-maintained materialized rollup (operators/matview.py).

Ground truth is always the one-shot recompute over the union of all
batches — the incremental path must be indistinguishable from it
(exactly for algebraic aggregates; register-identical for the HLL
sketch, hence estimate-identical too).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from articulation_vector_db_api_spark.operators.matview import (
    compact_rollup,
    read_rollup,
    refresh_rollup,
    rollup_partial,
    streaming_rollup_sink,
)

SPECS = [
    {"name": "n_orders", "kind": "count"},
    {"name": "revenue", "kind": "sum", "col": "o_totalprice"},
    {"name": "min_price", "kind": "min", "col": "o_totalprice"},
    {"name": "max_price", "kind": "max", "col": "o_totalprice"},
    {"name": "avg_price", "kind": "avg", "col": "o_totalprice"},
    {"name": "approx_custs", "kind": "approx_distinct", "col": "o_custkey"},
]
KEYS = ["o_orderpriority"]


def _orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


def _oneshot(df):
    """Ground truth: single-batch partial -> finalize via the same
    read path semantics (merge of one partial is identity)."""
    return rollup_partial(df, KEYS, SPECS)


def _batches(df, n=3):
    return [df.filter(F.col("o_orderkey") % n == i) for i in range(n)]


def _as_dict(rows, specs=SPECS):
    return {r[KEYS[0]]: tuple(r[s["name"]] for s in specs) for r in rows}


def test_incremental_refresh_matches_oneshot(spark, tmp_path):
    orders = _orders(spark)
    store = str(tmp_path / "mv")
    for b in _batches(orders):
        refresh_rollup(b, store, KEYS, SPECS)
    got = _as_dict(read_rollup(spark, store, KEYS, SPECS).collect())

    # ground truth: same finalize over a ONE-batch store built from the
    # full table — merging three partials must equal merging one
    full_store = str(tmp_path / "mv_full")
    refresh_rollup(orders, full_store, KEYS, SPECS)
    want = _as_dict(read_rollup(spark, full_store, KEYS, SPECS).collect())
    assert got == want
    # and the plain-aggregate cross-check for the exact kinds
    direct = {
        r.o_orderpriority: (
            r.n, float(r.rev), float(r.mn), float(r.mx), r.av
        )
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_totalprice").alias("rev"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
            (
                F.sum(F.col("o_totalprice").cast("double")) / F.count("o_totalprice")
            ).alias("av"),
        )
        .collect()
    }
    for k, (n, rev, mn, mx, av) in direct.items():
        g = got[k]
        assert g[0] == n
        assert abs(float(g[1]) - rev) < 1e-6
        assert float(g[2]) == mn and float(g[3]) == mx
        assert abs(g[4] - av) < 1e-9


def test_hll_estimate_is_sane(spark, tmp_path):
    orders = _orders(spark)
    store = str(tmp_path / "mv_hll")
    for b in _batches(orders):
        refresh_rollup(b, store, KEYS, SPECS)
    got = read_rollup(spark, store, KEYS, SPECS)
    exact = orders.groupBy(*KEYS).agg(
        F.count_distinct("o_custkey").cast("long").alias("exact")
    )
    joined = got.join(exact, KEYS).select("approx_custs", "exact").collect()
    for r in joined:
        # m=64 registers -> ~13% standard error; assert within 40%
        assert abs(r.approx_custs - r.exact) / r.exact < 0.4


def test_compaction_is_lossless_and_supersedes(spark, tmp_path):
    orders = _orders(spark)
    store = str(tmp_path / "mv_c")
    b1, b2, b3 = _batches(orders)
    refresh_rollup(b1, store, KEYS, SPECS)
    refresh_rollup(b2, store, KEYS, SPECS)
    before = _as_dict(read_rollup(spark, store, KEYS, SPECS).collect())
    compact_rollup(spark, store, KEYS, SPECS)
    # compaction must not change the answer (no double count of the
    # folded partials)
    assert _as_dict(read_rollup(spark, store, KEYS, SPECS).collect()) == before
    # a second compaction folds only the first one — still stable
    compact_rollup(spark, store, KEYS, SPECS)
    assert _as_dict(read_rollup(spark, store, KEYS, SPECS).collect()) == before
    # refresh AFTER compaction folds in on read
    refresh_rollup(b3, store, KEYS, SPECS)
    full_store = str(tmp_path / "mv_c_full")
    refresh_rollup(orders, full_store, KEYS, SPECS)
    assert _as_dict(read_rollup(spark, store, KEYS, SPECS).collect()) == _as_dict(
        read_rollup(spark, full_store, KEYS, SPECS).collect()
    )


def test_refresh_cost_reads_batch_not_history(spark, tmp_path):
    # the refresh plan must scan the incoming batch only: no path of a
    # previously published partial version may appear in it
    orders = _orders(spark)
    store = str(tmp_path / "mv_cost")
    b1, b2, _ = _batches(orders)
    v1 = refresh_rollup(b1, store, KEYS, SPECS)
    plan = rollup_partial(b2, KEYS, SPECS)._jdf.queryExecution().toString()
    assert f"v={v1}" not in plan
    assert "orders.parquet" in plan


def test_time_travel_read_replays_history(spark, tmp_path):
    orders = _orders(spark)
    store = str(tmp_path / "mv_tt")
    b1, b2, b3 = _batches(orders)
    v1 = refresh_rollup(b1, store, KEYS, SPECS)
    v2 = refresh_rollup(b2, store, KEYS, SPECS)
    at_v2 = _as_dict(read_rollup(spark, store, KEYS, SPECS, as_of=v2).collect())
    vc = compact_rollup(spark, store, KEYS, SPECS)
    refresh_rollup(b3, store, KEYS, SPECS)

    # as-of v1: only the first batch
    solo = str(tmp_path / "mv_tt_solo")
    refresh_rollup(b1, solo, KEYS, SPECS)
    assert _as_dict(
        read_rollup(spark, store, KEYS, SPECS, as_of=v1).collect()
    ) == _as_dict(read_rollup(spark, solo, KEYS, SPECS).collect())
    # as-of v2 gives the same answer whether read live (above) or after
    # a later compaction+refresh landed; as-of the compaction too
    assert _as_dict(
        read_rollup(spark, store, KEYS, SPECS, as_of=v2).collect()
    ) == at_v2
    assert _as_dict(
        read_rollup(spark, store, KEYS, SPECS, as_of=vc).collect()
    ) == at_v2
    # unpinned = everything
    full = str(tmp_path / "mv_tt_full")
    refresh_rollup(orders, full, KEYS, SPECS)
    assert _as_dict(read_rollup(spark, store, KEYS, SPECS).collect()) == _as_dict(
        read_rollup(spark, full, KEYS, SPECS).collect()
    )


def test_all_null_distinct_column_counts_zero(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, None), ("b", 3, 7), ("b", 4, None)],
        "k string, v long, c long",
    )
    specs = [
        {"name": "n", "kind": "count"},
        {"name": "d", "kind": "approx_distinct", "col": "c"},
    ]
    store = str(tmp_path / "mv_null")
    refresh_rollup(df, store, ["k"], specs)
    got = {
        r.k: (r.n, r.d) for r in read_rollup(spark, store, ["k"], specs).collect()
    }
    # nulls aren't distinct values (count_distinct semantics): group a
    # has zero, group b has one — and neither group vanishes
    assert got["a"] == (2, 0.0)
    assert got["b"][0] == 2 and abs(got["b"][1] - 1.0) < 0.1
    # the all-null group survives compaction too
    compact_rollup(spark, store, ["k"], specs)
    assert {
        r.k: (r.n, r.d) for r in read_rollup(spark, store, ["k"], specs).collect()
    } == got


def test_streaming_rollup_sink_exactly_once(spark, tmp_path):
    store = str(tmp_path / "mv_stream")
    src = str(tmp_path / "src")
    orders = _orders(spark)
    b1, b2, b3 = _batches(orders)
    b1.write.mode("append").parquet(src)
    specs = SPECS[:2]  # count + sum is enough for the guarantee
    sink = streaming_rollup_sink(store, KEYS, specs)
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    b2.write.mode("append").parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # REPLAY batch 0 manually (at-least-once redelivery): must be a
    # no-op because its batch id is already committed
    sink(b1, 0)

    got = _as_dict(read_rollup(spark, store, KEYS, specs).collect(), specs)
    want_df = b1.unionByName(b2)
    full = str(tmp_path / "mv_stream_full")
    refresh_rollup(want_df, full, KEYS, specs)
    assert got == _as_dict(
        read_rollup(spark, full, KEYS, specs).collect(), specs
    )


def test_registered_query_builder_is_crash_idempotent(spark):
    """A retry after losing the _STORE_COMPLETE marker (crash between
    last refresh and marker write) must not re-append batch partials:
    batch_id-committed batches are skipped, so no group double-counts
    (code-review finding, suites/core.py builder)."""
    import os

    from articulation_vector_db_api_spark.operators.maintenance import (
        read_manifest,
    )
    from articulation_vector_db_api_spark.suites.core import (
        matview_incremental_rollup,
    )
    from articulation_vector_db_api_spark.suites.similarity import (
        _app_scoped_store,
    )

    sf = "/root/testdata/sf0.001"
    first = matview_incremental_rollup(spark, sf).collect()
    store = _app_scoped_store(spark, "matview_rollup", sf)
    os.remove(os.path.join(store, "_STORE_COMPLETE"))
    again = matview_incremental_rollup(spark, sf).collect()
    assert first == again
    man = read_manifest(store)
    batch_versions = [
        v for v in man["versions"].values() if v.get("batch_id") is not None
    ]
    assert len(batch_versions) == 3  # one per batch, retry added none


def test_join_view_time_travel_excludes_later_epochs(spark):
    """matview_join_incremental: 'as of epoch 2' must equal the full
    orders joined against the OLD dim slice only — the delta-rule
    bookkeeping is what makes the historical view well-defined."""
    import json
    import os

    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.operators.matview import read_rollup
    from articulation_vector_db_api_spark.sources.readers import load_table
    from articulation_vector_db_api_spark.suites.core import (
        matview_join_incremental,
    )
    from articulation_vector_db_api_spark.suites.similarity import (
        _app_scoped_store,
    )

    sf = "/root/testdata/sf0.001"
    full = {
        r.c_nationkey: (r.n_orders, r.revenue)
        for r in matview_join_incremental(spark, sf).collect()
    }
    store = _app_scoped_store(spark, "joinview", sf)
    versions = json.load(open(os.path.join(store, "_STORE_COMPLETE")))[
        "versions"
    ]
    keys = ["c_nationkey"]
    specs = [
        {"name": "n_orders", "kind": "count"},
        {"name": "revenue", "kind": "sum", "col": "o_totalprice"},
        {"name": "avg_price", "kind": "avg", "col": "o_totalprice"},
        {"name": "last_date", "kind": "max", "col": "o_orderdate"},
    ]
    asof = {
        r.c_nationkey: (r.n_orders, r.revenue)
        for r in read_rollup(
            spark, store, keys, specs, as_of=versions[1]
        ).collect()
    }
    # independent recompute of epochs 1-2: ALL orders x the old dim
    orders = load_table(spark, sf, "orders")
    b1 = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_nationkey")
    )
    expect = {
        r.c_nationkey: r.n
        for r in orders.join(b1, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {k: v[0] for k, v in asof.items()} == expect
    # and the historical view is strictly smaller than the final one
    assert sum(v[0] for v in asof.values()) < sum(v[0] for v in full.values())
