"""Scale-pattern tests: the storage-level techniques SCALE.md commits
to — bucketed co-located joins (shuffle elision) and incremental
streaming sinks."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_bucketed_join_elides_shuffle(spark):
    """Both sides bucketed+sorted on the join key → SortMergeJoin with
    NO Exchange: the 100 TB fact⋈fact strategy (shuffle happens once at
    write time, every subsequent join is free)."""
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"fact_a_{suffix}", f"fact_b_{suffix}"
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    try:
        for name, df in [(ta, a), (tb, b)]:
            (
                df.write.mode("overwrite")
                .bucketBy(8, "k")
                .sortBy("k")
                .format("parquet")
                .saveAsTable(name)
            )
        # hint forces SMJ (at real scale neither side broadcasts anyway)
        joined = spark.table(ta).hint("merge").join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 10000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_aqe_skew_join_splits_hot_key(spark):
    """AQE's runtime skew-join handling: with one pathological key and
    skew thresholds scaled to fixture size, the final adaptive plan
    must mark the sort-merge join skew-handled (`isSkewJoin=true` /
    `skew=true`) — validating the config path SCALE.md relies on."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",  # 90% on key 0
            "id AS v",
        )
        right = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS w")
        joined = left.join(right, "k")
        # execute THIS plan so AQE finalizes it, then inspect the final plan
        # (hot key 0: 180k rows × 1 match; cold keys ids ≡9 (mod 10) < 100 → 10)
        assert len(joined.collect()) == 180_010
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkewJoin=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_streaming_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: the streaming-upsert pattern (each micro-batch
    runs an arbitrary batch write — partitioned overwrite, MERGE, ...)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame(
        [(i, f"u{i % 3}") for i in range(100)], "id long, user string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    out = str(tmp_path / "stream_out")
    stream = spark.readStream.schema("id long, user string").parquet(str(src))
    agg = stream.groupBy("user").agg(F.count(F.lit(1)).alias("n"))

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = {r.user: r.n for r in spark.read.parquet(out).collect()}
    assert result == {"u0": 34, "u1": 33, "u2": 33}


def test_dynamic_partition_pruning(spark, tmp_path):
    """Dynamic partition pruning: joining a partitioned fact with a
    filtered dimension injects the dim's qualifying keys as a runtime
    partition filter on the fact scan (`dynamicpruning`). At 100 TB a
    date-partitioned fact table reads only the partitions the dimension
    filter selects — without the user repeating the filter on the fact."""
    fact_path = str(tmp_path / "fact_part")
    spark.range(0, 100_000).selectExpr(
        "id % 20 AS part_k", "id AS v"
    ).write.mode("overwrite").partitionBy("part_k").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.range(0, 20).selectExpr("id AS part_k", "id % 5 AS grp")
    joined = fact.join(dim.filter("grp = 0"), "part_k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # 4 of 20 partitions survive → 4/20 of the fact rows
    assert joined.count() == 20_000


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    """Runtime row-level filtering: a selective predicate on the build
    side of a shuffle join makes Catalyst inject `bloom_filter_agg` on
    the build side and `might_contain` into the probe-side scan filter
    — at 100 TB the probe scan drops non-matching rows before the
    shuffle instead of shuffling the full fact table."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 500_000).selectExpr("id % 50000 AS k", "id AS v")
        small = spark.range(0, 50_000).selectExpr(
            "id AS k", "id * 2 AS w", "id % 97 AS f"
        )
        big.write.mode("overwrite").parquet(str(tmp_path / "big"))
        small.write.mode("overwrite").parquet(str(tmp_path / "small"))
        b = spark.read.parquet(str(tmp_path / "big"))
        s = spark.read.parquet(str(tmp_path / "small")).filter("f = 3")
        joined = b.join(s, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        # ~516 build keys of 50k → probe keeps ~1/97th of its rows
        assert joined.count() == 5160
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ntile_prefix_sum_decomposition_matches_builtin(spark):
    """agg_equidepth_histogram rebuilds ntile(k) from a two-pass prefix
    sum (pre-bucket rank + broadcast offsets) instead of a partition-
    less global sort. Property: for adversarial value distributions —
    duplicates, skew, n not divisible by k — the decomposed bucket
    assignment floor((r-1)*k/n)+1 must equal F.ntile over the same
    total order."""
    import random

    from pyspark.sql.window import Window

    rng = random.Random(7)
    rows = [
        # heavy duplicate block, a skewed tail, and unique fillers
        *[(100.0, i) for i in range(17)],
        *[(float(rng.randint(0, 5)), 100 + i) for i in range(23)],
        *[(rng.random() * 1e6, 200 + i) for i in range(13)],
    ]
    df = spark.createDataFrame(rows, ["v", "k"])
    k = 10
    n = len(rows)

    builtin = df.select(
        "v", "k", F.ntile(k).over(Window.orderBy("v", "k")).alias("bucket")
    )

    # decomposition under test: equi-width pre-buckets on v
    n_pre = 8
    rng_row = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    pre = df.crossJoin(F.broadcast(rng_row)).withColumn(
        "pb",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_pre - 1),
                F.floor(
                    (F.col("v") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / n_pre)
                ).cast("int"),
            )
        ),
    )
    wb = Window.partitionBy("pb").orderBy("v", "k")
    ranked = pre.withColumn("rn", F.row_number().over(wb))
    counts = pre.groupBy("pb").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(wo), F.lit(0))
    ).select("pb", "off")
    r0 = F.col("off") + F.col("rn") - 1  # 0-based global rank
    s, q = n // k, n % k
    cut = q * (s + 1)
    bucket = (
        F.when(r0 < cut, F.floor(r0 / (s + 1)))
        .otherwise(q + F.floor((r0 - cut) / max(s, 1)))
        .cast("int")
        + 1
    )
    decomposed = ranked.join(F.broadcast(offsets), "pb").select(
        "v", "k", bucket.alias("bucket")
    )

    lhs = {(r.v, r.k): r.bucket for r in builtin.collect()}
    rhs = {(r.v, r.k): r.bucket for r in decomposed.collect()}
    assert lhs == rhs


def test_peak_concurrency_day_sweep_matches_global_sweep(spark):
    """events_peak_concurrency decomposes the +1/-1 boundary sweep into
    per-day partitions with carried offsets. Property: for random
    interval sets that straddle midnights (including multi-day spans
    and days consisting only of carried-over ends), the decomposition
    must equal the naive single-partition running sum."""
    import datetime as dt
    import random

    from pyspark.sql.window import Window

    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(400):
        start = base + dt.timedelta(
            minutes=rng.randint(0, 5 * 24 * 60)  # 5-day span
        )
        dur = rng.choice([1, 30, 90, 60 * 26])  # includes >1-day spans
        rows.append((start, start + dt.timedelta(minutes=dur)))
    df = spark.createDataFrame(rows, ["t0", "t1"])

    starts = df.select(F.col("t0").alias("t"), F.lit(1).alias("delta"))
    ends = df.select(F.col("t1").alias("t"), F.lit(-1).alias("delta"))
    deltas = starts.unionByName(ends)

    # naive global sweep (ground truth)
    w_global = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    truth = (
        deltas.select("t", "delta", F.sum("delta").over(w_global).alias("c"))
        .groupBy(F.col("t").cast("date").alias("day"))
        .agg(F.max("c").alias("peak"))
    )

    # decomposition under test (same topology as the registered query)
    dd = deltas.withColumn("day", F.col("t").cast("date"))
    wd = Window.partitionBy("day").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = dd.withColumn("local_run", F.sum("delta").over(wd))
    day_totals = dd.groupBy("day").agg(F.sum("delta").alias("day_total"))
    wo = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = day_totals.withColumn(
        "off", F.coalesce(F.sum("day_total").over(wo), F.lit(0))
    ).select("day", "off")
    got = (
        local.join(F.broadcast(offsets), "day")
        .groupBy("day")
        .agg(F.max(F.col("off") + F.col("local_run")).alias("peak"))
    )

    lhs = {r.day: r.peak for r in truth.collect()}
    rhs = {r.day: r.peak for r in got.collect()}
    assert lhs == rhs


def test_null_aware_anti_join_tristate_semantics(spark):
    """`join_null_aware_anti`'s operator pin: single-column NOT IN must
    plan as a null-aware anti join (the flag formatted explain hides),
    and the tri-state semantics must hold — one NULL in the inner list
    empties the result, which a plain LeftAnti rewrite would get wrong."""
    left = spark.range(0, 100).select(F.col("id").alias("k"))
    left.createOrReplaceTempView("naaj_left")
    spark.range(0, 50).select(
        F.when(F.col("id") >= 0, F.col("id")).alias("k")  # nullable type, no NULLs
    ).createOrReplaceTempView("naaj_inner_clean")
    spark.range(0, 50).select(
        F.when(F.col("id") > 0, F.col("id")).alias("k")  # id=0 -> actual NULL
    ).createOrReplaceTempView("naaj_inner_nulled")

    clean = spark.sql("SELECT k FROM naaj_left WHERE k NOT IN (SELECT k FROM naaj_inner_clean)")
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight, true" in plan, f"NOT IN lost null-awareness:\n{plan}"
    assert clean.count() == 50  # 50..99

    nulled = spark.sql("SELECT k FROM naaj_left WHERE k NOT IN (SELECT k FROM naaj_inner_nulled)")
    assert nulled.count() == 0  # one NULL in the list -> nothing passes
