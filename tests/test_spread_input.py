"""spread_input (sources/readers.py): fan out the single-split local
fixture, but NEVER shuffle an input that already scans as >= core-count
splits (guide §2.4 — at 100 TB the blanket round-robin repartition the
suites used to carry would move the full corpus payload for nothing).
"""

from __future__ import annotations

import os

from articulation_vector_db_api_spark.sources import readers

SF = "/root/testdata/sf0.001"


def test_small_fixture_is_spread(spark):
    df = readers.load_table(spark, SF, "documents").select("doc_id", "text")
    out = readers.spread_input(df, SF, "documents")
    assert out is not df
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == n
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan or "roundrobin" in plan.lower()


def test_large_input_is_not_shuffled(spark):
    """A table at/above defaultParallelism * maxPartitionBytes provably
    scans as >= defaultParallelism file partitions; spread_input must
    return the frame untouched (no round-robin exchange)."""
    path = os.path.join(SF, "documents.parquet")
    df = readers.load_table(spark, SF, "documents").select("doc_id", "text")
    old = readers._TABLE_BYTES.get(path)
    readers._TABLE_BYTES[path] = 100 * (1 << 40)  # simulate a 100 TiB table
    try:
        out = readers.spread_input(df, SF, "documents")
        assert out is df  # the identical object: zero plan change
    finally:
        if old is None:
            readers._TABLE_BYTES.pop(path, None)
        else:
            readers._TABLE_BYTES[path] = old


def test_threshold_uses_session_max_partition_bytes(spark):
    """The decision tracks spark.sql.files.maxPartitionBytes, not a
    constant: raising the split size raises the spread threshold."""
    n = spark.sparkContext.defaultParallelism
    max_split = readers._conf_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    path = os.path.join(SF, "documents.parquet")
    df = readers.load_table(spark, SF, "documents")
    old = readers._TABLE_BYTES.get(path)
    try:
        readers._TABLE_BYTES[path] = n * max_split  # exactly at threshold
        assert readers.spread_input(df, SF, "documents") is df
        readers._TABLE_BYTES[path] = n * max_split - 1  # just below
        assert readers.spread_input(df, SF, "documents") is not df
    finally:
        if old is None:
            readers._TABLE_BYTES.pop(path, None)
        else:
            readers._TABLE_BYTES[path] = old


def test_conf_bytes_parses_suffixed_values():
    assert readers._conf_bytes("134217728") == 134217728
    assert readers._conf_bytes("128m") == 128 * (1 << 20)
    assert readers._conf_bytes("128MB") == 128 * (1 << 20)
    assert readers._conf_bytes("1g") == 1 << 30
