"""RocksDB state store parity — the 100 TB streaming-state lever.

The default HDFSBackedStateStoreProvider keeps every key's state in
executor HEAP; at production state sizes (stream-stream joins over
days, dedup sets over a corpus) that is an OOM, and the deployment
answer is the RocksDB provider (state on local disk, changelog
checkpointing for fast commits). These tests prove the engine's
stateful queries are provider-agnostic: the SAME transformations
produce IDENTICAL results under RocksDB + changelog checkpointing as
under the default store, so flipping the provider at deployment is a
config change, not a migration.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": _ROCKS,
    "spark.sql.streaming.stateStore.rocksdb."
    "changelogCheckpointing.enabled": "true",
}


def _run(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(180)
    if not finished:
        q.stop()
        raise AssertionError(f"streaming query {name} timed out")
    return sorted(
        (tuple(r) for r in spark.table(name).collect()), key=str
    )


@pytest.fixture()
def rocks_conf(spark):
    old = {
        k: spark.conf.get(k, None) for k in _CONFS
    }
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_windowed_agg_identical_under_rocksdb(rocks_conf):
    """Stateful windowed aggregation: RocksDB-backed state produces
    the exact rows the heap-backed default does."""
    spark = rocks_conf
    from articulation_vector_db_api_spark.streaming.windows import (
        read_events_stream,
    )
    from articulation_vector_db_api_spark.suites.streaming import (
        tumbling_window_agg,
    )

    rocks = _run(
        spark, tumbling_window_agg(read_events_stream(spark, SF_SMALL)),
        "rocks_tumbling",
    )
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == _ROCKS
    )
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    default = _run(
        spark, tumbling_window_agg(read_events_stream(spark, SF_SMALL)),
        "heap_tumbling",
    )
    assert rocks == default and len(rocks) > 0


def test_streaming_dedup_identical_under_rocksdb(rocks_conf):
    """StreamingDeduplicate keyed state — the shape whose state grows
    with distinct keys, i.e. the first thing to OOM a heap store —
    under RocksDB + changelog checkpointing."""
    spark = rocks_conf
    from articulation_vector_db_api_spark.streaming.windows import (
        read_events_stream,
    )
    from articulation_vector_db_api_spark.suites.streaming import (
        dedup_count_transform,
    )

    rocks = _run(
        spark, dedup_count_transform(read_events_stream(spark, SF_SMALL)),
        "rocks_dedup",
    )
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    default = _run(
        spark, dedup_count_transform(read_events_stream(spark, SF_SMALL)),
        "heap_dedup",
    )
    assert rocks == default and len(rocks) > 0
