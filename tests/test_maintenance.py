"""Versioned-snapshot (time travel) and compaction operators, plus the
read-side partition-pruning contract for partitioned writes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from articulation_vector_db_api_spark.operators.maintenance import (
    compact_snapshot,
    read_manifest,
    read_snapshot,
    write_snapshot,
)


def test_snapshot_time_travel(spark, tmp_path):
    """Two published versions stay independently readable; the manifest
    flip makes the latest the default."""
    t = str(tmp_path / "tbl")
    v1 = write_snapshot(
        spark.range(0, 100).withColumn("val", F.col("id") * 2), t, note="initial"
    )
    v2 = write_snapshot(
        spark.range(0, 150).withColumn("val", F.col("id") * 3), t, note="restate"
    )
    assert (v1, v2) == (1, 2)
    assert read_snapshot(spark, t).count() == 150  # latest
    old = read_snapshot(spark, t, version=1)
    assert old.count() == 100
    # time travel reads the ORIGINAL values, not the restated ones
    assert old.filter("id = 10").select("val").head()[0] == 20
    assert read_manifest(t)["current"] == 2


def test_snapshot_crash_before_manifest_keeps_previous(spark, tmp_path):
    """A data directory without a manifest flip is invisible: readers
    still get the last published version."""
    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(0, 50), t)
    # simulate a writer that crashed after the data write, before the flip
    spark.range(0, 999).write.mode("overwrite").parquet(os.path.join(t, "v=2"))
    assert read_snapshot(spark, t).count() == 50


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction bin-packs small files into few, as a NEW version —
    the old layout stays readable (rollback-able)."""
    t = str(tmp_path / "tbl")
    fragmented = spark.range(0, 10_000).repartition(64).withColumn(
        "val", F.col("id") % 7
    )
    v1 = write_snapshot(fragmented, t)
    n_before = read_manifest(t)["versions"][str(v1)]["n_files"]
    assert n_before == 64
    v2 = compact_snapshot(spark, t, target_file_bytes=64 * 1024 * 1024)
    n_after = read_manifest(t)["versions"][str(v2)]["n_files"]
    assert n_after < 8
    new = read_snapshot(spark, t)
    assert new.count() == 10_000
    # byte-equal content: same ids, same values
    assert new.agg(F.sum("id"), F.sum("val")).head() == read_snapshot(
        spark, t, version=v1
    ).agg(F.sum("id"), F.sum("val")).head()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must prune at PLANNING time:
    the scan's PartitionFilters carries the predicate and only matching
    directories are listed — the layout contract that makes
    source-scoped queries O(selected partitions) at 100 TB."""
    p = str(tmp_path / "part_tbl")
    df = spark.range(0, 1000).withColumn("bucket", F.col("id") % 10)
    df.write.mode("overwrite").partitionBy("bucket").parquet(p)
    q = spark.read.parquet(p).filter(F.col("bucket") == 3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert q.count() == 100
    # physical proof: the scan reads one directory's files, not ten
    scan_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "isnotnull(bucket" in scan_line or "(bucket" in scan_line


def test_api_admin_endpoints(spark, tmp_path):
    """The snapshots/compact admin endpoints wrap the maintenance
    operators with API-shaped responses."""
    from articulation_vector_db_api_spark.api import EngineAPI

    t = str(tmp_path / "tbl")
    write_snapshot(spark.range(0, 5000).repartition(32), t)
    api = EngineAPI(spark=spark, data_dir=str(tmp_path))
    resp = api.compact(t)
    assert resp["new_version"] == 2 and resp["n_files"] < 8
    snaps = api.snapshots(t)
    assert snaps["current"] == 2 and set(snaps["versions"]) == {"1", "2"}


def test_concurrent_writers_claim_distinct_versions(spark, tmp_path):
    """Two writers racing for the next version must land in DISTINCT
    version directories, and the second manifest flip must preserve the
    first writer's entry (merge-then-flip). Simulated by interleaving:
    writer A reads the table state, writer B commits first, then A
    commits — with a naive read-increment protocol both would publish
    v=2 and A's data write would clobber B's."""
    import os

    from articulation_vector_db_api_spark.operators.maintenance import (
        read_manifest,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path / "occ_table")
    write_snapshot(spark.range(0, 10).selectExpr("id AS a"), table, note="base")

    # writer A peeks at the state (simulating its pre-commit read)...
    peeked = int(read_manifest(table)["current"]) + 1
    # ...writer B wins the race and publishes first
    vb = write_snapshot(spark.range(0, 20).selectExpr("id AS a"), table, note="B")
    assert vb == peeked  # B took the version A expected
    # writer A now commits; the mkdir claim must push it PAST B
    va = write_snapshot(spark.range(0, 30).selectExpr("id AS a"), table, note="A")
    assert va == vb + 1

    man = read_manifest(table)
    assert int(man["current"]) == va
    # B's entry survived A's flip, and both datasets are intact
    assert man["versions"][str(vb)]["note"] == "B"
    assert read_snapshot(spark, table, vb).count() == 20
    assert read_snapshot(spark, table, va).count() == 30
    assert os.path.isdir(os.path.join(table, f"v={vb}"))


def test_truly_concurrent_writers_all_commit(spark, tmp_path):
    """Eight writers committing SIMULTANEOUSLY (threads, no
    serialization points) must produce eight distinct versions, a
    manifest containing every entry, and current == max — exercising
    the atomic rename claim and the manifest lock under a real race,
    not an interleaved replay."""
    import threading

    table = str(tmp_path / "occ_parallel")
    write_snapshot(spark.range(0, 5).selectExpr("id AS a"), table, note="base")

    n = 8
    results, errors = [], []
    barrier = threading.Barrier(n)

    def commit(i: int) -> None:
        try:
            df = spark.range(0, 10 + i).selectExpr("id AS a")
            barrier.wait()
            results.append(write_snapshot(df, table, note=f"w{i}"))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert sorted(results) == list(range(2, 2 + n))  # distinct versions
    man = read_manifest(table)
    assert int(man["current"]) == 1 + n
    assert set(man["versions"]) == {str(v) for v in range(1, 2 + n)}
    notes = {man["versions"][str(v)]["note"] for v in results}
    assert notes == {f"w{i}" for i in range(n)}
    for v in results:
        assert read_snapshot(spark, table, v).count() >= 10
    # no leftover temp dirs; the lock FILE is permanent by design
    # (flock excludes on the inode; unlink-on-release would reopen the
    # two-holder race) but must be RELEASED — a non-blocking flock from
    # this process must succeed immediately
    leftovers = [f for f in os.listdir(table) if f.startswith(".tmp-")]
    assert leftovers == []
    import fcntl

    fd = os.open(os.path.join(table, ".manifest.lock"), os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)  # must not raise
        fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)


def test_streaming_exactly_once_snapshot_ingest(spark, tmp_path):
    """A checkpointed stream commits micro-batches into the versioned
    table through the idempotent foreachBatch sink: every batch lands
    exactly once (a simulated re-delivery is a no-op), the accumulated
    log equals the full input, and each batch stays time-travelable."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.operators.maintenance import (
        read_snapshot_log,
        streaming_snapshot_sink,
    )

    table = str(tmp_path / "stream_table")
    src = str(tmp_path / "src")
    base = spark.range(0, 100).withColumn("val", F.col("id") * 2)
    base.filter("id < 60").write.parquet(src + "/f0")
    base.filter("id >= 60").write.parquet(src + "/f1")

    sink = streaming_snapshot_sink(table)
    q = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(lambda df, bid: sink(df, bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    man = read_manifest(table)
    batch_ids = [v["batch_id"] for v in man["versions"].values()]
    n_batches = len(batch_ids)  # one per source FILE (maxFilesPerTrigger=1)
    assert n_batches >= 2 and sorted(batch_ids) == list(range(n_batches))
    assert read_snapshot_log(spark, table).count() == 100
    # each micro-batch is its own time-travelable version; together they
    # partition the input exactly
    per_version = [
        read_snapshot(spark, table, int(v)).count() for v in man["versions"]
    ]
    assert sum(per_version) == 100  # empty part-files make empty batches

    # simulate the at-least-once re-delivery of the last batch: the
    # idempotent sink must NOT create a third version
    last_bid = max(batch_ids)
    sink(base.filter("id >= 60"), last_bid)
    man2 = read_manifest(table)
    assert len(man2["versions"]) == n_batches
    assert read_snapshot_log(spark, table).count() == 100
    # a genuinely NEW batch still commits
    sink(base.filter("id < 0"), last_bid + 1)
    assert len(read_manifest(table)["versions"]) == n_batches + 1


def test_snapshot_schema_evolution(spark, tmp_path):
    """Schema evolution across versions: a later snapshot may add
    columns; pinned reads see each version's own schema, and the
    accumulated log read merges schemas (old rows null-fill the new
    column) — the add-column evolution contract of a real table
    format, over plain parquet versions."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.operators.maintenance import (
        read_snapshot_log,
    )

    t = str(tmp_path / "evolve")
    v1 = write_snapshot(spark.range(0, 10).selectExpr("id AS a"), t)
    v2 = write_snapshot(
        spark.range(10, 15).selectExpr("id AS a", "id * 2 AS b"), t
    )
    assert read_snapshot(spark, t, v1).columns == ["a"]
    assert read_snapshot(spark, t, v2).columns == ["a", "b"]
    # merged log: old rows null-fill b
    log = read_snapshot_log(spark, t, merge_schema=True)
    assert set(log.columns) == {"a", "b"}
    assert log.count() == 15
    assert log.filter(F.col("b").isNull()).count() == 10
    assert log.filter("b = 28").count() == 1  # a=14 carries b


def test_side_effectful_builders_rebuild_after_partial_build(spark):
    """The compaction-roundtrip and schema-evolution builders are
    all-or-nothing: a store without its completion marker (a build
    killed partway) is wiped and rebuilt, so retries can never
    double-count an epoch or hardcode a version number that a crashed
    write_snapshot skipped."""
    import json
    import os

    from articulation_vector_db_api_spark.registry import load_all
    from articulation_vector_db_api_spark.suites.similarity import (
        _app_scoped_store,
    )

    sf = "/root/testdata/sf0.001"
    reg = load_all()
    for qname, prefix in [
        ("maintenance_compact_roundtrip", "compactrt"),
        ("scan_schema_evolution_log", "schemaevo"),
    ]:
        first = reg[qname].fn(spark, sf).collect()
        path = _app_scoped_store(spark, prefix, sf)
        marker = os.path.join(path, "_STORE_COMPLETE")
        assert os.path.exists(marker), f"{qname} left no completion marker"
        with open(marker) as f:
            payload = json.load(f)  # _build_once persists the builder's facts
        # simulate a partial build: marker missing, stale state present
        os.remove(marker)
        again = reg[qname].fn(spark, sf).collect()
        assert again == first, f"{qname} changed results after rebuild"
        assert os.path.exists(marker)
        with open(marker) as f:
            assert json.load(f) == payload, f"{qname} rebuild changed payload"


def test_vacuum_snapshots_retention(spark, tmp_path):
    """vacuum_snapshots retires all but keep_last versions: manifest
    entries removed first, data dirs deleted after, current and
    retained time travel intact, and re-vacuum is a no-op."""
    import os

    from articulation_vector_db_api_spark.operators.maintenance import (
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    table = str(tmp_path / "vac_table")
    base = spark.range(0, 40)
    for k in (10, 20, 30, 40):
        write_snapshot(base.filter(base.id < k), table, note=f"up to {k}")

    retired = vacuum_snapshots(table, keep_last=2)
    assert retired == [1, 2]
    man = read_manifest(table)
    assert sorted(int(v) for v in man["versions"]) == [3, 4]
    assert int(man["current"]) == 4
    # retired data dirs are gone; retained versions stay readable
    assert not os.path.exists(os.path.join(table, "v=1"))
    assert not os.path.exists(os.path.join(table, "v=2"))
    assert read_snapshot(spark, table).count() == 40  # current = v4
    assert read_snapshot(spark, table, version=3).count() == 30
    # re-vacuum with the same retention is a no-op
    assert vacuum_snapshots(table, keep_last=2) == []
    # retired versions are rejected explicitly, not read as empty
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_snapshot(spark, table, version=1)


def test_vacuum_rejects_non_positive_retention(spark, tmp_path):
    """keep_last=0 would retire the current version (dangling
    manifest); negatives invert the retention slice — both rejected."""
    import pytest as _pytest

    from articulation_vector_db_api_spark.operators.maintenance import (
        vacuum_snapshots,
        write_snapshot,
    )

    table = str(tmp_path / "vac_guard")
    write_snapshot(spark.range(3), table)
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="keep_last"):
            vacuum_snapshots(table, keep_last=bad)
    assert read_manifest(table)["versions"]  # untouched


def test_vacuum_refuses_batch_stamped_log_versions(spark, tmp_path):
    """An accumulated snapshot log's old versions ARE table content
    (streaming_snapshot_sink stamps them with batch_id) — vacuum must
    refuse to retire them unless force=True, and the refusal must
    leave manifest and data untouched."""
    import os

    import pytest as _pytest

    from articulation_vector_db_api_spark.operators.maintenance import (
        vacuum_snapshots,
        write_snapshot,
    )

    table = str(tmp_path / "vac_log")
    # a log table: three batch-stamped versions + one plain snapshot
    for b in range(3):
        write_snapshot(
            spark.range(b * 10, b * 10 + 10), table,
            note=f"stream batch {b}", batch_id=b,
        )
    write_snapshot(spark.range(100), table, note="compacted fold")

    with _pytest.raises(ValueError, match="batch-stamped"):
        vacuum_snapshots(table, keep_last=1)
    man = read_manifest(table)
    assert sorted(int(v) for v in man["versions"]) == [1, 2, 3, 4]
    assert os.path.exists(os.path.join(table, "v=1"))

    # after an explicit fold, force=True is the sanctioned path
    retired = vacuum_snapshots(table, keep_last=1, force=True)
    assert retired == [1, 2, 3]
    man = read_manifest(table)
    assert sorted(int(v) for v in man["versions"]) == [4]
    # a plain-snapshot table (no batch_id anywhere) needs no force
    plain = str(tmp_path / "vac_plain")
    for k in (1, 2, 3):
        write_snapshot(spark.range(k), plain)
    assert vacuum_snapshots(plain, keep_last=2) == [1]

    # force on a NEVER-compacted log is refused: every retained version
    # is still batch-stamped, so the retired rows live nowhere else
    raw = str(tmp_path / "vac_raw_log")
    for b in range(3):
        write_snapshot(
            spark.range(b * 10, b * 10 + 10), raw,
            note=f"stream batch {b}", batch_id=b,
        )
    with _pytest.raises(ValueError, match="never-compacted"):
        vacuum_snapshots(raw, keep_last=1, force=True)
    assert sorted(int(v) for v in read_manifest(raw)["versions"]) == [1, 2, 3]
