"""Spark-4 Python Data Source: batch read with pushdown pruning,
streaming replay read, and two-phase-commit write.

The reference has exactly one ingest shape (a PDF directory,
/root/reference/main.py:258-311); this is the engine's extension point
for every source/sink Spark lacks a built-in for. The synthetic source
is closed-form (sources/pyds.py:synth_row), so every test recomputes
the expected table exactly in Python.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from articulation_vector_db_api_spark.sources.pyds import (
    _FileCommit,
    _ManifestJsonStreamWriter,
    manifest_files,
    register_synth_source,
    stream_manifest_files,
    synth_row,
)


@pytest.fixture()
def synth(spark):
    register_synth_source(spark)
    return spark


def test_batch_read_matches_closed_form(synth):
    df = synth.read.format("synth_events").option("n", 300).option("parts", 4).load()
    got = sorted((r.id, r.category, r.val) for r in df.collect())
    assert got == [synth_row(i) for i in range(300)]
    # partitioning is declared by the reader: one task per range split
    assert df.rdd.getNumPartitions() == 4


def test_pushdown_prunes_partitions_before_launch(synth):
    base = synth.read.format("synth_events").option("n", 1000).option("parts", 8)
    narrow = base.load().filter((F.col("id") >= 900) & (F.col("id") < 950))
    got = sorted((r.id, r.category, r.val) for r in narrow.collect())
    assert got == [synth_row(i) for i in range(900, 950)]
    # the load-bearing claim: the scan's planned range is the FILTERED
    # one, not [0, 1000) — a 2-id pushed range plans ceil-split tasks of
    # that range (2 single-id tasks), not the declared 8 over the corpus
    one = base.load().filter((F.col("id") >= 10) & (F.col("id") < 12))
    assert one.rdd.getNumPartitions() == 2 < 8
    assert sorted(r.id for r in one.collect()) == [10, 11]


def test_unsupported_filters_still_apply_above_scan(synth):
    # category is NOT pushable: the reader hands it back and Spark must
    # evaluate it post-scan — pushdown is an optimization, never a
    # semantics change
    df = (
        synth.read.format("synth_events")
        .option("n", 100)
        .load()
        .filter((F.col("category") == "A") & (F.col("id") < 50))
    )
    got = sorted(r.id for r in df.collect())
    assert got == [i for i in range(50) if i % 5 == 0]


def test_empty_pushed_range_is_valid_empty_scan(synth):
    df = (
        synth.read.format("synth_events")
        .option("n", 100)
        .load()
        .filter((F.col("id") >= 90) & (F.col("id") < 10))
    )
    assert df.count() == 0


def test_stream_read_replays_exactly_once(synth, tmp_path):
    q = (
        synth.readStream.format("synth_events")
        .option("n", 90)
        .option("batch_rows", 40)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if synth.sql("SELECT count(*) c FROM synth_stream").first().c == 90:
                break
            time.sleep(0.5)
        rows = synth.sql("SELECT * FROM synth_stream").collect()
    finally:
        q.stop()
    # all 90 rows, each exactly once, across ceil(90/40)=3 micro-batches
    assert sorted((r.id, r.category, r.val) for r in rows) == [
        synth_row(i) for i in range(90)
    ]


def test_writer_commits_manifest_atomically(synth, tmp_path):
    out = str(tmp_path / "sink")
    df = synth.read.format("synth_events").option("n", 200).option("parts", 4).load()
    df.write.format("synth_events").mode("append").option("path", out).save()

    # a stray part file (crashed concurrent writer) must stay invisible
    with open(os.path.join(out, "part-deadbeef.jsonl"), "w") as f:
        f.write(json.dumps({"id": 10**9, "category": "Z", "val": -1}) + "\n")

    files = manifest_files(out)
    assert len(files) == 4  # one committed file per write task
    back = synth.read.schema("id BIGINT, category STRING, val BIGINT").json(files)
    got = sorted((r.id, r.category, r.val) for r in back.collect())
    assert got == [synth_row(i) for i in range(200)]


def test_stream_write_end_to_end_exactly_once(synth, tmp_path):
    # stream READ (offset replay) piped into stream WRITE (batch-keyed
    # manifest): the full custom-connector round trip, no built-in sink
    out = str(tmp_path / "stream_sink")
    q = (
        synth.readStream.format("synth_events")
        .option("n", 60)
        .option("batch_rows", 25)
        .load()
        .writeStream.format("synth_events")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                files = stream_manifest_files(out)
                back = synth.read.schema(
                    "id BIGINT, category STRING, val BIGINT"
                ).json(files)
                if back.count() == 60:
                    break
            except FileNotFoundError:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    files = stream_manifest_files(out)
    back = synth.read.schema("id BIGINT, category STRING, val BIGINT").json(files)
    assert sorted((r.id, r.category, r.val) for r in back.collect()) == [
        synth_row(i) for i in range(60)
    ]


def test_stream_writer_batch_replay_is_idempotent(tmp_path):
    # a crash-replayed micro-batch must REPLACE its manifest entry, not
    # append a duplicate — the commit is keyed by batch id
    out = str(tmp_path / "replay_sink")
    os.makedirs(out)
    w = _ManifestJsonStreamWriter({"path": out})
    w.commit([_FileCommit(filename="part-a.jsonl", rows=3)], batchId=7)
    w.commit([_FileCommit(filename="part-b.jsonl", rows=3)], batchId=7)  # replay
    with open(os.path.join(out, "_manifest.json")) as f:
        batches = json.load(f)["batches"]
    assert batches == {"7": ["part-b.jsonl"]}


def test_writer_append_accumulates_overwrite_resets(synth, tmp_path):
    out = str(tmp_path / "sink2")
    d1 = synth.read.format("synth_events").option("n", 50).option("parts", 2).load()
    d1.write.format("synth_events").mode("append").option("path", out).save()
    d1.write.format("synth_events").mode("append").option("path", out).save()
    assert len(manifest_files(out)) == 4  # both appends committed

    d1.write.format("synth_events").mode("overwrite").option("path", out).save()
    files = manifest_files(out)
    assert len(files) == 2  # manifest reset to the overwrite's files
    back = synth.read.schema("id BIGINT, category STRING, val BIGINT").json(files)
    assert back.count() == 50
