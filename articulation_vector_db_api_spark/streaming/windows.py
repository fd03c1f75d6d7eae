"""Structured Streaming operators over the events stream.

The reference has no streaming surface at all (SURVEY §2.2); the
engine provides the standard event-time toolkit: tumbling / sliding /
session windows, watermarked late-data handling, and streaming dedup.

Execution contract: sources are ``readStream`` file sources; tests and
the correctness gate drive them with ``Trigger.AvailableNow`` into a
memory sink, so every streaming query has a batch-equivalent oracle
(the same SQL DuckDB runs). In production the identical plan runs
against a continuous source (Kafka/files) with checkpointing — event
shape, state keys and watermarks don't change.

Scale: state is keyed by (window/session, group key) and lives in the
state store, hash-partitioned on the group key — watermarks bound its
growth; ``spark.sql.shuffle.partitions`` sizes state-store parallelism.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import SCHEMAS

_run_counter = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table (same declared schema as the
    batch reader).

    The file stream source monitors a DIRECTORY; the fixture is a bare
    parquet file, so stage a symlink under an engine-owned temp dir —
    in production this is simply the landing directory new files arrive
    into."""
    stage = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp",
        "streams",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    try:
        os.symlink(src, link)
    except FileExistsError:  # concurrent session staged it first
        pass
    return spark.readStream.schema(SCHEMAS["events"]).parquet(stage)


def read_unbounded_rate_stream(
    spark: SparkSession, rows_per_batch: int = 60, advance_ms: int = 60_000
) -> DataFrame:
    """Genuinely UNBOUNDED events-shaped stream (``rate-micro-batch``
    source): every micro-batch synthesizes ``rows_per_batch`` rows and
    advances event time by ``advance_ms`` — there is no end-of-input,
    so a query over it must run under a processing-time trigger with
    incremental state, exactly like a Kafka topic.

    The file-replay sources above verify RESULTS (AvailableNow drains
    a finite fixture, so a batch oracle exists); this source verifies
    RUNTIME BEHAVIOR — that the same transformations emit correct
    windows while input keeps arriving. Columns are mapped to the
    events shape (ts, event_type, user_id, value), with ``value`` the
    global row number: deterministic, so a window's expected aggregate
    is an arithmetic series regardless of when the query is stopped."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", advance_ms)
        .load()
    )
    return raw.select(
        F.col("timestamp").alias("ts"),
        F.lit("synthetic").alias("event_type"),
        (F.col("value") % 7).cast("string").alias("user_id"),
        F.col("value").cast("double").alias("value"),
    )


def run_available_now(
    df: DataFrame, name: str, mode: str, state_partitions: int = 8
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into
    a memory sink and return the result table.

    ``state_partitions`` pins the state-store count for this query (the
    streaming twin of shuffle.partitions, frozen at first start): a
    fixture-sized stream doesn't amortize 32 store instances; a
    production stream sizes this to keyspace × throughput."""
    spark = df.sparkSession
    qname = f"{name}_{next(_run_counter)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the documents table (same staged-directory
    contract as read_events_stream): the landing directory a corpus
    crawler drops new document files into."""
    stage = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp",
        "streams",
        "docs_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    src = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    try:
        os.symlink(src, link)
    except FileExistsError:  # concurrent session staged it first
        pass
    return spark.readStream.schema(SCHEMAS["documents"]).parquet(stage)
