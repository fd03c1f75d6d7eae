"""Custom Python Data Source (Spark 4 DataSource API).

The reference ingests exactly one source shape — a directory of PDFs
(/root/reference/main.py:258-311). A production engine also needs the
escape hatch for sources Spark has no built-in reader for (internal
feed APIs, proprietary formats, synthetic load generators). Spark 4's
Python Data Source API is that extension point: a pure-Python
``DataSource`` + ``DataSourceReader`` pair that declares its schema and
its *partitioning*, so the scan is planned like any other — each
``InputPartition`` becomes one Spark task, rows cross into the JVM as
Arrow batches, and downstream filters/aggregates run JVM-side.

``SyntheticEventsDataSource`` here is a deterministic generator (a
stand-in for e.g. a feed-replay connector): ``n`` rows split over
``parts`` range partitions; every field is a closed-form function of
the row id, so a SQL oracle can recompute the exact table and verify
the whole source path — partition planning, Python-side generation,
Arrow transfer, typing.

Scale note: partition count is declared by the reader (``parts``
tasks), so a 100 TB-scale replay parallelizes across executors exactly
like a parquet scan; the generator itself is O(rows/parts) per task
with no driver materialization.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_SCHEMA = "id BIGINT, category STRING, val BIGINT"


def synth_row(i: int) -> tuple[int, str, int]:
    """Closed-form row: category cycles A..E, val = (i*i) mod 997.

    Kept as a module-level function so the DuckDB oracle can mirror it
    symbolically: chr(65 + i % 5), (i*i) % 997.
    """
    return (i, chr(65 + i % 5), (i * i) % 997)


class _SynthReader(DataSourceReader):
    """Range-partitioned generator with REAL predicate pushdown.

    ``pushFilters`` narrows the generated ``[lo, hi)`` id range for the
    comparison filters Spark offers on ``id`` — and because
    ``partitions()`` is planned AFTER pushdown, a pushed ``id >= X``
    prunes whole partitions before any task launches (the Python-source
    analog of parquet min/max partition pruning; the scale story is
    identical: task count follows the SELECTED range, not the corpus).
    Filters on other columns are returned to Spark un-consumed, so
    Catalyst re-applies them above the scan — pushdown here is an
    optimization, never a semantics change.
    """

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        # eager list, not a generator: the range mutations must all land
        # before Spark plans partitions(), regardless of when (or how
        # far) the caller iterates the returned unsupported-filter set
        unsupported = []
        for f in filters:
            # attribute is a column-path tuple, e.g. ("id",)
            if getattr(f, "attribute", None) == ("id",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, v + 1)
                # fully handled: do NOT hand it back to Spark
            else:
                unsupported.append(f)  # Spark evaluates it post-scan
        return unsupported

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [InputPartition((0, 0))]  # empty but valid plan
        span = hi - lo
        step = -(-span // self.parts)  # ceil div
        return [
            InputPartition((p, min(p + step, hi)))
            for p in range(lo, hi, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_row(i)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Deterministic replay stream over the same closed-form rows.

    Offsets are ``{"index": next_row}``; each micro-batch emits up to
    ``batch_rows`` rows and the stream goes silent once ``n`` rows have
    been produced. Offsets are pure functions of the row counter, so a
    restart from the checkpoint replays EXACTLY the rows of the failed
    batch (the contract the simple-reader API exists for: Spark
    re-reads ``[start, end)`` by offset on recovery) — this is the
    feed-replay connector shape: upstream cursor in, exactly-once rows
    out, no state beyond the offset.
    """

    def __init__(self, options: dict):
        self.n = int(options.get("n", 100))
        self.batch_rows = int(options.get("batch_rows", 25))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = int(start["index"])
        hi = min(lo + self.batch_rows, self.n)
        return iter([synth_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # crash recovery: deterministic regeneration of the exact range
        return iter(
            [synth_row(i) for i in range(int(start["index"]), int(end["index"]))]
        )

    def commit(self, end: dict) -> None:
        pass  # nothing upstream to ack: the generator is stateless


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class _ManifestJsonWriter(DataSourceWriter):
    """Two-phase-commit JSONL sink, implemented wholly in Python.

    Every task writes ``part-<uuid>.jsonl`` (unique name: a retried or
    speculated task can never collide with its twin) and reports it in
    its commit message; ONLY the driver's ``commit()`` publishes a
    ``_manifest.json`` naming the committed files — readers resolve the
    manifest first, so a half-finished or aborted write (stray part
    files, no manifest update) is invisible. Same commit discipline as
    the engine's snapshot log (operators/maintenance.py) and the IVF
    store's version flip (operators/vector_store.py), here as the
    Spark-4 writer extension point a custom downstream system would
    implement.

    Scale: tasks write independently (no driver data path — only the
    O(tasks) commit messages), and the manifest write is one small
    atomic rename.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _FileCommit:
        import json

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        rows = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                rows += 1
        return _FileCommit(filename=name, rows=rows)

    def commit(self, messages) -> None:
        import json

        files = sorted(
            m.filename for m in messages if m is not None and m.rows >= 0
        )
        mpath = os.path.join(self.path, "_manifest.json")
        committed: list[str] = []
        if not self.overwrite and os.path.exists(mpath):
            with open(mpath) as f:
                committed = json.load(f)["files"]
        tmp = f"{mpath}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(json.dumps({"files": committed + files}))
        os.replace(tmp, mpath)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.unlink(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class _ManifestJsonStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the manifest sink: per micro-batch, tasks
    write part files and the driver publishes them under the BATCH ID —
    re-running a batch after a crash (Spark replays uncommitted batch
    ids from the checkpoint) overwrites that batch's manifest entry
    instead of appending a duplicate, which is exactly the
    batch-id-idempotent discipline of the engine's foreachBatch snapshot
    sink (operators/maintenance.py:163) expressed through the Spark-4
    stream-writer extension point. Readers resolve committed files
    through the manifest, so exactly-once holds end-to-end."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        import json

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        rows = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                rows += 1
        return _FileCommit(filename=name, rows=rows)

    def commit(self, messages, batchId: int) -> None:
        import json

        mpath = os.path.join(self.path, "_manifest.json")
        batches: dict[str, list[str]] = {}
        if os.path.exists(mpath):
            with open(mpath) as f:
                batches = json.load(f).get("batches", {})
        # keyed by batch id: a replayed batch REPLACES its entry
        batches[str(batchId)] = sorted(
            m.filename for m in messages if m is not None
        )
        tmp = f"{mpath}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(json.dumps({"batches": batches}))
        os.replace(tmp, mpath)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.unlink(os.path.join(self.path, m.filename))
                except OSError:
                    pass


def stream_manifest_files(path: str) -> list[str]:
    """Committed file set of the STREAM sink: the union of each batch's
    manifest entry (latest replay wins per batch id by construction)."""
    import json

    with open(os.path.join(path, "_manifest.json")) as f:
        batches = json.load(f)["batches"]
    return [
        os.path.join(path, n)
        for b in sorted(batches, key=int)
        for n in batches[b]
    ]


def manifest_files(path: str) -> list[str]:
    """The committed file set a manifest-aware reader should scan —
    stray part files from in-flight or aborted writes are not listed."""
    import json

    with open(os.path.join(path, "_manifest.json")) as f:
        return [os.path.join(path, n) for n in json.load(f)["files"]]


class SyntheticEventsDataSource(DataSource):
    """format name: ``synth_events`` — all four extension verbs: batch
    read (pushdown-pruned), stream read (offset replay), batch write
    (manifest 2PC), stream write (batch-id-idempotent manifest)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _ManifestJsonWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _ManifestJsonStreamWriter(self.options)


def register_synth_source(spark) -> None:
    """Idempotent registration (re-register overwrites, which is fine —
    the class is stateless). Python-source filter pushdown is opt-in
    (SPARK-50855 ships it disabled); the reader implements pushFilters,
    so enable it with the registration — a runtime SQL conf."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
