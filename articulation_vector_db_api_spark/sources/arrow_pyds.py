"""Arrow IPC files (Feather v2) through Spark 4's Python Data Source API.

Arrow IPC is the lingua franca of the Python data ecosystem (pandas /
polars / DuckDB all emit it), but Spark has no built-in reader for the
on-disk file format. This module makes it a first-class source:
``spark.read.format("arrow_ipc")`` plans one InputPartition PER RECORD
BATCH — the file footer indexes batch offsets exactly like a parquet
footer indexes row groups, so a multi-batch file scans in parallel with
the driver touching only (path, batch_index) pairs. The read path is
ZERO-PARSE end to end: each partition memory-maps its file, yields its
``pyarrow.RecordBatch`` as-is, and Spark's Arrow-native PyDS channel
moves it into the JVM without a Python-object detour (the same
fast path ``mapInArrow`` uses — no per-row decode exists anywhere).

Read path only, by design: writing IPC is a deterministic local
operation (``pyarrow.ipc.new_file``) the ingest side calls directly — a
PyDS writer would re-demonstrate the commit protocol the manifest-2PC
writer in sources/pyds.py already covers.

The reference hardcodes a single source (Pinecone,
/root/reference/main.py:21); this is engine surface, not parity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _ddl_type(t) -> str:
    """Map an Arrow type to a Spark DDL type, or refuse loudly."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_int8(t):
        return "TINYINT"
    if pa.types.is_int16(t):
        return "SMALLINT"
    if pa.types.is_int32(t):
        return "INT"
    if pa.types.is_int64(t):
        return "BIGINT"
    if pa.types.is_float32(t):
        return "FLOAT"
    if pa.types.is_float64(t):
        return "DOUBLE"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "STRING"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BINARY"
    if pa.types.is_date32(t):
        return "DATE"
    if pa.types.is_timestamp(t):
        # tz-aware Arrow timestamps are epoch instants (the tz is
        # display metadata) -> Spark TIMESTAMP (instant semantics,
        # rendered in the session timezone); naive -> TIMESTAMP_NTZ.
        # Any unit: _canonical_type normalizes to microseconds.
        return "TIMESTAMP" if t.tz is not None else "TIMESTAMP_NTZ"
    # Nested types map recursively — list<float> is how embeddings ship
    # in Arrow/Feather interchange files, so these ride the same
    # zero-parse memory-mapped path as the primitives. fixed_size_list
    # (the tensor-ish layout FixedSizeList embeddings use) and the
    # large_* offsets variants all collapse to the one Spark type.
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"ARRAY<{_ddl_type(t.value_type)}>"
    if pa.types.is_struct(t):
        fields = ", ".join(
            f"`{t.field(i).name}`: {_ddl_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"STRUCT<{fields}>"
    if pa.types.is_map(t):
        return f"MAP<{_ddl_type(t.key_type)}, {_ddl_type(t.item_type)}>"
    raise ValueError(f"arrow_ipc: unsupported Arrow type {t}")


def _canonical_type(t):
    """The Spark-channel-compatible twin of an Arrow type: Spark's
    Arrow bridge takes list/string/binary but not the fixed-size or
    64-bit-offset variants, so those collapse to the canonical layout
    (recursively). Returns t itself when nothing needs to change, so
    an already-canonical batch is yielded zero-copy."""
    import pyarrow as pa

    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return pa.list_(_canonical_type(t.value_type))
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_timestamp(t):
        # Spark's Arrow bridge carries timestamps at MICROSECOND unit;
        # tz-aware values normalize to the UTC label (same instants —
        # a safe cast, the zone is metadata). s/ms widen losslessly;
        # ns->us uses a checked cast so sub-microsecond payloads fail
        # loudly instead of silently truncating.
        if t.unit == "us" and t.tz in (None, "UTC"):
            return t
        return pa.timestamp("us", tz="UTC" if t.tz is not None else None)
    if pa.types.is_struct(t):
        return pa.struct(
            [
                pa.field(t.field(i).name, _canonical_type(t.field(i).type))
                for i in range(t.num_fields)
            ]
        )
    if pa.types.is_map(t):
        return pa.map_(
            _canonical_type(t.key_type), _canonical_type(t.item_type)
        )
    return t


def _canonical_schema(sch):
    import pyarrow as pa

    return pa.schema(
        [pa.field(f.name, _canonical_type(f.type)) for f in sch]
    )


def _ipc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith((".arrow", ".feather"))
        )
        if not files:
            raise ValueError(f"no .arrow/.feather files under {path}")
        return files
    return [path]


@dataclass
class _BatchPartition(InputPartition):
    path: str
    index: int


class _ArrowIpcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("arrow_ipc requires a path")
        self.paths = _ipc_files(path)

    def partitions(self):
        import pyarrow as pa

        parts = []
        for p in self.paths:
            # open_file reads only the footer — batch COUNT is O(1)
            # driver work, batch BYTES stay on disk until an executor
            # maps them
            with pa.memory_map(p, "r") as src:
                n = pa.ipc.open_file(src).num_record_batches
            parts.extend(_BatchPartition(p, i) for i in range(n))
        # an empty file still needs one no-op partition so the scan
        # yields an empty DataFrame instead of failing to plan
        return parts or [_BatchPartition(self.paths[0], -1)]

    def read(self, partition: _BatchPartition):
        if partition.index < 0:
            return
        import pyarrow as pa

        with pa.memory_map(partition.path, "r") as src:
            batch = pa.ipc.open_file(src).get_batch(partition.index)
        target = _canonical_schema(batch.schema)
        if target != batch.schema:
            # fixed_size_list / large_* layouts re-materialize as the
            # canonical layout the JVM bridge accepts; canonical files
            # skip this branch and stay zero-copy off the memory map
            batch = (
                pa.Table.from_batches([batch])
                .cast(target)
                .combine_chunks()
                .to_batches()
            )
            yield from batch
            return
        yield batch


class ArrowIpcDataSource(DataSource):
    """format name: ``arrow_ipc`` — per-record-batch Arrow file scan."""

    @classmethod
    def name(cls) -> str:
        return "arrow_ipc"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("arrow_ipc requires a path")
        import pyarrow as pa

        probe = _ipc_files(path)[0]
        with pa.memory_map(probe, "r") as src:
            sch = pa.ipc.open_file(src).schema
        return ", ".join(f"{f.name} {_ddl_type(f.type)}" for f in sch)

    def reader(self, schema) -> DataSourceReader:
        return _ArrowIpcReader(self.options)


def register_arrow_source(spark) -> None:
    """Idempotent registration of the ``arrow_ipc`` format."""
    spark.dataSource.register(ArrowIpcDataSource)
