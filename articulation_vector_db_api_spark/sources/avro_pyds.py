"""Avro through Spark 4's Python Data Source API.

Spark's own Avro support lives in the external `spark-avro` JAR this
deployment does not carry; `sources/avro.py` implements the container
format from the public Apache Avro spec (stdlib only), and this module
makes it a first-class Spark source: ``spark.read.format("avro_py")``
with one InputPartition PER CONTAINER BLOCK, so a multi-block file
scans in parallel exactly like a parquet row-group split — the driver
touches only (path, offset) pairs, rows decode executor-side and cross
into the JVM as Arrow batches.

Read path only, by design: writing Avro is a deterministic local
operation (`avro.write_container`) the ingest side calls directly —
a PyDS writer would add a commit protocol the manifest-2PC writer in
sources/pyds.py already demonstrates.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SPARK_TYPES = {
    "boolean": "BOOLEAN",
    "int": "BIGINT",  # Avro int decodes to Python int; widen for safety
    "long": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "bytes": "BINARY",
    "string": "STRING",
}


def _ddl_type(tree: tuple) -> str:
    """Avro type tree (sources/avro.py) -> Spark DDL, recursively:
    record -> STRUCT, array -> ARRAY, map -> MAP<STRING, V> (Avro map
    keys are always strings), enum -> STRING, fixed -> BINARY."""
    kind, arg = tree
    if kind == "prim":
        if arg == "null":
            raise ValueError("Avro null-typed column has no Spark type")
        return _SPARK_TYPES[arg]
    if kind == "union_null":
        return _ddl_type(arg)
    if kind == "union_n":
        branches, mode = arg
        members = [b for b in branches if b is not None]
        if mode == "promote_long":
            return "BIGINT"
        if mode == "promote_double":
            return "DOUBLE"
        if mode == "single":
            return _ddl_type(members[0])
        fields = ", ".join(
            f"`member{j}`: {_ddl_type(b)}" for j, b in enumerate(members)
        )
        return f"STRUCT<{fields}>"
    if kind == "record":
        fields = ", ".join(
            f"`{name}`: {_ddl_type(t)}" for name, t in arg
        )
        return f"STRUCT<{fields}>"
    if kind == "array":
        return f"ARRAY<{_ddl_type(arg)}>"
    if kind == "map":
        return f"MAP<STRING, {_ddl_type(arg)}>"
    if kind == "enum":
        return "STRING"
    if kind == "fixed":
        return "BINARY"
    raise NotImplementedError(f"Avro type kind {kind!r}")


@dataclass
class _BlockPartition(InputPartition):
    path: str
    offset: int


class _AvroReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("avro_py requires a path")
        self.paths = (
            sorted(
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".avro")
            )
            if os.path.isdir(path)
            else [path]
        )
        if not self.paths:
            raise ValueError(f"no .avro files under {path}")

    def partitions(self):
        from .avro import block_offsets

        parts = []
        for p in self.paths:
            for offset, _n in block_offsets(p):
                parts.append(_BlockPartition(p, offset))
        # an empty container still needs one no-op partition so the
        # scan yields an empty DataFrame instead of failing to plan
        return parts or [_BlockPartition(self.paths[0], -1)]

    def read(self, partition: _BlockPartition):
        if partition.offset < 0:
            return iter(())
        from .avro import read_block

        return read_block(partition.path, partition.offset)


class AvroContainerDataSource(DataSource):
    """format name: ``avro_py`` — pure-Python Avro container scan."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        from .avro import read_header

        path = self.options.get("path")
        if not path:
            raise ValueError("avro_py requires a path")
        probe = path
        if os.path.isdir(path):
            files = sorted(
                n for n in os.listdir(path) if n.endswith(".avro")
            )
            if not files:
                raise ValueError(f"no .avro files under {path}")
            probe = os.path.join(path, files[0])
        fields, _codec, _sync, _pos = read_header(probe)
        cols = []
        for name, tree, _nullable in fields:
            try:
                cols.append(f"{name} {_ddl_type(tree)}")
            except ValueError as exc:
                raise ValueError(f"column {name}: {exc}") from exc
        return ", ".join(cols)

    def reader(self, schema) -> DataSourceReader:
        return _AvroReader(self.options)


def register_avro_source(spark) -> None:
    """Idempotent registration of the ``avro_py`` format."""
    spark.dataSource.register(AvroContainerDataSource)
