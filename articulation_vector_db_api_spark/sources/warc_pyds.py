"""WARC archives through Spark 4's Python Data Source API.

``spark.read.format("warc_py")`` plans one InputPartition per RANGE of
contiguous gzip members using the sidecar offset index
(`sources/warc.py`): members are bundled until a partition reaches
``target_bytes`` (default 4 MiB of compressed archive), so task count
tracks ARCHIVE SIZE, not record count — planning one task per record
looks elegant but detonates at scale (a 10× fixture already means
50k tasks; a real Common Crawl segment would mean millions, and task
scheduling overhead would dwarf the I/O). This mirrors how production
CC processors consume CDX indexes: seek to a range, stream the members
inside it. The driver touches only (path, start, end, count) tuples;
records inflate and parse executor-side.

Read path only, by design (same policy as avro_pyds/arrow_pyds): the
archive writer is a deterministic local operation the ingest side
calls directly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DEFAULT_TARGET_BYTES = 4 << 20


def _warc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith((".warc", ".warc.gz"))
        )
        if not files:
            raise ValueError(f"no .warc/.warc.gz files under {path}")
        return files
    return [path]


@dataclass
class _RangePartition(InputPartition):
    path: str
    start: int
    end: int
    n_records: int


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warc_py requires a path")
        self.paths = _warc_files(path)
        self.target = int(options.get("target_bytes", _DEFAULT_TARGET_BYTES))
        if self.target <= 0:
            raise ValueError("target_bytes must be positive")

    def partitions(self):
        from .warc import read_index

        parts = []
        for p in self.paths:
            start = end = count = 0
            for off, length in read_index(p):
                if count and end - start + length > self.target:
                    parts.append(_RangePartition(p, start, end, count))
                    start, count = off, 0
                end = off + length
                count += 1
            if count:
                parts.append(_RangePartition(p, start, end, count))
        return parts or [_RangePartition(self.paths[0], 0, 0, 0)]

    def read(self, partition: _RangePartition):
        if partition.n_records == 0:
            return
        from .warc import read_members_range

        yield from (
            (rec["rec_type"], rec["uri"], rec["payload"])
            for rec in read_members_range(
                partition.path,
                partition.start,
                partition.end,
                partition.n_records,
            )
        )


class WarcDataSource(DataSource):
    """format name: ``warc_py`` — member-range WARC archive scan."""

    @classmethod
    def name(cls) -> str:
        return "warc_py"

    def schema(self) -> str:
        return "rec_type STRING, uri STRING, payload BINARY"

    def reader(self, schema) -> DataSourceReader:
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration of the ``warc_py`` format."""
    spark.dataSource.register(WarcDataSource)
