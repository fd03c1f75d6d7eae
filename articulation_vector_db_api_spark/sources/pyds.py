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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYNTH_SCHEMA = "id BIGINT, category STRING, val BIGINT"


def synth_row(i: int) -> tuple[int, str, int]:
    """Closed-form row: category cycles A..E, val = (i*i) mod 997.

    Kept as a module-level function so the DuckDB oracle can mirror it
    symbolically: chr(65 + i % 5), (i*i) % 997.
    """
    return (i, chr(65 + i % 5), (i * i) % 997)


class _SynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil div
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """format name: ``synth_events``."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotent registration (re-register overwrites, which is fine —
    the class is stateless)."""
    spark.dataSource.register(SyntheticEventsDataSource)
