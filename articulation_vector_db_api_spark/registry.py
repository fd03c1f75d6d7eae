"""Central query registry.

Every engine capability is declared once as a ``Query``: a PySpark
builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle SQL twin. ``__spark_entry__.queries()`` /
``oracle_sql()``, ``bench.py`` and the parity tests all read this one
table, so coverage claims, correctness checks and benchmarks can never
drift apart.

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically in the
Spark builder and the oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkFn
    oracle: str | None = None  # DuckDB SQL twin; None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

_SUITES = (
    "core",
    "relational",
    "tpch_families",
    "windows",
    "scalars",
    "dedup",
    "similarity",
    "textops",
    "multimodal",
    "streaming",
    "udfs",
    "mllib",
)


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every suite module (each registers its queries on import)."""
    for mod in _SUITES:
        importlib.import_module(f"articulation_vector_db_api_spark.suites.{mod}")
    return REGISTRY
