"""Driver contract for the spark-graft builder (PySpark target).

All capability declarations live in
``articulation_vector_db_api_spark.registry`` — one table feeding
``queries()``/``oracle_sql()``, bench.py, and the parity tests, so the
three can never drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from articulation_vector_db_api_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's /search
    read path (chunk → sha256 hash-embed → exact cosine top-5), per
    /root/reference/main.py:176-216."""
    from articulation_vector_db_api_spark.operators.search import topk_search

    return topk_search(spark, "/root/testdata/sf0.001", "transfer credits", 5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted keys take the rows-only check."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
