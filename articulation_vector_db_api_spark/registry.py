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


# Queries the round-1 driver already hash-verified (CORRECTNESS_r01.json,
# hash_match=true) or recorded as legitimately oracle-less. The driver
# only emits CORRECTNESS rows for a bounded prefix of ``queries()`` in
# registration order, so these move to the back of the returned dict to
# let the still-unverified queries occupy the checked window. Their own
# parity coverage continues via tools/check_parity.py + pytest.
_VERIFIED_R01 = frozenset(
    {
        "flagship_search", "search_context", "search_topk_per_source",
        "search_batch_queries", "search_scoped_source", "chunk_documents",
        "upsert_last_write_wins", "index_stats_by_source", "search_hybrid_rrf",
        "search_mmr_diversified", "filter_project_pushdown",
        "q1_pricing_summary", "agg_distinct_counts", "approx_distinct_parts",
        "agg_stats_moments", "agg_percentiles", "q5_region_revenue",
        "approx_percentile_prices", "q7_nation_volume",
        "q17_correlated_subquery", "q8_market_share", "sort_global_prices",
        "rollup_revenue", "cube_order_status", "grouping_sets_revenue",
        "q3_shipping_priority", "join_broadcast_snowflake",
        "join_sortmerge_fact", "join_semi_customers_with_urgent",
        "join_anti_customers_no_urgent", "join_theta_supplier_pairs",
        "join_range_calendar", "join_asof_event_order", "join_salted_skew",
        "scalar_subquery_above_avg", "topk_orders_by_price",
        "topk_pagination", "setop_except_all", "setop_nations_intersect",
        "setop_nations_except", "setop_union_all_counts",
        "sql_interface_revenue", "nested_agg_big_spenders",
        "agg_price_histogram", "pivot_status_revenue",
        "unpivot_part_measures", "merge_upsert_orders", "cdc_snapshot_diff",
    }
)

# Suite order for the unverified front of the window: cheap batch suites
# first (maximizes rows if the driver's window is time-budgeted),
# expensive streaming/mllib last. hash_embedding_vectors and
# agg_ordered_collect lead — they ERRed in r01 on array-typed columns
# (now string-serialized) and the fix needs a driver row to prove it.
_WINDOW_FIRST = (
    "hash_embedding_vectors",
    "agg_ordered_collect",
    # round-2 driver twins of the previously test-only reference
    # operators O2/O7/O13 — need their first CORRECTNESS row.
    "ingest_extract_status",
    "ingest_fault_isolation",
    "health_probe",
)
_SUITE_WINDOW_ORDER = (
    "window", "scalar", "dedup", "similarity", "textops", "core",
    "relational", "udf", "multimodal", "mllib", "streaming",
)


def load_all() -> dict[str, Query]:
    """Import every suite module (each registers its queries on import).

    The returned dict is ordered for the driver's bounded CORRECTNESS
    window: not-yet-verified queries first (grouped by suite, cheap
    suites leading), round-1-verified queries last.
    """
    for mod in _SUITES:
        importlib.import_module(f"articulation_vector_db_api_spark.suites.{mod}")

    reg_pos = {name: i for i, name in enumerate(REGISTRY)}
    suite_rank = {s: i for i, s in enumerate(_SUITE_WINDOW_ORDER)}

    def sort_key(item: tuple[str, Query]) -> tuple:
        name, q = item
        if name in _WINDOW_FIRST:
            return (0, _WINDOW_FIRST.index(name), 0, 0)
        verified = 1 if name in _VERIFIED_R01 else 0
        suite = next((t for t in q.tags if t in suite_rank), None)
        rank = suite_rank.get(suite, len(suite_rank))
        return (1 + verified, 0, rank, reg_pos[name])

    return dict(sorted(REGISTRY.items(), key=sort_key))
