"""In-session determinism: queries that touch session state (streaming
memory sinks, temp views, caches, fitted models) must return identical
results when invoked repeatedly in ONE SparkSession — the driver runs
the whole suite in a single session, so state leakage between calls
would silently corrupt later results."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.registry import load_all
from tests.conftest import SF_SMALL

# the session-state-touching queries (streams, views, caches, ML fits)
STATEFUL = [
    "stream_tumbling_window",
    "stream_dedup",
    "stream_stateful_user_stats",
    "sql_interface_revenue",
    "dedup_minhash_lsh",
    "udtf_char_trigrams",
    "agg_grouping_id_sets",  # temp view
    "mllib_ivf_ann",  # seeded KMeans fit per call
]


@pytest.mark.parametrize("name", STATEFUL)
def test_repeat_invocation_identical(spark, name):
    q = load_all()[name]
    first = sorted(map(tuple, q.fn(spark, SF_SMALL).collect()))
    second = sorted(map(tuple, q.fn(spark, SF_SMALL).collect()))
    assert first == second
    assert len(first) > 0
