"""API-surface parity tests — the engine answers the reference's own
smoke corpus (/root/reference/test_api.sh:38-64) with the reference's
response shapes."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.api import EngineAPI
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def api(spark):
    return EngineAPI(spark=spark, data_dir=SF_SMALL)


def test_search_response_shape(api):
    # the reference's own smoke query, test_api.sh:38-44
    resp = api.search("What are the articulation agreements for University of Florida?", top_k=3)
    assert set(resp) == {"query", "chunks", "total_results", "context"}
    assert resp["total_results"] == len(resp["chunks"]) <= 3
    for chunk in resp["chunks"]:
        assert set(chunk) == {"text", "source", "score", "id"}
    assert "[Source: " in resp["context"]


def test_query_aliases_search(api):
    # test_api.sh:50-56; /query delegates verbatim (main.py:335-338)
    a = api.search("transfer credits", top_k=2)
    b = api.query("transfer credits", top_k=2)
    assert a == b


def test_search_rejects_empty(api):
    with pytest.raises(ValueError):
        api.search("   ")


def test_ingest_stats_health_roundtrip(api, spark, tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "guide.txt").write_text("articulation agreement " * 200)
    table = str(tmp_path / "chunks")
    resp = api.ingest(str(docs), table, glob="*.txt")
    # IngestResponse.pdfs_processed is the list of processed source
    # titles in the reference (main.py:103,311), not a count.
    assert resp["pdfs_processed"] == ["guide"]
    assert resp["ingested_count"] > 1
    stats = api.stats(table)
    assert stats["stats"]["dimension"] == 1024
    assert api.health(table)["status"] == "healthy"
    assert api.health(str(tmp_path / "missing"))["status"] == "degraded"
