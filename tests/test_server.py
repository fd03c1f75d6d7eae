"""HTTP serving tier: route-for-route parity with the reference's
FastAPI surface (main.py:219-365), served by the stdlib tier over real
Spark jobs."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from articulation_vector_db_api_spark.api import EngineAPI
from articulation_vector_db_api_spark.server import ServerConfig, serve

_CORPUS = os.path.join(os.path.dirname(__file__), "fixtures", "driver_corpus")


def _get(base: str, path: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(base + path) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(base: str, path: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("http_tier") / "chunks")
    api = EngineAPI(spark=spark, data_dir="/root/testdata/sf0.001")
    server = serve(api, ServerConfig(table_path=table, corpus_dir=_CORPUS))
    base = "http://127.0.0.1:%d" % server.server_address[1]
    yield base, table
    server.shutdown()


def test_root_and_degraded_health(served):
    base, table = served
    code, body = _get(base, "/")
    assert code == 200 and body["status"] == "healthy"
    assert body["service"] == "College PDF Vector Database API"
    # before any ingest the index is missing -> degraded, never a 5xx
    code, body = _get(base, "/health")
    assert code == 200 and body["status"] == "degraded"


def test_ingest_then_stats_and_health(served):
    base, table = served
    code, body = _post(base, "/ingest", {})
    assert code == 200
    assert body["ingested_count"] > 0
    assert isinstance(body["pdfs_processed"], list)  # titles, not a count
    code, body = _get(base, "/stats")
    assert code == 200
    assert body["stats"]["total_vector_count"] > 0
    assert body["stats"]["dimension"] == 1024
    code, body = _get(base, "/health")
    assert code == 200 and body["status"] == "healthy"


def test_search_query_alias_and_validation(served):
    base, table = served
    code, a = _post(base, "/search", {"query": "alpha", "top_k": 3})
    assert code == 200
    assert a["total_results"] == len(a["chunks"]) <= 3
    assert a["query"] == "alpha"
    if a["chunks"]:
        assert set(a["chunks"][0]) == {"text", "source", "score", "id"}
        assert "[Source: " in a["context"]
    # /query is a verbatim alias (main.py:335-338)
    code, b = _post(base, "/query", {"query": "alpha", "top_k": 3})
    assert code == 200 and b == a
    # empty query -> 400 with FastAPI's error shape (main.py:317-318)
    code, err = _post(base, "/search", {"query": "   "})
    assert code == 400 and err["detail"] == "Query cannot be empty"


def test_ingest_missing_corpus_404_and_unknown_route(served):
    base, table = served
    code, err = _post(base, "/ingest", {"corpus_dir": "/nonexistent/dir"})
    assert code == 404 and "PDF not found" in err["detail"]
    code, err = _get(base, "/nope")
    assert code == 404


def test_admin_snapshots_surface(served):
    base, table = served
    code, body = _get(base, "/snapshots")
    assert code == 200 and "current" in body and "versions" in body


def test_vectors_admin_verbs_roundtrip(spark, tmp_path):
    """The index's three verbs over HTTP: upsert → query finds the new
    vector in the right cell; overwrite upsert changes its values
    (last-write-wins); delete(purge) makes it vanish from probes."""
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.operators.vector_store import (
        write_ivf_store,
    )
    from articulation_vector_db_api_spark.sources.readers import load_table

    store = str(tmp_path / "http_ivf")
    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    write_ivf_store(e.filter(F.col("vec_id") < 64), store, 8)
    api = EngineAPI(spark=spark, data_dir="/root/testdata/sf0.001")
    server = serve(api, ServerConfig(table_path=str(tmp_path / "t"),
                                     vector_store_path=store))
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        dim = len(e.select("embedding").first()[0])  # 64 at sf0.001
        probe = [1.0] * 16 + [0.0] * (dim - 16)

        code, res = _post(base, "/vectors/upsert", {
            "vectors": [{"vec_id": 1000, "embedding": probe}]})
        assert (code, res["upserted"]) == (200, 1)

        code, res = _post(base, "/vectors/query", {
            "vector": probe, "top_k": 3, "nprobe": 8})
        assert code == 200
        assert res["matches"][0]["id"] == 1000  # exact self-match
        assert abs(res["matches"][0]["score"] - 1.0) < 1e-6

        # last-write-wins: same id, different vector
        flipped = [-x for x in probe]
        code, _ = _post(base, "/vectors/upsert", {
            "vectors": [{"vec_id": 1000, "embedding": flipped}]})
        assert code == 200
        code, res = _post(base, "/vectors/query", {
            "vector": probe, "top_k": 64, "nprobe": 8})
        hit = [m for m in res["matches"] if m["id"] == 1000]
        assert not hit or hit[0]["score"] < 0.0  # old +1.0 row is gone

        code, res = _post(base, "/vectors/delete", {
            "ids": [1000], "purge": True})
        assert code == 200 and res["deleted"] == 1
        code, res = _post(base, "/vectors/query", {
            "vector": probe, "top_k": 64, "nprobe": 8})
        assert all(m["id"] != 1000 for m in res["matches"])

        code, res = _post(base, "/vectors/query", {})
        assert code == 400  # vector required
    finally:
        server.shutdown()
