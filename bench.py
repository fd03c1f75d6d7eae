"""Benchmark harness: runs the headline queries at the target scale
factor and prints ONE JSON line.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Each query is fully materialized via a noop-format write (forces every
stage; no driver-collect overhead biasing the numbers). Session startup
and a small scan warmup are excluded — the metric is query execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from articulation_vector_db_api_spark.registry import load_all  # noqa: E402
from articulation_vector_db_api_spark.session import get_spark  # noqa: E402
from articulation_vector_db_api_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)
    registry = load_all()
    headliners = sorted(n for n, q in registry.items() if q.headline)

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + parquet footer caches, excluded from timings
    load_table(spark, sf_dir, "lineitem").count()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # best-of-2: one JIT/cache-warm pass, keep the steady-state number.
    # If the two samples disagree by >25%, one was contended (GC /
    # background JIT from a neighboring query) — a third run pins the
    # steady state so untouched queries stop tripping regressed_30pct
    # (r6/r7 both flagged suite-contention noise on unchanged code).
    timings: dict[str, float] = {}
    for name in headliners:
        a, b = run_once(name), run_once(name)
        best = min(a, b)
        if max(a, b) > 1.25 * best:
            best = min(best, run_once(name))
        timings[name] = round(best, 3)

    # the reference's WRITE path at scale: chunk + full 1024-dim embed +
    # partitioned parquet write (operators/ingest.py sink shape)
    from articulation_vector_db_api_spark.operators.ingest import write_chunk_table
    from articulation_vector_db_api_spark.operators.search import build_chunk_index

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".tmp", "bench_chunks")

    def ingest_once() -> float:
        # fresh target each run: accumulated partitions from prior
        # bench invocations otherwise bill their listing/commit cost to
        # this round (r02 measured 2.49x on exactly that)
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        write_chunk_table(build_chunk_index(spark, sf_dir), out)
        return time.perf_counter() - t0

    timings["ingest_write_1024d"] = round(min(ingest_once(), ingest_once()), 3)

    # the stored-index SERVING path: top-k over the chunk table the
    # ingest bench just wrote — the steady-state read a 100 TB
    # deployment actually hits (vs flagship_search's from-scratch
    # brute-force), so its latency is tracked per round
    from articulation_vector_db_api_spark.operators.search import (
        topk_search_indexed,
    )

    def serve_once() -> float:
        t0 = time.perf_counter()
        topk_search_indexed(spark, out, "transfer credits", 5).write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    timings["search_indexed_topk"] = round(min(serve_once(), serve_once()), 3)

    # tokenizer training at production merge counts (rows-only in the
    # registry — iterative algorithm, ground truth pinned in
    # tests/test_bpe.py — so benched here instead of via headline)
    def bpe_once() -> float:
        t0 = time.perf_counter()
        registry["text_bpe_learn_merges_batched"].fn(
            spark, sf_dir
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    timings["bpe_train_256_batched"] = round(min(bpe_once(), bpe_once()), 3)

    # the stored-index WRITE path at scale: build + append a batch +
    # keyed upsert (tombstone→purge→append) + partition-pruned probe —
    # the full IVF store lifecycle (operators/vector_store.py)
    from pyspark.sql import functions as F

    from articulation_vector_db_api_spark.operators.vector_store import (
        probe_ivf_store,
        upsert_ivf_store,
        write_ivf_store,
    )

    store = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".tmp", "bench_ivf_store"
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]

    def ivf_maintenance_once() -> float:
        # fresh store per run (router training excluded: one-time cost,
        # not the recurring maintenance path being tracked)
        import shutil

        shutil.rmtree(store, ignore_errors=True)
        write_ivf_store(emb, store, 16)
        batch = emb.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id",
            F.transform("embedding", lambda x: x + F.lit(0.5)).alias(
                "embedding"
            ),
        )
        t0 = time.perf_counter()
        upsert_ivf_store(spark, batch, store, 16)
        probe_ivf_store(spark, store, qvec, nprobe=4, k=10).write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    timings["ivf_store_upsert_probe"] = round(
        min(ivf_maintenance_once(), ivf_maintenance_once()), 3
    )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    prev = _prev_round_timings()
    if prev is not None:
        rnd, prev_q = prev
        common = sorted(set(prev_q) & set(timings))
        prev_sec = round(sum(prev_q[q] for q in common), 3)
        cur_sec = round(sum(timings[q] for q in common), 3)
        payload["common_subset_vs_prev"] = {
            "prev_round": rnd,
            "n_queries": len(common),
            "prev_sec": prev_sec,
            "cur_sec": cur_sec,
            "ratio": round(cur_sec / prev_sec, 3) if prev_sec else None,
            "regressed_30pct": sorted(
                q
                for q in common
                if prev_q[q] > 0 and timings[q] / prev_q[q] > 1.3
            ),
        }
    print(json.dumps(payload))


def _prev_round_timings() -> tuple[int, dict[str, float]] | None:
    """Per-query timings from the newest BENCH_r{N}.json, so every
    bench line carries its own apples-to-apples cross-round comparison
    (same-name queries only — new/retired headliners are excluded)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, dict[str, float]] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if best is not None and rnd <= best[0]:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
            queries = doc.get("parsed", doc).get("queries")
        except (OSError, ValueError, AttributeError):
            continue
        if isinstance(queries, dict) and queries:
            best = (rnd, {str(k): float(v) for k, v in queries.items()})
    return best


if __name__ == "__main__":
    main()
