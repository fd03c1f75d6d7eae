"""The stored-IVF claim, verified behaviorally: a probe of the
partitioned vector table must READ only the probed cells. Proof: after
corrupting every NON-probed partition's files on disk, the probe still
returns correct results (it never touches those partitions), while an
unfiltered scan of the same table fails on the corruption.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from articulation_vector_db_api_spark.functions.vector import cosine
from articulation_vector_db_api_spark.operators.vector_store import (
    probe_ivf_store,
    write_ivf_store,
)
from articulation_vector_db_api_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"
N_CELLS = 8
NPROBE = 2


def test_ivf_store_probe_is_partition_pruned(spark, tmp_path):
    e = load_table(spark, SF, "embeddings")
    store = str(tmp_path / "ivf_store")
    write_ivf_store(e, store, N_CELLS)

    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    topk = probe_ivf_store(spark, store, qvec, nprobe=NPROBE, k=10)
    # the cell predicate must reach the scan as a partition filter
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    baseline = [tuple(r) for r in topk.collect()]
    probed = {r[1] for r in baseline}
    assert len(probed) <= NPROBE

    # corrupt every non-probed partition on disk
    vdir = os.path.join(store, "vectors")
    corrupted = 0
    for d in os.listdir(vdir):
        if not d.startswith("cell="):
            continue
        if int(d.split("=")[1]) in probed:
            continue
        for f in os.listdir(os.path.join(vdir, d)):
            if f.endswith(".parquet"):
                with open(os.path.join(vdir, d, f), "wb") as fh:
                    fh.write(b"not a parquet file")
                corrupted += 1
    assert corrupted >= N_CELLS - NPROBE  # every unprobed cell poisoned

    # pruned probe: identical results, corruption never read
    again = [
        tuple(r)
        for r in probe_ivf_store(spark, store, qvec, nprobe=NPROBE, k=10).collect()
    ]
    assert again == baseline

    # whereas a full scan MUST hit the poison (proves the corruption
    # is real and the probe's survival was pruning, not luck)
    with pytest.raises(Exception, match="[Pp]arquet|FAILED_READ_FILE"):
        spark.read.parquet(vdir).agg(F.count(F.lit(1))).collect()

    # semantic check: probe equals an in-memory re-rank of those cells
    q = F.array(*[F.lit(x) for x in qvec])
    ivf = e.select("vec_id", "embedding", (F.col("vec_id") % N_CELLS).alias("cell"))
    expected = [
        tuple(r)
        for r in ivf.filter(F.col("cell").isin([int(c) for c in probed]))
        .select(
            "vec_id", "cell", F.round(cosine(F.col("embedding"), q), 6).alias("score")
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
        .collect()
    ]
    assert baseline == expected
