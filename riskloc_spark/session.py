"""SparkSession factory tuned for the riskloc_spark engine.

Settings are chosen for scale-out behavior (AQE, skew handling, Arrow)
and work identically on local[N] and a real cluster.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "riskloc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    - AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
      which is what makes a static ``spark.sql.shuffle.partitions`` safe at
      any scale factor.
    - Arrow on: all pandas interchange (used only by the few sanctioned
      Pandas-UDF paths) is columnar.
    - maxPartitionBytes 128m: scan parallelism tracks input size.
    """
    # one BLAS thread per Python worker: local[N] already runs N
    # parallel workers, and numpy's default (OpenBLAS threads = all
    # cores) inside EACH worker oversubscribes NxN — the gemm graph
    # scan measured ~6x slower under the thrash.  Workers inherit the
    # JVM's env, so this must be set before the session starts; a real
    # cluster sets it via spark.executorEnv.* instead.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
