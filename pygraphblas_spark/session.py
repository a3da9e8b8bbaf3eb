"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (``local[N]``, single JVM) but every setting is the
one you would ship to a 1000-executor cluster: AQE on (runtime coalescing +
skew-join splitting), Arrow transfer for the vectorized kernel boundary,
shuffle partitions sized to cores (overridable per-deployment).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults are environment-overridable so bench.py can run the identical job
# at two parallelism levels (the sandbox proxy for N vs 4N executors).
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "pygraphblas_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's standard confs.

    ``cores`` controls ``local[N]`` in the sandbox; on a real cluster the
    master comes from spark-submit and this arg is ignored by Spark.
    """
    cores = str(cores or _DEFAULT_CPUS)
    n = 32 if cores in ("*",) else int(cores)
    # Shuffle partitions ~ cores for local mode; a real deployment sets
    # this to 2-3x total executor cores (AQE coalesces the excess).
    shuffle = shuffle_partitions or max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(n))
        # AQE: runtime partition coalescing, skew-join splitting, and
        # join-strategy demotion — the cluster-scale safety net for the
        # hub-vertex skew the north rule calls out.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: the Python<->JVM boundary for our CSR kernels and any
        # pandas UDF — batch columnar transfer, never per-row pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Rank/label vectors are small relative to edges; let Catalyst
        # broadcast them when under threshold (we also hint explicitly).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # GraphBLAS follows C arithmetic: 1.0/0.0 = inf, integer overflow
        # wraps (the reference's SuiteSparse kernels are C). ANSI mode
        # would raise instead — disable to match reference semantics.
        .config("spark.sql.ansi.enabled", "false")
        # Deterministic timestamps in tests regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
