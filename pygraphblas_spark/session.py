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


# --------------------------------------------------------------------------
# Global option surface  (reference base.py:49-130 options_set/options_get).
#
# SuiteSparse's knobs control its thread pool and storage formats; the
# Spark-native analogs are session confs. Knobs with a real runtime-settable
# Spark twin are applied to the active session immediately; the
# storage-format knobs (hyper_switch / bitmap_switch / format) have no
# meaning under Tungsten row/columnar management, so they are recorded and
# echoed back (API compat for ported code) but change nothing.
# --------------------------------------------------------------------------

_OPTIONS: dict = {
    "nthreads": None,       # -> spark.sql.shuffle.partitions
    "chunk": None,          # -> arrow maxRecordsPerBatch
    "burble": 0,            # -> driver log level INFO/WARN
    "hyper_switch": 0.0625, # advisory only (SuiteSparse default echoed)
    "bitmap_switch": [0.04, 0.05, 0.06, 0.08, 0.1, 0.2, 0.3, 0.4],
    "format": 0,            # GxB_BY_ROW; storage is Tungsten-managed
}


def options_set(
    nthreads=None,
    chunk=None,
    burble=None,
    hyper_switch=None,
    bitmap_switch=None,
    format=None,
) -> None:
    """Set global engine options (reference base.py:49).

    ``nthreads`` maps to ``spark.sql.shuffle.partitions`` (the engine's
    parallel-work knob), ``chunk`` to the Arrow batch size crossing the
    Python boundary, ``burble`` to driver log verbosity. The SuiteSparse
    storage-format knobs are accepted for compatibility and recorded only.
    """
    active = SparkSession.getActiveSession()
    if nthreads is not None:
        _OPTIONS["nthreads"] = int(nthreads)
        if active is not None:
            active.conf.set("spark.sql.shuffle.partitions", str(int(nthreads)))
    if chunk is not None:
        _OPTIONS["chunk"] = int(chunk)
        if active is not None:
            active.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(int(chunk))
            )
    if burble is not None:
        _OPTIONS["burble"] = int(burble)
        if active is not None:
            active.sparkContext.setLogLevel("INFO" if burble else "WARN")
    if hyper_switch is not None:
        _OPTIONS["hyper_switch"] = float(hyper_switch)
    if bitmap_switch is not None:
        _OPTIONS["bitmap_switch"] = list(bitmap_switch)
    if format is not None:
        _OPTIONS["format"] = format


def options_get() -> dict:
    """Get global engine options (reference base.py:98), reading the live
    session confs for the knobs that have Spark twins."""
    out = dict(_OPTIONS)
    active = SparkSession.getActiveSession()
    if active is not None:
        out["nthreads"] = int(active.conf.get("spark.sql.shuffle.partitions"))
        out["chunk"] = int(
            active.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        )
    return out
