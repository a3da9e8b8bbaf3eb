"""Per-iteration checkpointing with lineage manifests — resumable runs.

The north rule requires: "each iteration checkpoints per-partition frontier
and rank vectors with lineage and convergence metrics so runs resume
mid-iteration". The reference has no such machinery (single-node, in-memory
ping-pong vectors, SURVEY.md §3.3); on Spark it is load-bearing twice over:

1. **Lineage truncation** — an iterative DataFrame loop grows the logical
   plan linearly; without truncation Catalyst analysis time explodes and a
   lost executor recomputes the whole history. Each iteration's state is
   either ``localCheckpoint``-ed (fast, cluster-memory) or written to
   parquet (durable) so the plan is cut at every step.
2. **Resume** — the manifest (JSON) records iteration number, state paths,
   convergence metric, per-iteration row counts and timings; a new driver
   picks up from the last durable iteration.

State layout under ``root/``:

    manifest.json                     # lineage: list of iteration records
    it_00042/<name>.parquet           # one dir per durable iteration
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@contextlib.contextmanager
def iteration_conf(spark: SparkSession):
    """Pin loop-friendly SQL confs for the duration of an iterative
    algorithm, restoring the previous values on exit.

    AQE is disabled inside iteration loops, deliberately:

    - AQE materializes every shuffle stage as a separate query stage with
      a driver re-planning round between them — per-iteration latency that
      a fixed-size loop body (whose shapes we know exactly) never repays.
      Measured on the sf0.1 code graph: 0.85 s/iter with AQE vs 0.72 s
      without, and 3-5x slower warm-up iterations.
    - AQE's runtime partition coalescing changes output partitioning,
      which breaks the cached co-partitioning/ordering contract the loops
      rely on (edge table hash-partitioned+sorted by join key once, never
      re-shuffled).

    One-shot queries (triangle count, mxm, pipeline ops) keep AQE on —
    skew-join splitting and coalescing earn their latency there.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def release_state(df: Optional[DataFrame]) -> int:
    """Eagerly unpersist the locally-checkpointed blocks behind a
    superseded iteration state.

    ``localCheckpoint`` pins each iteration's partitions in executor
    storage; the async ContextCleaner frees them only after JVM GC notices
    the dropped reference, so a long-running loop accumulates dead state
    and starts evicting under memory pressure. This walks the frame's
    analyzed plan and unpersists every ``LogicalRDD`` leaf (the checkpoint
    scan nodes) — a no-op for parquet-backed (durable) states.

    Returns the number of RDDs unpersisted (-1 on failure; failure is
    harmless, the ContextCleaner remains the backstop).
    """
    if df is None:
        return 0
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaves = plan.collectLeaves().iterator()
        n = 0
        while leaves.hasNext():
            leaf = leaves.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
                n += 1
        return n
    except Exception:
        return -1


def _is_uri(path: str) -> bool:
    return "://" in path


def _hadoop_fs(path: str):
    """(FileSystem, Path, jvm) for a URI-schemed path via the active
    session — works on hdfs://, s3a://, gs://, file://, anything with a
    registered Hadoop FileSystem."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"URI checkpoint root {path!r} needs an active SparkSession"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


def _fs_mkdirs(path: str) -> None:
    if _is_uri(path):
        fs, p, _ = _hadoop_fs(path)
        fs.mkdirs(p)
    else:
        os.makedirs(path, exist_ok=True)


def _fs_exists(path: str) -> bool:
    if _is_uri(path):
        fs, p, _ = _hadoop_fs(path)
        return bool(fs.exists(p))
    return os.path.exists(path)


# URI schemes whose Hadoop FileSystem rename() is atomic — these get the
# tmp-file + rename protocol so a crash mid-write preserves the previous
# manifest. Object stores (s3a/gs/...) keep the direct single PUT: their
# PUT is atomic and rename() is a non-atomic copy+delete there.
_ATOMIC_RENAME_SCHEMES = ("hdfs://", "file://", "viewfs://", "webhdfs://")


def _fs_write_text(path: str, text: str) -> None:
    """Atomic manifest write per filesystem class: local and
    rename-atomic Hadoop schemes use tmp + rename; object stores get a
    single create(overwrite=True) PUT."""
    if _is_uri(path):
        fs, p, jvm = _hadoop_fs(path)
        if path.startswith(_ATOMIC_RENAME_SCHEMES):
            # tmp-write + .bak rotation: every crash window leaves either
            # the old manifest (at .json or .json.bak) or the complete
            # new one readable — _read_manifest_with_fallback covers the
            # .bak case. FileSystem.rename never clobbers on HDFS, hence
            # the rotation instead of a delete-then-rename gap.
            tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
            bak = jvm.org.apache.hadoop.fs.Path(path + ".bak")
            out = fs.create(tmp, True)
            try:
                out.write(bytearray(text.encode("utf-8")))
            finally:
                out.close()
            if fs.exists(p):
                fs.delete(bak, False)
                fs.rename(p, bak)
            if not fs.rename(tmp, p):
                raise IOError(f"manifest rename failed: {tmp} -> {p}")
        else:
            out = fs.create(p, True)
            try:
                out.write(bytearray(text.encode("utf-8")))
            finally:
                out.close()
    else:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)


def _fs_read_text(path: str) -> str:
    if _is_uri(path):
        fs, p, jvm = _hadoop_fs(path)
        stream = fs.open(p)
        try:
            # commons-io ships with Hadoop; avoids byte-by-byte py4j reads
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
    with open(path) as f:
        return f.read()


class CheckpointManager:
    """Durable (parquet) checkpoint + manifest for an iterative algorithm.

    ``interval`` controls durability cadence: every iteration calls
    ``cut()`` which truncates lineage in memory (localCheckpoint); every
    ``interval``-th iteration also persists state to parquet and appends a
    manifest record. ``interval=0`` disables durable writes (pure in-memory
    lineage truncation — what tests and benchmarks use).
    """

    def __init__(
        self,
        root: Optional[str] = None,
        interval: int = 0,
        algorithm: str = "",
        params: Optional[dict] = None,
    ):
        self.root = root
        self.interval = int(interval)
        self.algorithm = algorithm
        self.params = params or {}
        self.records: list[dict] = []
        self._t0 = time.time()
        if self.durable:
            _fs_mkdirs(self.root)

    @property
    def durable(self) -> bool:
        return bool(self.root) and self.interval > 0

    # -- lineage truncation (every iteration) --

    def cut(self, df: DataFrame) -> DataFrame:
        """Truncate lineage: materialize the iteration state and return a
        frame whose plan starts fresh. ``localCheckpoint(eager=True)``
        stores partitions on executors — no parquet round-trip."""
        return df.localCheckpoint(eager=True)

    def record(self, iteration: int, metrics: dict) -> dict:
        """Append a non-durable manifest record (metrics-only iteration —
        the kernel paths use this when state lives driver-side as numpy).
        Same schema as :meth:`save`'s records."""
        rec = {
            "iteration": iteration,
            "algorithm": self.algorithm,
            "elapsed_sec": round(time.time() - self._t0, 3),
            "metrics": metrics,
            "durable": False,
        }
        self.records.append(rec)
        return rec

    def on_cadence(self, iteration: int) -> bool:
        """True when this iteration should be durably persisted."""
        return self.durable and iteration % self.interval == 0

    # -- durable checkpoint + manifest --

    def save(
        self,
        iteration: int,
        states: dict[str, DataFrame],
        metrics: dict,
    ) -> dict[str, DataFrame]:
        """Record an iteration. When durable and on-cadence, write each
        state DataFrame to parquet (partition-parallel write — this *is*
        the per-partition frontier/rank checkpoint) and reload it so the
        returned frames read from disk (lineage fully severed).

        Always appends the metrics record to the in-memory manifest;
        flushes manifest JSON on durable iterations.
        """
        rec = {
            "iteration": iteration,
            "algorithm": self.algorithm,
            "elapsed_sec": round(time.time() - self._t0, 3),
            "metrics": metrics,
            "durable": False,
        }
        out = states
        if self.durable and iteration % self.interval == 0:
            it_dir = os.path.join(self.root, f"it_{iteration:05d}")
            out = {}
            state_meta = {}
            for name, df in states.items():
                path = os.path.join(it_dir, f"{name}.parquet")
                df.write.mode("overwrite").parquet(path)
                reloaded = df.sparkSession.read.parquet(path)
                out[name] = reloaded
                state_meta[name] = {
                    "path": path,
                    "num_files_partitions": reloaded.rdd.getNumPartitions(),
                }
            rec["durable"] = True
            rec["states"] = state_meta
        self.records.append(rec)
        if rec["durable"]:
            self._flush()
        return out

    def _flush(self) -> None:
        manifest = {
            "algorithm": self.algorithm,
            "params": self.params,
            "records": self.records,
        }
        _fs_write_text(
            os.path.join(self.root, "manifest.json"),
            json.dumps(manifest, indent=1),
        )

    # -- resume --

    @classmethod
    def resume(
        cls, spark: SparkSession, root: str
    ) -> Optional[tuple[int, dict[str, DataFrame], dict]]:
        """Load the latest durable iteration: returns (iteration,
        {state_name: DataFrame}, manifest) or None if no manifest."""
        path = os.path.join(root, "manifest.json")
        manifest = None
        if _fs_exists(path):
            try:
                manifest = json.loads(_fs_read_text(path))
            except ValueError:
                manifest = None  # truncated mid-write — try the rotation
        if manifest is None:
            # crash windows leave the previous manifest at .bak (see
            # _fs_write_text's rename rotation); a resume should pick up
            # the last durable record rather than fail forever
            bak = path + ".bak"
            if not _fs_exists(bak):
                return None
            try:
                manifest = json.loads(_fs_read_text(bak))
            except ValueError:
                return None
        durable = [r for r in manifest["records"] if r.get("durable")]
        if not durable:
            return None
        last = durable[-1]
        states = {
            name: spark.read.parquet(meta["path"])
            for name, meta in last["states"].items()
        }
        return last["iteration"], states, manifest
