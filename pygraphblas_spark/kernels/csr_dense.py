"""Dense-vector iterative kernels over cached per-partition CSR blocks.

The north star's physical plan made concrete: "edges ... built into
per-partition CSR blocks, and PageRank (plus-times semiring SpMV ...),
connected components (min-plus label diffusion ...), label propagation
... computed by iterative sparse gather-scatter expressed as vectorized
pandas/Arrow UDFs over DataFrames — no per-row Python". Reference
boundary analog: ``Matrix.to_arrays`` / ``npI/npJ/npV`` zero-copy numpy
views (``pygraphblas/matrix.py:1475-1605``) — the same Python⇄arrays
frontier, here crossed via Arrow.

Design (what each piece buys at scale):

- **CSR block cache (built once)**: edges are hash-partitioned by ``dst``
  and sorted; each partition is compressed to three numpy arrays — unique
  dst ids, segment starts, and the src index array — stored as raw
  ``binary`` cells in a cached one-row-per-block DataFrame. Because the
  partitioner is a function of ``dst``, every dst's in-edges live in
  exactly one block: per-block scatter results are FINAL. The iteration
  loop therefore has ZERO shuffles, and the JVM's per-iteration work is
  shipping cached byte buffers (pure memcpy — no row↔columnar encode).
- **Vector transport**: each iteration needs an n-vector (ranks / labels)
  visible to every kernel task. In ``local[k]`` it is published as an
  ``.npy`` file and kernels ``np.load`` it ``mmap_mode='r'`` — ONE
  page-cache copy shared by all workers, the same per-node sharing a real
  multi-executor node gets from its block manager (k private unpickled
  copies per k workers is a local-mode pathology, not a design target).
  On a non-local master it falls back to ``sc.broadcast``.
- **Per-iteration dataflow**: one job, one narrow stage over the block
  cache; results return as binary numpy buffers via ``toArrow`` (a
  ``collect()`` would funnel them through single-threaded py4j pickling);
  the driver update is O(n) vectorized numpy.

Crossover: the driver holds dense n-vectors and every executor node maps
one — fine to ~10^8 vertices; beyond, the ``algorithms.*`` join paths
scale out with no per-node n-sized state (the 10^12-file configuration).
``DENSE_KERNEL_MAX_ROWS`` gates the automatic choice.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: above this many vertices the ``strategy='auto'`` algorithm entry
#: points stop using the dense kernels (driver + each executor node hold
#: dense n-vectors).
DENSE_KERNEL_MAX_ROWS = 10_000_000

#: in local mode, graphs at or below this many edges iterate IN-CORE on
#: the driver (one Arrow pull of the edge list, then pure numpy rounds —
#: zero Spark jobs per iteration). Rationale: a local-mode job carries a
#: ~0.1-0.5 s scheduling + Python-worker round-trip floor per iteration;
#: a single core streams ``np.add.reduceat`` gather-scatter at ~10^8
#: edges/s, so below ~10^7 edges the cluster machinery is pure overhead
#: (measured: 36-iteration PageRank on 2.6M edges = 19.3 s fused vs
#: <2 s in-core). Above the threshold the fused memmap loop (local) /
#: broadcast-collect loop (cluster) take over — same math, same
#: checkpoint records, results equal to 1e-12 (fp sum order) / exactly
#: (integer label updates).
INCORE_MAX_NNZ = int(os.environ.get("PGB_INCORE_MAX_NNZ", "16000000"))


def _build_blocks(e: DataFrame, narrow: bool):
    """Compress dst-partitioned, dst-sorted edges into per-partition CSR
    arrays stored as binary cells (one row per non-empty block)."""
    import pyarrow as pa

    idt = "int32" if narrow else "int64"

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        srcs, dsts = [], []
        for b in batches:
            srcs.append(b.column("src").to_numpy(zero_copy_only=False))
            dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
        if not srcs:
            return
        src = np.ascontiguousarray(np.concatenate(srcs), dtype=idt)
        dst = np.concatenate(dsts)  # sorted within the partition
        if len(dst) == 0:
            # all delivered batches were zero-row: np.r_[True, ...] would
            # fabricate starts=[0] and dst[starts] would IndexError
            return
        starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]]).astype("int64")
        uniq = dst[starts].astype("int64")
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([uniq.tobytes()], type=pa.binary()),
                pa.array([starts.tobytes()], type=pa.binary()),
                pa.array([src.tobytes()], type=pa.binary()),
            ],
            names=["uniq", "starts", "src"],
        )

    blocks = e.mapInArrow(build, "uniq binary, starts binary, src binary").persist()
    blocks.count()
    return blocks, idt


class _BlockEngine:
    """Shared machinery for the dense iterative kernels: block cache
    construction, per-iteration vector transport, result assembly."""

    def __init__(self, edges: DataFrame, n: int | None, num_blocks: int | None):
        spark = edges.sparkSession
        self.spark = spark
        self.sc = spark.sparkContext
        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self.num_blocks = num_blocks
        self.local_mode = self.sc.master.startswith("local")
        self.tmpdir = None
        self._prev_path = None
        self._bcast = None
        self._iter = 0

        e = edges
        if n is None:
            mx = e.agg(F.max("src"), F.max("dst")).first()
            n = int(max(mx[0], mx[1])) + 1 if mx[0] is not None else 0
        self.n = n
        self.edges = e

    def build(self):
        e = self.edges
        self.narrow = self.n <= (1 << 31) - 1
        if self.narrow:
            e = e.select(
                F.col("src").cast("int").alias("src"),
                F.col("dst").cast("int").alias("dst"),
            )
        e = e.repartition(self.num_blocks, "dst").sortWithinPartitions("dst")
        self.blocks, self.idt = _build_blocks(e, self.narrow)
        if self.local_mode:
            # tmpfs (/dev/shm) over disk-backed /tmp: the per-iteration
            # vector file is pure transport (re-published every round) —
            # on disk its dirty-page WRITEBACK competes with the workers'
            # reads and makes iteration latency bimodal (measured: up to
            # 6x swings between identical reps). tmpfs is RAM: one copy,
            # no writeback, stable floors.
            base = "/dev/shm" if os.path.isdir("/dev/shm") else None
            self.tmpdir = tempfile.mkdtemp(prefix="pgb_vec_", dir=base)
        return self

    def publish(self, arr: np.ndarray):
        """Ship an n-vector to kernel tasks; returns (path, bcast) — pass
        both into the kernel closure and read with :meth:`fetch`."""
        self._release_prev()
        if self.local_mode:
            path = os.path.join(self.tmpdir, f"v_{self._iter}.npy")
            np.save(path, arr)
            self._iter += 1
            self._prev_path = path
            return path, None
        self._bcast = self.sc.broadcast(arr)
        return None, self._bcast

    @staticmethod
    def fetch(path, bcast) -> np.ndarray:
        return np.load(path, mmap_mode="r") if path is not None else bcast.value

    def memmap_file(self, name: str, dtype: str = "float64"):
        """Pre-sized raw buffer file in the engine tmpdir (local mode
        only) — the write-back half of the vector transport: kernel
        tasks open it ``mode='r+'`` and scatter their per-block results
        directly (dst-partitioned blocks are disjoint, so writes never
        race), which removes the per-iteration Arrow collect + driver
        merge from the serial path. Returns ``(path, ndarray view)``."""
        path = os.path.join(self.tmpdir, name)
        return path, np.memmap(path, dtype=dtype, mode="w+", shape=(self.n,))

    def covered_mask(self) -> np.ndarray:
        """Boolean n-mask: True where some block holds in-edges for the
        vertex (its scatter slot is owned by exactly one block)."""
        ids_tbl = self.blocks.select("uniq").toArrow()
        cov = np.zeros(self.n, dtype=bool)
        col = ids_tbl.column("uniq")
        for i in range(ids_tbl.num_rows):
            cov[np.frombuffer(col[i].as_buffer(), dtype="int64")] = True
        return cov

    def run(self, kernel, schema: str):
        """One iteration job: map ``kernel`` over the block cache, fetch
        results as a pyarrow Table (Arrow stream, not py4j pickling)."""
        return self.blocks.mapInArrow(kernel, schema).toArrow()

    def _release_prev(self):
        if self._bcast is not None:
            self._bcast.unpersist()
            self._bcast = None
        if self._prev_path:
            try:
                os.remove(self._prev_path)
            except OSError:
                pass
            self._prev_path = None

    def close(self):
        self.blocks.unpersist()
        self._release_prev()
        if self.tmpdir:
            shutil.rmtree(self.tmpdir, ignore_errors=True)


def _maybe_durable(ckpt, spark, iteration: int, name: str, n: int, vals, col, metrics):
    """Write a durable parquet state + manifest record on cadence; a
    metrics-only record otherwise (state lives driver-side as numpy).
    The dense id column is materialized only on cadence — allocating it
    every iteration would put an O(n) driver copy on the serial path."""
    if ckpt.on_cadence(iteration):
        df = spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype="int64"), col: np.asarray(vals)})
        )
        ckpt.save(iteration, {name: df}, metrics)
    else:
        ckpt.record(iteration, metrics)


def _incore_out_csr(edges: DataFrame, weighted: bool = False):
    """One Arrow pull of (src, dst[, val]) → driver-side OUT-adjacency CSR
    (n, indptr, dst, w): the frontier-expansion shape BFS/SSSP's in-core
    tiers gather from (the dst-keyed ``_incore_arrays`` is the opposite,
    gather-by-target, orientation pagerank/cc/lpa use)."""
    cols = ["src", "dst"] + (["val"] if weighted else [])
    tbl = edges.select(*cols).toArrow()
    src = np.asarray(tbl.column("src").to_numpy(zero_copy_only=False), dtype="int64")
    dst = np.asarray(tbl.column("dst").to_numpy(zero_copy_only=False), dtype="int64")
    w = (
        np.asarray(tbl.column("val").to_numpy(zero_copy_only=False), dtype="float64")
        if weighted
        else None
    )
    if len(src) == 0:
        z = np.zeros(0, dtype="int64")
        return 0, np.zeros(1, dtype="int64"), z, (np.zeros(0) if weighted else None)
    n = int(max(src.max(), dst.max())) + 1
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    if weighted:
        w = w[order]
    indptr = np.searchsorted(src, np.arange(n + 1, dtype="int64"))
    return n, indptr, dst, w


def _frontier_gather(indptr, frontier):
    """Edge indices out of every frontier vertex, plus the per-edge
    source repeat — the vectorized adjacency-slice concatenation."""
    starts = indptr[frontier]
    counts = indptr[frontier + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype="int64"), np.zeros(0, dtype="int64")
    offs = np.repeat(np.cumsum(counts) - counts, counts)
    idx = np.arange(total, dtype="int64") - offs + np.repeat(starts, counts)
    return idx, np.repeat(frontier, counts)


def _incore_arrays(edges: DataFrame):
    """One Arrow pull of (src, dst) → the same (uniq, starts, src) CSR
    arrays a single dst-block would hold, built driver-side. Feeds the
    in-core iteration tier (``INCORE_MAX_NNZ``)."""
    tbl = edges.select("src", "dst").toArrow()
    src = np.asarray(tbl.column("src").to_numpy(zero_copy_only=False), dtype="int64")
    dst = np.asarray(tbl.column("dst").to_numpy(zero_copy_only=False), dtype="int64")
    if len(dst) == 0:
        z = np.zeros(0, dtype="int64")
        return z, z, z
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]]).astype("int64")
    return dst[starts], starts, src


def _init_array(init, n: int, col: str, default):
    """Materialize a warm-start state vector: ``init`` is None (use
    ``default``), a length-n numpy array, or a DataFrame with columns
    (id, ``col``) — e.g. a state loaded by ``CheckpointManager.resume``.
    Ids absent from a DataFrame init keep the default value."""
    if init is None:
        return default  # caller passes a freshly built array
    if isinstance(init, np.ndarray):
        if len(init) != n:
            raise ValueError(f"init array length {len(init)} != n {n}")
        return init.astype(default.dtype, copy=True)
    tbl = init.select("id", col).toArrow()
    ids = np.asarray(tbl.column("id").to_numpy(zero_copy_only=False), dtype="int64")
    vals = np.asarray(
        tbl.column(col).to_numpy(zero_copy_only=False), dtype=default.dtype
    )
    out = default.copy()
    out[ids] = vals
    return out


def _incore_sym_arrays(edges: DataFrame, n: int):
    """One Arrow pull of the RAW directed edges → the symmetrized CSR
    arrays (uniq, starts, src), built driver-side: a packed-key
    ``np.unique`` replaces the Spark union+distinct shuffle AND the dst
    sort in one pass (keys ``dst*n+src`` sort by (dst, src) and dedup
    reciprocal duplicates exactly like ``_symmetrized().distinct()``).
    Requires ``n*n`` packable in int64 (n < 2^31)."""
    tbl = edges.select("src", "dst").toArrow()
    s = np.asarray(tbl.column("src").to_numpy(zero_copy_only=False), dtype="int64")
    d = np.asarray(tbl.column("dst").to_numpy(zero_copy_only=False), dtype="int64")
    if len(d) == 0:
        z = np.zeros(0, dtype="int64")
        return z, z, z
    K = np.unique(np.concatenate([d * n + s, s * n + d]))  # keyed (dst, src)
    dstk = K // n
    starts = np.flatnonzero(np.r_[True, dstk[1:] != dstk[:-1]]).astype("int64")
    return dstk[starts], starts, K % n


def _pagerank_incore_loop(
    spark, ckpt, n, uniq, starts, src, inv_d, teleport, tol, max_iters,
    rank0=None, it0: int = 0,
) -> np.ndarray:
    """Driver in-core rounds — identical update to the fused loop
    (teleport prefill + ``np.add.reduceat`` per dst segment), zero Spark
    jobs per iteration."""
    rank = rank0 if rank0 is not None else np.full(n, 1.0 / n, dtype="float64")
    for it in range(it0, it0 + max_iters):
        y = np.full(n, teleport, dtype="float64")
        if len(src):
            y[uniq] = teleport + np.add.reduceat(rank[src] * inv_d[src], starts)
        rdiff = float(np.abs(y - rank).sum())
        rank = y
        _maybe_durable(
            ckpt, spark, it + 1, "rank", n, rank, "rank", {"rdiff": rdiff, "n": n}
        )
        if rdiff <= tol:
            break
    return rank


#: engage the delta-frontier vote when fewer than n/DELTA_FRONTIER_DIV
#: labels changed last round (above it the full vote's single fused
#: pass is cheaper than frontier bookkeeping)
DELTA_FRONTIER_DIV = 8


def _affected_segments(uniq, starts, src, changed_sorted):
    """Delta-frontier selection: positions (into ``uniq``) of the dst
    segments containing at least one changed in-neighbor — the ONLY
    vertices whose next vote can differ (their input multiset is
    otherwise identical, and every update here is deterministic).
    Direction-safe: works off the dst-keyed CSR's own src lists, so it
    is exact for directed tables too (no symmetry assumption). Cost is
    one O(m log c) searchsorted + a reduceat — vs the full vote's
    O(m log m) sort every round."""
    if len(src) == 0 or len(changed_sorted) == 0:
        return np.empty(0, dtype="int64")
    pos = np.searchsorted(changed_sorted, src)
    hit = (pos < len(changed_sorted)) & (
        changed_sorted[np.minimum(pos, len(changed_sorted) - 1)] == src
    )
    return np.flatnonzero(np.maximum.reduceat(hit, starts))


def _label_incore_loop(
    spark, ckpt, n, uniq, starts, src, max_iters, block_fn, state_col,
    labels0=None, it0: int = 0, shortcut: bool = False,
):
    """Driver in-core label rounds (cc/lpa) — ``block_fn`` is the same
    per-block update the distributed loops run; here the single 'block'
    spans every dst. ``shortcut`` applies the CC pointer-jumping pass
    between rounds (see :func:`_contract_labels`; CC only).

    After the first (full) round, rounds run DELTA-FRONTIER: only dst
    segments with a changed in-neighbor re-vote
    (:func:`_affected_segments` — the north-star's shrink-per-round
    iteration); every other vertex's vote inputs are bit-identical to
    last round, so its deterministic winner is its current label.
    Labels changed by the CC contraction pass count into the next
    round's frontier (computed on the post-contraction vector).
    Returns (labels, converged)."""
    labels = labels0 if labels0 is not None else np.arange(n, dtype="int64")
    r = np.arange(n, dtype="int64") if shortcut else None
    ends = np.r_[starts[1:], len(src)] if len(starts) else starts
    frontier = None  # None = full vote (first round / warm-start)
    converged = False
    for it in range(it0, it0 + max_iters):
        new = labels.copy()  # uncovered vertices carry their label
        if len(src):
            if frontier is not None and len(frontier) < n // DELTA_FRONTIER_DIV:
                sel = _affected_segments(uniq, starts, src, frontier)
                if len(sel):
                    l = ends[sel] - starts[sel]
                    tot = int(l.sum())
                    off = np.cumsum(l) - l
                    flat = (
                        np.repeat(starts[sel], l)
                        + np.arange(tot)
                        - np.repeat(off, l)
                    )
                    new[uniq[sel]] = block_fn(
                        labels, uniq[sel], off, src[flat]
                    )
            else:
                new[uniq] = block_fn(labels, uniq, starts, src)
        changed = int((new != labels).sum())
        if shortcut and changed:
            _contract_labels(new, labels, r)
        frontier = np.flatnonzero(new != labels)
        labels = new
        _maybe_durable(
            ckpt, spark, it + 1, "labels", n, labels, state_col,
            {"changed": changed, "n": n},
        )
        if changed == 0:
            converged = True
            break
    return labels, converged


def pagerank_dense_kernel(
    edges: DataFrame,
    n: int | None = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    max_iters: int = 100,
    num_blocks: int | None = None,
    checkpoint=None,
    engine: "_BlockEngine | None" = None,
    init=None,
    start_iteration: int = 0,
) -> DataFrame:
    """PageRank over cached CSR blocks — zero shuffles per iteration.

    Returns (id: long, rank: double) for every vertex 0..n-1; identical
    results to ``algorithms.pagerank`` (same ``gap/prmark.py:8-30`` GAP
    formulation: damping, teleport, dangling leak, L1 convergence).
    Pass a pre-built ``engine`` (over the same directed edge table) to
    amortize the one-time block build across repeated runs.
    """
    import pyarrow as pa

    from pygraphblas_spark.plans.checkpoint import CheckpointManager, iteration_conf

    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="pagerank_kernel")

    with iteration_conf(spark):
        owned = engine is None
        # one cached scan feeds both setup passes (degree agg + block
        # build) instead of two reads of the source
        e_src = edges.select("src", "dst").persist() if owned else edges
        eng = engine or _BlockEngine(e_src, n, num_blocks)
        n = eng.n
        if n == 0:
            if owned:
                e_src.unpersist()
            return spark.createDataFrame([], "id long, rank double")

        teleport = (1.0 - damping) / n
        if (
            owned
            and eng.local_mode
            and INCORE_MAX_NNZ > 0  # <=0 disables the tier: skip the scan
            and e_src.count() <= INCORE_MAX_NNZ
        ):
            # in-core tier: one Arrow pull, then numpy-only rounds — a
            # local-mode Spark job costs more than a full small-graph
            # iteration (see INCORE_MAX_NNZ)
            uniq, starts, srcs = _incore_arrays(e_src)
            e_src.unpersist()
            deg = np.bincount(srcs, minlength=n)
            inv_d = np.zeros(n, dtype="float64")
            np.divide(damping, deg, out=inv_d, where=deg > 0)
            rank = _pagerank_incore_loop(
                spark, ckpt, n, uniq, starts, srcs, inv_d, teleport, tol,
                max_iters,
                rank0=_init_array(init, n, "rank", np.full(n, 1.0 / n, dtype="float64")),
                it0=start_iteration,
            )
            return spark.createDataFrame(
                pd.DataFrame({"id": np.arange(n, dtype="int64"), "rank": rank})
            )

        # out-degree → inv_d = damping/outdeg (0 for dangling; GAP leak)
        deg_pd = (
            e_src.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).toPandas()
        )
        inv_d = np.zeros(n, dtype="float64")
        inv_d[deg_pd["src"].to_numpy()] = damping / deg_pd["deg"].to_numpy(
            dtype="float64"
        )
        if owned:
            eng.build()
            e_src.unpersist()
        idt = eng.idt

        if eng.local_mode:
            rank = _pagerank_fused_loop(
                eng, spark, ckpt, n, inv_d, teleport, tol, max_iters, idt, owned,
                rank0=_init_array(init, n, "rank", np.full(n, 1.0 / n, dtype="float64")),
                it0=start_iteration,
            )
        else:
            rank = _pagerank_collect_loop(
                eng, spark, ckpt, n, inv_d, teleport, tol, max_iters, idt, owned,
                rank0=_init_array(init, n, "rank", np.full(n, 1.0 / n, dtype="float64")),
                it0=start_iteration,
            )
        return spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype="int64"), "rank": rank})
        )


def _pagerank_fused_loop(
    eng, spark, ckpt, n, inv_d, teleport, tol, max_iters, idt, owned,
    rank0=None, it0: int = 0,
) -> np.ndarray:
    """Local-mode iteration: kernel tasks scatter their per-block new
    ranks straight into a shared tmpfs memmap (disjoint dst slots — no
    races) and return only a per-block L1 residual. The serial path per
    iteration is two O(n) driver passes (w = rank·inv_d, teleport fill);
    there is NO per-iteration Arrow collect or driver-side merge. This
    is the node-local analog of each executor owning its dst-slice of
    the rank vector; the cross-node combine lives in the broadcast path.
    """
    import pyarrow as pa

    # static dst coverage → vertices with no in-edges hold exactly the
    # teleport mass every iteration; only the residual needs them
    uncov = np.flatnonzero(~eng.covered_mask())
    w_path, w_mm = eng.memmap_file("pr_w.f64")
    y_paths, y_mms = [], []
    for name in ("pr_y0.f64", "pr_y1.f64"):
        p, m = eng.memmap_file(name)
        y_paths.append(p)
        y_mms.append(m)
    y_mms[0][:] = rank0 if rank0 is not None else 1.0 / n
    cur = y_mms[0]
    try:
        # 0-based `it` keeps the prev/cur memmap parity; checkpoint
        # records are offset by it0 (warm start)
        for it in range(max_iters):
            prev, cur = y_mms[it % 2], y_mms[(it + 1) % 2]
            prev_path, cur_path = y_paths[it % 2], y_paths[(it + 1) % 2]
            np.multiply(prev, inv_d, out=w_mm)
            cur[:] = teleport  # dangling-in slots keep the base mass

            def spmv(batches, wp=w_path, pp=prev_path, cp=cur_path):
                wv = np.memmap(wp, dtype="float64", mode="r", shape=(n,))
                pv = np.memmap(pp, dtype="float64", mode="r", shape=(n,))
                out = np.memmap(cp, dtype="float64", mode="r+", shape=(n,))
                for b in batches:
                    for i in range(b.num_rows):
                        uniq = np.frombuffer(
                            b.column("uniq")[i].as_buffer(), dtype="int64"
                        )
                        starts = np.frombuffer(
                            b.column("starts")[i].as_buffer(), dtype="int64"
                        )
                        src = np.frombuffer(
                            b.column("src")[i].as_buffer(), dtype=idt
                        )
                        ynew = teleport + np.add.reduceat(wv[src], starts)
                        out[uniq] = ynew
                        rd = float(np.abs(ynew - pv[uniq]).sum())
                        yield pa.RecordBatch.from_arrays(
                            [pa.array([rd], type=pa.float64())], names=["rd"]
                        )
                out.flush()

            tbl = eng.run(spmv, "rd double")
            rdiff = float(sum(tbl.column("rd").to_pylist())) + float(
                np.abs(teleport - prev[uncov]).sum()
            )
            _maybe_durable(
                ckpt, spark, it0 + it + 1, "rank", n, cur, "rank",
                {"rdiff": rdiff, "n": n},
            )
            if rdiff <= tol:
                break
        return np.array(cur, dtype="float64")
    finally:
        if owned:
            eng.close()
        else:
            for p in [w_path] + y_paths:
                try:
                    os.remove(p)
                except OSError:
                    pass


def _pagerank_collect_loop(
    eng, spark, ckpt, n, inv_d, teleport, tol, max_iters, idt, owned,
    rank0=None, it0: int = 0,
) -> np.ndarray:
    """Cluster-mode iteration: broadcast the weighted vector, collect
    per-block (ids, vals) via Arrow, merge on the driver."""
    import pyarrow as pa

    rank = rank0 if rank0 is not None else np.full(n, 1.0 / n, dtype="float64")
    try:
        # 0-based `it` keeps the prev/cur memmap parity; checkpoint
        # records are offset by it0 (warm start)
        for it in range(max_iters):
            w_path, w_b = eng.publish(rank * inv_d)

            def spmv(batches):
                wv = _BlockEngine.fetch(w_path, w_b)
                for b in batches:
                    for i in range(b.num_rows):
                        uniq = np.frombuffer(
                            b.column("uniq")[i].as_buffer(), dtype="int64"
                        )
                        starts = np.frombuffer(
                            b.column("starts")[i].as_buffer(), dtype="int64"
                        )
                        src = np.frombuffer(
                            b.column("src")[i].as_buffer(), dtype=idt
                        )
                        sums = np.add.reduceat(wv[src], starts)
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array([uniq.tobytes()], type=pa.binary()),
                                pa.array([sums.tobytes()], type=pa.binary()),
                            ],
                            names=["ids", "vals"],
                        )

            tbl = eng.run(spmv, "ids binary, vals binary")
            y = np.full(n, teleport, dtype="float64")
            ids_col, vals_col = tbl.column("ids"), tbl.column("vals")
            for i in range(tbl.num_rows):
                ids = np.frombuffer(ids_col[i].as_buffer(), dtype="int64")
                y[ids] += np.frombuffer(vals_col[i].as_buffer(), dtype="float64")
            rdiff = float(np.abs(y - rank).sum())
            rank = y
            _maybe_durable(
                ckpt, spark, it0 + it + 1, "rank", n, rank, "rank",
                {"rdiff": rdiff, "n": n},
            )
            if rdiff <= tol:
                break
        return rank
    finally:
        eng.close() if owned else eng._release_prev()


def _cc_block_update(pv, uniq, starts, src):
    """Min-label diffusion per block: label[v] ← min(label[v], min over
    in-neighbors) — same fixpoint as the collect loop's driver merge."""
    return np.minimum(pv[uniq], np.minimum.reduceat(pv[src], starts))


def _contract_labels(new, old, r) -> None:
    """FastSV / Shiloach-Vishkin hook + contract between CC diffusion
    rounds, in place on ``new`` (this round's proposal vector, where
    ``new[v] = min(old[v], min over in-neighbors old[u])``):

    1. **hook**: every component root (current label VALUE) takes the
       min proposal over its members — an O(changed) scatter-min into
       the persistent identity scratch ``r``;
    2. **rebind**: ``new[v] ← min(new[v], r[old[v]])`` — the whole
       component adopts its root's improvement at once;
    3. **compress**: pointer-jump ``new[v] ← new[new[v]]`` to fixpoint,
       collapsing label-chain depth exponentially.

    Pure driver-side numpy on the vector the loop already holds between
    rounds — no Spark job. Valid for CC only: labels are vertex ids
    that never increase and always name a same-component vertex, so
    hooks and jumps preserve both invariants while convergence drops
    from O(component diameter) to O(log diameter) diffusion rounds —
    each avoided round is a full-edge-table job, so on path-shaped
    subgraphs this is the difference between 17 rounds and 5 (measured
    on the streaming probe's block-local batches). The diffusion-round
    fixpoint test is untouched: ``changed == 0`` still certifies labels
    constant across every edge, hence exact min-id components. NOT
    valid for LPA (labels are votes, not monotone component ids).
    ``r`` is reset to identity before return so callers reuse it across
    rounds without an O(n) pass."""
    idx = np.flatnonzero(new != old)
    if len(idx) == 0:
        return
    lc = old[idx]
    np.minimum.at(r, lc, new[idx])
    np.minimum(new, r[old], out=new)
    r[lc] = lc
    while True:
        nxt = new[new]
        if np.array_equal(nxt, new):
            return
        new[:] = nxt


def _resolve_label_pairs(a, b):
    """Exact min-label connected components of the (tiny) conflict-pair
    graph, driver-side vectorized numpy: returns ``(ids, resolved)``
    where ``resolved[i]`` is the minimum label reachable from ``ids[i]``
    through the pairs. Sizes here are the post-contraction conflict set
    (thousands), so the O(pairs + ids) rounds cost microseconds."""
    ids = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(ids, a)
    ib = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype="int64")
    while True:
        prev = lab
        q = np.arange(len(ids), dtype="int64")
        np.minimum.at(q, lab[ia], lab[ib])
        np.minimum.at(q, lab[ib], lab[ia])
        lab = np.minimum(lab, q[lab])
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, prev):
            break
    return ids, ids[lab]


def _conflict_finish(eng, n, cur, cur_path, idt) -> int:
    """One conflict-sweep job that FINISHES CC in place of the round
    tail: every edge whose endpoints currently disagree yields its
    (label_src, label_dst) pair (distinct per block); the driver
    union-finds that tiny label graph and rebinds members.

    Correct by construction: after the sweep's rebind, any two adjacent
    vertices share a label (their labels were unioned), so labels are
    constant per component; the group minimum is the component's min
    vertex id (labels are non-increasing same-component ids, so the min
    vertex's own label is itself and is a group member) — the same
    certificate an empty diffusion round gives, without running the
    O(log diameter) straggler rounds as separate jobs. Callers gate the
    sweep on a small ``changed`` count so the collected pair set stays
    bounded (conflicts only exist across still-active label frontiers;
    measured: changed=194k → 9.5k distinct pairs on a 1.5M-edge batch).
    Returns the number of distinct labels unioned."""
    import pyarrow as pa

    def sweep(batches, pp=cur_path, dt=idt):
        lv = np.memmap(pp, dtype="int64", mode="r", shape=(n,))
        for b in batches:
            for i in range(b.num_rows):
                uniq = np.frombuffer(
                    b.column("uniq")[i].as_buffer(), dtype="int64"
                )
                starts = np.frombuffer(
                    b.column("starts")[i].as_buffer(), dtype="int64"
                )
                src = np.frombuffer(b.column("src")[i].as_buffer(), dtype=dt)
                lu = lv[src]
                seg = np.zeros(len(src), dtype="int64")
                seg[starts[1:]] = 1
                ld = lv[uniq][np.cumsum(seg)]
                cf = lu != ld
                keys = (
                    np.unique(lu[cf] * n + ld[cf])
                    if cf.any()
                    else np.zeros(0, dtype="int64")
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array([keys.tobytes()], type=pa.binary())],
                    names=["pairs"],
                )

    tbl = eng.run(sweep, "pairs binary")
    col = tbl.column("pairs")
    keys = [
        np.frombuffer(col[i].as_buffer(), dtype="int64")
        for i in range(tbl.num_rows)
    ]
    keys = (
        np.unique(np.concatenate(keys)) if keys else np.zeros(0, dtype="int64")
    )
    if len(keys) == 0:
        return 0
    ids, resolved = _resolve_label_pairs(keys // n, keys % n)
    # rebind through a scratch map: label L -> its group min; every
    # member's label maps directly to the component min (see docstring),
    # so no further compression pass is needed
    rmap = np.arange(n, dtype="int64")
    rmap[ids] = resolved
    np.minimum(cur, rmap[cur], out=cur)
    return len(ids)


def _lpa_block_update(pv, uniq, starts, src, base):
    """Most-frequent-neighbor label with min tiebreak per block —
    identical math to the collect loop's ``vote`` kernel. Counts per
    (dst, label) are final within a block (dst-partitioned)."""
    seg = np.zeros(len(src), dtype="int64")
    seg[starts[1:]] = 1
    code = np.cumsum(seg)  # dense dst code per edge
    key = code * base + pv[src]
    kk, counts = np.unique(key, return_counts=True)
    kcode = kk // base
    g = np.flatnonzero(np.r_[True, kcode[1:] != kcode[:-1]])
    maxc = np.maximum.reduceat(counts, g)
    reps = np.diff(np.r_[g, len(counts)])
    is_max = counts == np.repeat(maxc, reps)
    idx = np.arange(len(counts))
    idx[~is_max] = len(counts)
    win_idx = np.minimum.reduceat(idx, g)
    # every uniq dst has ≥1 in-edge by construction, so kcode[g] covers
    # 0..len(uniq)-1 densely and the winner array aligns with uniq
    return kk[win_idx] % base


def _fused_label_loop(
    eng, spark, ckpt, n, max_iters, block_fn, idt, state_col, owned,
    labels0=None, it0: int = 0, shortcut: bool = False,
):
    """Local-mode label iteration shared by cc/lpa: kernel tasks read
    the previous labels from one tmpfs memmap and scatter their
    per-block new labels straight into the other (dst-partitioned
    blocks own disjoint slots — writes never race), returning only a
    per-block changed count. The serial path per iteration is one O(n)
    memcpy (carry-over for vertices with no in-edges); there is NO
    per-iteration Arrow collect or driver-side merge — the label-typed
    twin of ``_pagerank_fused_loop``.

    ``block_fn(pv, uniq, starts, src) -> new_labels`` computes the
    per-block update from the previous full vector ``pv``. ``shortcut``
    applies the CC pointer-jumping pass between rounds (see
    :func:`_contract_labels`; CC only — the jump happens on the driver's
    memmap view, so kernel tasks read the compressed labels next round).
    Returns ``(labels, converged)``.
    """
    import pyarrow as pa

    paths, mms = [], []
    for name in ("lab0.i64", "lab1.i64"):
        p, m = eng.memmap_file(name, dtype="int64")
        paths.append(p)
        mms.append(m)
    mms[0][:] = labels0 if labels0 is not None else np.arange(n, dtype="int64")
    cur = mms[0]
    r = np.arange(n, dtype="int64") if shortcut else None
    converged = False
    try:
        # 0-based `it` keeps the prev/cur memmap parity; checkpoint
        # records are offset by it0 (warm start)
        for it in range(max_iters):
            prev, cur = mms[it % 2], mms[(it + 1) % 2]
            prev_path, cur_path = paths[it % 2], paths[(it + 1) % 2]
            np.copyto(cur, prev)  # uncovered vertices carry their label

            def step(batches, pp=prev_path, cp=cur_path, fn=block_fn, dt=idt):
                pv = np.memmap(pp, dtype="int64", mode="r", shape=(n,))
                out = np.memmap(cp, dtype="int64", mode="r+", shape=(n,))
                for b in batches:
                    for i in range(b.num_rows):
                        uniq = np.frombuffer(
                            b.column("uniq")[i].as_buffer(), dtype="int64"
                        )
                        starts = np.frombuffer(
                            b.column("starts")[i].as_buffer(), dtype="int64"
                        )
                        src = np.frombuffer(
                            b.column("src")[i].as_buffer(), dtype=dt
                        )
                        newv = fn(pv, uniq, starts, src)
                        out[uniq] = newv
                        yield pa.RecordBatch.from_arrays(
                            [pa.array(
                                [int((newv != pv[uniq]).sum())],
                                type=pa.int64(),
                            )],
                            names=["changed"],
                        )
                out.flush()

            tbl = eng.run(step, "changed long")
            changed = int(sum(tbl.column("changed").to_pylist()))
            if shortcut and changed:
                _contract_labels(cur, prev, r)
                if changed <= max(1024, n >> 4):
                    # shrinking active set: one conflict sweep finishes
                    # the component merge exactly (see _conflict_finish),
                    # replacing the O(log diameter) remaining rounds —
                    # each a full Spark job. The n/16 gate bounds the
                    # driver collect (post-contraction conflict pairs
                    # shrink with the active set — measured 194k changed
                    # → 9.5k pairs on a 1.5M-edge batch) and was measured
                    # faster than sweeping a round earlier: the larger
                    # pair set + full-scale contraction cost more driver
                    # time than the one diffusion job they replace
                    swept = _conflict_finish(eng, n, cur, cur_path, idt)
                    _maybe_durable(
                        ckpt, spark, it0 + it + 1, "labels", n, cur,
                        state_col,
                        {"changed": 0, "n": n, "presweep_changed": changed,
                         "swept_labels": swept},
                    )
                    converged = True
                    break
            _maybe_durable(
                ckpt, spark, it0 + it + 1, "labels", n, cur, state_col,
                {"changed": changed, "n": n},
            )
            if changed == 0:
                converged = True
                break
        return np.array(cur, dtype="int64"), converged
    finally:
        if owned:
            eng.close()
        else:
            for p in paths:
                try:
                    os.remove(p)
                except OSError:
                    pass


def _symmetrized(edges: DataFrame, directed: bool) -> DataFrame:
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    return e


def cc_dense_kernel(
    edges: DataFrame,
    n: int | None = None,
    max_iters: int = 100,
    directed: bool = False,
    num_blocks: int | None = None,
    checkpoint=None,
    engine: "_BlockEngine | None" = None,
    init=None,
    start_iteration: int = 0,
) -> DataFrame:
    """Connected components — min-label diffusion over cached CSR blocks.

    Same fixpoint as ``algorithms.connected_components`` (MIN_SECOND
    semiring mxv iterated, SURVEY.md §2.11): label[v] ← min(label[v],
    min over in-neighbors). Per iteration: publish labels, one narrow
    ``np.minimum.reduceat`` pass per block, O(n) driver merge. Returns
    (id: long, component: long), exact deterministic labels.
    """
    import pyarrow as pa

    from pygraphblas_spark.plans.checkpoint import CheckpointManager, iteration_conf

    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="cc_kernel")

    with iteration_conf(spark):
        owned = engine is None
        eng = engine or _BlockEngine(_symmetrized(edges, directed), n, num_blocks)
        n = eng.n
        if n == 0:
            return spark.createDataFrame([], "id long, component long")
        sym = None
        incore = None
        # INCORE_MAX_NNZ <= 0 disables the in-core tier outright — skip
        # its count probes too (each is a full input scan, pure waste
        # when the answer is predetermined)
        if owned and eng.local_mode and INCORE_MAX_NNZ > 0:
            if not directed and n < (1 << 31):
                # sym nnz <= 2x raw nnz: when even the bound fits
                # in-core, symmetrize+dedup+sort driver-side in ONE
                # np.unique off a raw-edge pull — no shuffle at all
                if 2 * edges.count() <= INCORE_MAX_NNZ:
                    incore = _incore_sym_arrays(edges, n)
            if incore is None:
                # persist spans the count probe AND (on fall-through)
                # the block build, so the symmetrize+distinct runs once
                sym = eng.edges.persist()
                if sym.count() <= INCORE_MAX_NNZ:
                    incore = _incore_arrays(sym)
                    sym.unpersist()
                    sym = None
            if incore is not None:
                uniq, starts, srcs = incore
                labels, converged = _label_incore_loop(
                    spark, ckpt, n, uniq, starts, srcs, max_iters,
                    _cc_block_update, "component",
                    labels0=_init_array(init, n, "component", np.arange(n, dtype="int64")),
                    it0=start_iteration, shortcut=True,
                )
                if not converged:
                    import warnings

                    warnings.warn(
                        f"cc_dense_kernel: not converged after {max_iters} "
                        "iterations — components may be split; raise "
                        "max_iters (graph diameter bounds the iteration "
                        "count)",
                        RuntimeWarning,
                    )
                return spark.createDataFrame(
                    pd.DataFrame(
                        {"id": np.arange(n, dtype="int64"), "component": labels}
                    )
                )
        if owned:
            eng.build()
        if sym is not None:
            sym.unpersist()
        idt = eng.idt

        if eng.local_mode:
            labels, converged = _fused_label_loop(
                eng, spark, ckpt, n, max_iters,
                _cc_block_update, idt, "component", owned,
                labels0=_init_array(init, n, "component", np.arange(n, dtype="int64")),
                it0=start_iteration, shortcut=True,
            )
            if not converged:
                import warnings

                warnings.warn(
                    f"cc_dense_kernel: not converged after {max_iters} "
                    "iterations — components may be split; raise "
                    "max_iters (graph diameter bounds the iteration "
                    "count)",
                    RuntimeWarning,
                )
            return spark.createDataFrame(
                pd.DataFrame({"id": np.arange(n, dtype="int64"), "component": labels})
            )

        labels = _init_array(
            init, n, "component", np.arange(n, dtype="int64")
        )
        r = np.arange(n, dtype="int64")
        try:
            for it in range(max_iters):
                l_path, l_b = eng.publish(labels)

                def diffuse(batches):
                    lv = _BlockEngine.fetch(l_path, l_b)
                    for b in batches:
                        for i in range(b.num_rows):
                            uniq = np.frombuffer(
                                b.column("uniq")[i].as_buffer(), dtype="int64"
                            )
                            starts = np.frombuffer(
                                b.column("starts")[i].as_buffer(), dtype="int64"
                            )
                            src = np.frombuffer(
                                b.column("src")[i].as_buffer(), dtype=idt
                            )
                            mins = np.minimum.reduceat(lv[src], starts)
                            yield pa.RecordBatch.from_arrays(
                                [
                                    pa.array([uniq.tobytes()], type=pa.binary()),
                                    pa.array([mins.tobytes()], type=pa.binary()),
                                ],
                                names=["ids", "vals"],
                            )

                tbl = eng.run(diffuse, "ids binary, vals binary")
                new = labels.copy()
                ids_col, vals_col = tbl.column("ids"), tbl.column("vals")
                for i in range(tbl.num_rows):
                    ids = np.frombuffer(ids_col[i].as_buffer(), dtype="int64")
                    cand = np.frombuffer(vals_col[i].as_buffer(), dtype="int64")
                    new[ids] = np.minimum(new[ids], cand)
                changed = int((new < labels).sum())
                if changed:
                    _contract_labels(new, labels, r)
                labels = new
                _maybe_durable(
                    ckpt, spark, start_iteration + it + 1, "labels",
                    n, labels, "component",
                    {"changed": changed, "n": n},
                )
                if changed == 0:
                    break
            else:
                import warnings

                warnings.warn(
                    f"cc_dense_kernel: not converged after {max_iters} "
                    f"iterations ({changed} labels still changing) — "
                    "components may be split; raise max_iters (graph "
                    "diameter bounds the iteration count)",
                    RuntimeWarning,
                )
        finally:
            eng.close() if owned else eng._release_prev()

        return spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype="int64"), "component": labels})
        )


def lpa_dense_kernel(
    edges: DataFrame,
    n: int | None = None,
    max_iters: int = 20,
    directed: bool = False,
    num_blocks: int | None = None,
    checkpoint=None,
    engine: "_BlockEngine | None" = None,
    init=None,
    start_iteration: int = 0,
) -> DataFrame:
    """Synchronous LPA over cached CSR blocks — most-frequent neighbor
    label, ties to the smallest label (deterministic, identical to
    ``algorithms.label_propagation``).

    Per block and iteration: neighbor labels are gathered, folded into
    composite keys ``dst_code·(n+1)+label`` and counted with one
    ``np.unique`` pass; the per-dst argmax-with-min-tiebreak is a pair of
    ``reduceat``\\ s. Counts per (dst, label) are final within a block
    (dst-partitioned), so no cross-block combine is needed.
    """
    import pyarrow as pa

    from pygraphblas_spark.plans.checkpoint import CheckpointManager, iteration_conf

    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="lpa_kernel")

    with iteration_conf(spark):
        owned = engine is None
        eng = engine or _BlockEngine(_symmetrized(edges, directed), n, num_blocks)
        n = eng.n
        if n == 0:
            return spark.createDataFrame([], "id long, label long")
        base = n + 1
        sym = None
        incore = None
        # see cc_dense_kernel: <=0 disables the in-core tier, skip probes
        if owned and eng.local_mode and INCORE_MAX_NNZ > 0:
            from functools import partial

            if not directed and n < (1 << 31):
                # see cc_dense_kernel: shuffle-free driver symmetrize
                if 2 * edges.count() <= INCORE_MAX_NNZ:
                    incore = _incore_sym_arrays(edges, n)
            if incore is None:
                sym = eng.edges.persist()
                if sym.count() <= INCORE_MAX_NNZ:
                    incore = _incore_arrays(sym)
                    sym.unpersist()
                    sym = None
            if incore is not None:
                uniq, starts, srcs = incore
                labels, _ = _label_incore_loop(
                    spark, ckpt, n, uniq, starts, srcs, max_iters,
                    partial(_lpa_block_update, base=base), "label",
                    labels0=_init_array(init, n, "label", np.arange(n, dtype="int64")),
                    it0=start_iteration,
                )
                return spark.createDataFrame(
                    pd.DataFrame(
                        {"id": np.arange(n, dtype="int64"), "label": labels}
                    )
                )
        if owned:
            eng.build()
        if sym is not None:
            sym.unpersist()
        idt = eng.idt

        if eng.local_mode:
            from functools import partial

            labels, _ = _fused_label_loop(
                eng, spark, ckpt, n, max_iters,
                partial(_lpa_block_update, base=base), idt, "label", owned,
                labels0=_init_array(init, n, "label", np.arange(n, dtype="int64")),
                it0=start_iteration,
            )
            return spark.createDataFrame(
                pd.DataFrame({"id": np.arange(n, dtype="int64"), "label": labels})
            )

        labels = _init_array(
            init, n, "label", np.arange(n, dtype="int64")
        )
        try:
            for it in range(max_iters):
                l_path, l_b = eng.publish(labels)

                def vote(batches):
                    lv = _BlockEngine.fetch(l_path, l_b)
                    for b in batches:
                        for i in range(b.num_rows):
                            uniq = np.frombuffer(
                                b.column("uniq")[i].as_buffer(), dtype="int64"
                            )
                            starts = np.frombuffer(
                                b.column("starts")[i].as_buffer(), dtype="int64"
                            )
                            src = np.frombuffer(
                                b.column("src")[i].as_buffer(), dtype=idt
                            )
                            seg = np.zeros(len(src), dtype="int64")
                            seg[starts[1:]] = 1
                            code = np.cumsum(seg)  # dense dst code per edge
                            key = code * base + lv[src]
                            kk, counts = np.unique(key, return_counts=True)
                            kcode = kk // base
                            g = np.flatnonzero(
                                np.r_[True, kcode[1:] != kcode[:-1]]
                            )
                            maxc = np.maximum.reduceat(counts, g)
                            # first index per group where count == group max
                            # (keys sorted → labels ascending → min tiebreak)
                            reps = np.diff(np.r_[g, len(counts)])
                            is_max = counts == np.repeat(maxc, reps)
                            idx = np.arange(len(counts))
                            idx[~is_max] = len(counts)
                            win_idx = np.minimum.reduceat(idx, g)
                            winner = kk[win_idx] % base
                            yield pa.RecordBatch.from_arrays(
                                [
                                    pa.array([uniq[kcode[g]].tobytes()], type=pa.binary()),
                                    pa.array([winner.tobytes()], type=pa.binary()),
                                ],
                                names=["ids", "vals"],
                            )

                tbl = eng.run(vote, "ids binary, vals binary")
                new = labels.copy()
                ids_col, vals_col = tbl.column("ids"), tbl.column("vals")
                for i in range(tbl.num_rows):
                    ids = np.frombuffer(ids_col[i].as_buffer(), dtype="int64")
                    new[ids] = np.frombuffer(vals_col[i].as_buffer(), dtype="int64")
                changed = int((new != labels).sum())
                labels = new
                _maybe_durable(
                    ckpt, spark, start_iteration + it + 1, "labels",
                    n, labels, "label",
                    {"changed": changed, "n": n},
                )
                if changed == 0:
                    break
        finally:
            eng.close() if owned else eng._release_prev()

        return spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype="int64"), "label": labels})
        )
