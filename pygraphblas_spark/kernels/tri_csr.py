"""Triangle counting over CSR segments — the kernel tiers behind
``algorithms.triangle_count``.

Same algebra as the reference Sandia form (``L.mxm(L, mask=L,
PLUS_PAIR)`` — demo/TriangleCentrality.ipynb cell 17) and the same
degree-ordered orientation as the DataFrame plan (bounds every out-list
by O(sqrt(m)), killing hub wedge explosion). What the kernels change is
the physical execution: instead of a wedge self-JOIN + closing semi-join
(three shuffles, JVM row processing), wedges are enumerated with
vectorized numpy inside each pivot segment and closed with a two-level
CSR probe — O(1) row-pointer gather, then a short vectorized binary
search inside the tip's out-list (log2(max out-degree) cache-local
gathers per wedge, not log2(m) random ones).

Tiers:

- **in-core** (local mode, sym edges <= ``INCORE_MAX_NNZ``): one Arrow
  pull, symmetrize/orient/count entirely in numpy. A 2.6M-edge graph
  counts in well under a second vs ~9 s for the join plan (local-mode
  per-job floors + shuffle costs dominate at that scale).
- **blocked** (anything larger, n small enough to pack pair keys into
  int64): orientation happens in Spark (degree joins — scales), then
  each src-partitioned block enumerates its wedges in a ``mapInArrow``
  task against ONE shared copy of the sorted key array (tmpfs mmap in
  local mode, torrent broadcast on a cluster — shipped once; this is a
  one-shot algorithm, not an iteration loop).
- caller falls back to the pure-DataFrame plan when keys cannot pack
  (``n*n`` overflowing int64) or the oriented set is too large to share.

Both tiers work in (deg, id)-rank-relabelled id space: the oriented
closing edge between wedge tips (a, b) with a < b can only point a→b,
so membership is ONE probe per wedge, and each triangle is counted
exactly once at its lowest-rank pivot.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-chunk wedge budget for the vectorized enumerate. Small on
#: purpose: each probe iteration materializes ~10 temporaries of chunk
#: size, and past ~1M elements those cross glibc's mmap threshold, so
#: every iteration page-faults + zeroes fresh maps instead of reusing
#: arena blocks (measured on the 52M-edge probe graph: 262k-chunks beat
#: 8M-chunks 2.27s vs 3.01s at 8 workers and 8.2s vs 26.1s at 2 —
#: and restore near-linear thread scaling). 256k x 8B temps stay ~2MB,
#: inside the allocator's reuse path and the per-core L2/L3 slice.
WEDGE_CHUNK = int(os.environ.get("PGB_TRI_WEDGE_CHUNK", "262144"))

#: above this many oriented edges the shared probe index (4B/edge dst
#: plus the (n+1)·8B row pointer) stops being reasonable to ship to
#: every node; callers fall back to the DataFrame join plan
BLOCKED_MAX_ORIENTED = int(os.environ.get("PGB_TRI_MAX_ORIENTED", "400000000"))


def _parse_mem(s: str) -> int:
    """Spark memory string → bytes. Accepts every suffix Spark's
    JavaUtils.byteStringAsBytes does for ``spark.driver.memory``:
    "4g"/"4gb", "512m"/"512mb", "1024k"/"1024kb", "2t"/"2tb",
    "1048576b", or plain bytes."""
    s = s.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s.endswith("b") and len(s) > 1 and s[-2] in mult:
        return int(float(s[:-2]) * mult[s[-2]])
    if s.endswith("b") and len(s) > 1 and s[-2].isdigit():
        return int(float(s[:-1]))
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(float(s))


def blocked_driver_cap(spark, n: int) -> int:
    """Max oriented edges the DRIVER-COLLECT fallback of the blocked
    tier may hold, derived from ``spark.driver.memory`` instead of a
    silent fixed constant: the collect materializes the Arrow table
    (16B/edge transient), the CSR index (4B/edge dst + 8·(n+1) ptr),
    and a broadcast copy of the index — budgeted at 25% of driver
    memory so the peak (~24B/edge + 16B/vertex) cannot silently OOM a
    small driver. The task-side shared-filesystem dump
    (``_dump_sorted_index_fs``) has no such cap — only the fallback
    does."""
    try:
        mem = _parse_mem(spark.sparkContext.getConf().get("spark.driver.memory", "1g"))
    except Exception:
        mem = 1 << 30
    budget = mem // 4
    cap = max(0, (budget - 16 * n) // 24)
    return min(cap, BLOCKED_MAX_ORIENTED)


def _csr_index(keys: np.ndarray, n: int):
    """Split a sorted packed-key array into the two-level CSR probe
    index: ``ptr`` (int64, len n+1 — row pointer per tip-a) and ``dsts``
    (the b side, int32 when it fits). Probing (a, b) then costs ONE O(1)
    ``ptr`` gather plus a binary search inside a's short out-list —
    ~log2(max out-degree) gathers in contiguous memory instead of
    log2(m) random probes across the full key array. With degree-ordered
    orientation max out-degree is O(sqrt(m)), and in practice tiny."""
    return _csr_index_cols(keys // n, keys % n, n)


def _csr_index_cols(src: np.ndarray, dst: np.ndarray, n: int):
    """CSR probe index from (src, dst) columns already sorted by
    (src, dst) — the shape Spark's parallel ``orderBy`` delivers, so the
    driver never sorts, packs, or divides: one bincount + cumsum +
    narrowing cast, all O(m) sequential passes."""
    counts = np.bincount(src, minlength=n)
    ptr = np.zeros(n + 1, dtype="int64")
    np.cumsum(counts, out=ptr[1:])
    dt = "int32" if n <= (1 << 31) - 1 else "int64"
    dsts = dst.astype(dt, copy=False)
    return ptr, dsts


def _closures_for_segments(
    dst: np.ndarray,
    starts: np.ndarray,
    ptr: np.ndarray,
    dsts: np.ndarray,
    threads: int = 1,
) -> int:
    """Count closed wedges for pivot segments (``dst`` split at
    ``starts``) against the CSR probe index (``ptr``, ``dsts``) built by
    :func:`_csr_index`.

    Vectorized pair enumeration: wedge offsets within each segment are
    decoded to (i, j) index pairs with the triangular-number inverse —
    O(1) numpy ops per wedge, chunked to ``WEDGE_CHUNK``. Ids are
    (deg, id)-rank-relabelled and segment dst lists sorted ascending, so
    the closing edge between wedge tips (a, b) with a < b can only be
    oriented a→b: ONE membership probe per wedge. The probe is a manual
    vectorized lower-bound loop over each a's short out-list slice —
    iteration count is log2 of the LONGEST out-list, and every gather
    lands in a's few cache lines. ``threads`` fans chunks out over a
    thread pool (the heavy numpy ops release the GIL).
    """
    if len(dst) == 0 or len(dsts) == 0:
        return 0
    d = np.diff(np.r_[starts, len(dst)])
    c = d * (d - 1) // 2  # wedges per segment
    seg_end = np.cumsum(c)
    seg_begin = seg_end - c
    W = int(seg_end[-1]) if len(seg_end) else 0
    if W == 0:
        return 0
    seg_max = int(np.max(np.diff(ptr))) if len(ptr) > 1 else 0
    probe_iters = max(1, int(np.ceil(np.log2(seg_max + 1)))) if seg_max else 0

    def one_chunk(pos: int, hi: int) -> int:
        # segments overlapping [pos, hi)
        s0 = int(np.searchsorted(seg_end, pos, side="right"))
        s1 = int(np.searchsorted(seg_begin, hi, side="left"))
        segs = np.arange(s0, s1)
        # wedge ids of this chunk, per segment
        lo_w = np.maximum(seg_begin[segs], pos)
        hi_w = np.minimum(seg_end[segs], hi)
        cnt = hi_w - lo_w
        seg_of = np.repeat(segs, cnt)
        woff = (
            np.arange(pos, hi, dtype="int64")
            - np.repeat(seg_begin[segs], cnt)
        )
        # triangular decode: pairs ordered (j ascending, i < j)
        j = ((1.0 + np.sqrt(1.0 + 8.0 * woff.astype("float64"))) / 2.0).astype(
            "int64"
        )
        j -= (j * (j - 1) // 2 > woff).astype("int64")
        i = woff - j * (j - 1) // 2
        base = starts[seg_of]
        a = dst[base + i]
        b = dst[base + j].astype(dsts.dtype, copy=False)
        # vectorized lower_bound of b within dsts[ptr[a]:ptr[a+1]]
        lo = ptr[a]
        hib = ptr[a + 1]
        end = hib - 1
        for _ in range(probe_iters):
            mid = (lo + hib) >> 1
            v = dsts[np.minimum(mid, end)]
            go_right = (lo < hib) & (v < b)
            stay = (lo < hib) & ~go_right
            lo = np.where(go_right, mid + 1, lo)
            hib = np.where(stay, mid, hib)
        hit = (lo <= end) & (dsts[np.minimum(lo, end)] == b)
        return int(hit.sum())

    # chunk small enough that the pool actually engages: ~3 chunks per
    # thread for load balance, floored at 256k wedges so per-chunk numpy
    # overhead stays negligible, capped at WEDGE_CHUNK to bound memory
    chunk = min(WEDGE_CHUNK, max(1 << 18, -(-W // (max(1, threads) * 3))))
    bounds = list(range(0, W, chunk))
    chunks = [(p, min(p + chunk, W)) for p in bounds]
    if threads > 1 and len(chunks) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as ex:
            return sum(ex.map(lambda ph: one_chunk(*ph), chunks))
    return sum(one_chunk(p, h) for p, h in chunks)


def _segments_from_sorted(u: np.ndarray, v: np.ndarray):
    """(starts, dst) for pivot segments of a (u-sorted) edge list."""
    if len(u) == 0:
        z = np.zeros(0, dtype="int64")
        return z, z
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]).astype("int64")
    return starts, v


def triangle_count_incore(
    edges_pd_src: np.ndarray,
    edges_pd_dst: np.ndarray,
    n: int,
    threads: int | None = None,
) -> int:
    """In-core tier: symmetrize, degree-orient, enumerate, close — all
    numpy. ``edges_*`` are the RAW (directed, possibly duplicated) edge
    arrays; ids must be < n with n*n packable in int64.

    Works in (deg, id)-rank-relabelled id space: orientation becomes
    simply rank_u < rank_v and the closure needs one membership probe
    per wedge (see ``_closures_for_segments``). Chunks fan out over
    ``threads`` GIL-releasing numpy workers.
    """
    s = np.asarray(edges_pd_src, dtype="int64")
    d = np.asarray(edges_pd_dst, dtype="int64")
    keep = s != d
    s, d = s[keep], d[keep]
    if len(s) == 0:
        return 0
    # undirected edge set, both directions, deduped via packed keys
    K = np.unique(np.concatenate([s * n + d, d * n + s]))
    us = K // n
    vs = K % n
    deg = np.bincount(us, minlength=n)  # undirected degree
    # (deg, id) dense rank: stable argsort ties break by id
    perm = np.argsort(deg, kind="stable")
    rank = np.empty(n, dtype="int64")
    rank[perm] = np.arange(n, dtype="int64")
    ru, rv = rank[us], rank[vs]
    cond = ru < rv  # orient low (deg, id) -> high (deg, id)
    ko = np.sort(ru[cond] * n + rv[cond])  # oriented keys, rank space
    starts, dst = _segments_from_sorted(ko // n, ko % n)
    ptr, dsts = _csr_index(ko, n)
    if threads is None:
        threads = min(16, os.cpu_count() or 1)
    return _closures_for_segments(dst, starts, ptr, dsts, threads=threads)


#: rank tables at or below this many rows go broadcast into the two
#: relabel joins (map-side, no shuffle of the big edge table); above it
#: the joins shuffle — building + shipping a multi-million-row broadcast
#: hash relation is serial driver work (measured: a 4M-row rank
#: broadcast cost ~15 s vs parallel shuffle joins at 52M edges), so the
#: cutoff stays at the size where the build is genuinely cheap
BCAST_RANK_MAX = int(os.environ.get("PGB_TRI_BCAST_RANK_MAX", "1000000"))


def _oriented_ranked_df(edges: DataFrame, num_buckets: int = 32, n: int | None = None):
    """Spark-side degree-ordered orientation in (deg, id)-RANK space.

    Fully distributed and shuffle-lean: ONE distinct over canonical
    undirected pairs (least, greatest) — half the rows of the
    symmetrize-both-directions plan — then degree via explode, a dense
    (deg, id) rank built with the bucketed row_number + prefix-offset
    pattern (no global window), and two relabel joins that broadcast
    the rank table when it fits (``BCAST_RANK_MAX``). Emitted edge ids
    ARE the (deg, id) total order, so orientation is simply
    ``rank_src < rank_dst`` and the kernel closes each wedge with ONE
    key probe (``_closures_for_segments(ranked=True)``).

    Returns (oriented_df, n_ranked, pinned) — ids in [0, n_ranked);
    ``pinned`` DataFrames must stay persisted until the caller has
    materialized ``oriented_df``."""
    from pyspark.sql import Window

    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if n is not None:
        # dedup on ONE packed int64 column — half the shuffle bytes of
        # a two-column distinct (the tier already requires packable ids)
        packed = e.select(
            (F.least("src", "dst") * n + F.greatest("src", "dst")).alias("k")
        ).distinct()
        # integer `div`, NOT float division (which rounds at large n)
        canon = packed.select(
            F.expr(f"k div {n}").alias("a"), F.pmod("k", F.lit(n)).alias("b")
        ).persist()
    else:
        canon = e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct().persist()
    deg = (
        canon.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    part = (
        deg.repartitionByRange(num_buckets, "deg", "v")
        .withColumn("part", F.spark_partition_id())
        .persist()
    )
    counts = part.groupBy("part").agg(F.count(F.lit(1)).alias("cnt"))
    # prefix window runs over the tiny per-bucket count table only
    prefix = Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "part", F.coalesce(F.sum("cnt").over(prefix), F.lit(0)).alias("off")
    )
    n_ranked = int(part.count())
    wp = Window.partitionBy("part").orderBy("deg", "v")
    rank = (
        part.withColumn("rn", F.row_number().over(wp))
        .join(F.broadcast(offsets), "part")
        .select("v", (F.col("off") + F.col("rn") - 1).alias("r"))
    )
    if n_ranked <= BCAST_RANK_MAX:
        rank = F.broadcast(rank)
    ranked = (
        canon.join(rank.withColumnsRenamed({"v": "u1", "r": "ra"}), canon["a"] == F.col("u1"))
        .join(rank.withColumnsRenamed({"v": "u2", "r": "rb"}), canon["b"] == F.col("u2"))
        .select("ra", "rb")
    )
    oriented = ranked.select(
        F.least("ra", "rb").alias("src"), F.greatest("ra", "rb").alias("dst")
    )
    return oriented, n_ranked, [canon, part]


def _dump_sorted_index(oriented: DataFrame, n: int, tmpdir: str):
    """Materialize the shared CSR probe index WITHOUT funnelling the
    oriented edge set through a driver collect.

    Spark range-sorts (src, dst) in parallel; each output partition then
    writes its dst column (int32) plus a run-length (src, count) summary
    straight to ``tmpdir`` (tmpfs locally; on a real cluster this is the
    shared-filesystem / shuffle-storage equivalent) from inside the task.
    The driver only stitches: per-partition dst blocks are memcpy'd in
    partition order into one memmap, and ``ptr`` is a bincount of the
    concatenated run-lengths (a src whose run straddles a partition
    boundary appears in both RLEs; bincount sums the pieces). Driver work
    is O(m) sequential byte copies at page-cache speed — the previous
    ``toArrow`` collect + column conversion was a fixed ~14 s serial term
    at 29M oriented edges, identical at every parallelism level, and the
    single biggest Amdahl cap on measured 2→8-core scaling.

    Returns (ptr_path, dst_path)."""
    import pyarrow as pa
    from pyspark import TaskContext

    def dump(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        att = ctx.taskAttemptId()
        us, vs = [], []
        for bt in batches:
            us.append(bt.column("src").to_numpy(zero_copy_only=False))
            vs.append(bt.column("dst").to_numpy(zero_copy_only=False))
        cnt = 0
        if us:
            u = np.asarray(np.concatenate(us), dtype="int64")
            v = np.asarray(np.concatenate(vs), dtype="int64")
            cnt = len(u)
            dt = "int32" if n <= (1 << 31) - 1 else "int64"
            # atomic publish (tmp+rename); tmp names carry the task
            # ATTEMPT id so a speculative/retried attempt racing the
            # original can't interleave writes into one tmp file —
            # whichever rename lands last publishes a complete file
            # with identical (deterministically sorted) content
            dtmp = os.path.join(tmpdir, f".dst_{pid:05d}.{att}.tmp")
            v.astype(dt, copy=False).tofile(dtmp)
            os.rename(dtmp, os.path.join(tmpdir, f"dst_{pid:05d}.bin"))
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            runs = np.diff(np.r_[starts, cnt]).astype("int64")
            rtmp = os.path.join(tmpdir, f".rle_{pid:05d}.{att}.tmp")
            with open(rtmp, "wb") as fh:
                np.savez(fh, srcs=u[starts], runs=runs)
            os.rename(rtmp, os.path.join(tmpdir, f"rle_{pid:05d}.npz"))
        yield pa.RecordBatch.from_arrays(
            [pa.array([pid], type=pa.int32()), pa.array([cnt], type=pa.int64())],
            names=["pid", "cnt"],
        )

    parts = sorted(
        (r["pid"], r["cnt"])
        for r in oriented.select("src", "dst")
        .orderBy("src", "dst")
        .mapInArrow(dump, "pid int, cnt long")
        .collect()
    )
    total = sum(c for _, c in parts)
    dt = "int32" if n <= (1 << 31) - 1 else "int64"
    dst_path = os.path.join(tmpdir, "dsts.npy")
    ptr_path = os.path.join(tmpdir, "ptr.npy")
    mm = np.lib.format.open_memmap(
        dst_path, mode="w+", dtype=dt, shape=(total,)
    )
    counts = np.zeros(n, dtype="int64")
    off = 0
    for pid, cnt in parts:
        if cnt == 0:
            continue
        mm[off : off + cnt] = np.fromfile(
            os.path.join(tmpdir, f"dst_{pid:05d}.bin"), dtype=dt
        )
        off += cnt
        with np.load(os.path.join(tmpdir, f"rle_{pid:05d}.npz")) as z:
            np.add.at(counts, z["srcs"], z["runs"])
    mm.flush()
    del mm
    ptr = np.zeros(n + 1, dtype="int64")
    np.cumsum(counts, out=ptr[1:])
    np.save(ptr_path, ptr)
    return ptr_path, dst_path


def _shared_index_dir(spark) -> str | None:
    """Cluster-mode shared-filesystem staging root for the blocked
    kernel's probe index: ``spark.pygraphblas.tri.sharedDir`` conf or
    ``PGB_TRI_SHARED_DIR`` env (an HDFS/S3/NFS URI every executor can
    reach). None when unconfigured."""
    try:
        d = spark.conf.get("spark.pygraphblas.tri.sharedDir", None)
    except Exception:
        d = None
    return d or os.environ.get("PGB_TRI_SHARED_DIR") or None


def _dump_sorted_index_fs(oriented: DataFrame, n: int, shared_uri: str):
    """Cluster-path twin of :func:`_dump_sorted_index`: tasks of the
    parallel range sort write their dst blocks + (src, run-length)
    summaries straight to ``shared_uri`` through ``pyarrow.fs`` (HDFS /
    S3 / NFS / file:// — whatever the cluster shares). The driver then
    reads ONLY the RLE summaries (O(distinct src per partition) rows,
    not edges) to build ``ptr`` and publishes it back to the shared
    dir. No edge byte ever crosses the driver — the previous
    ``orderBy().toArrow()`` fallback pulled up to ~6.4 GB of packed
    pairs serially through one driver thread at the 400M-edge cap.

    Returns (parts, ptr) where ``parts`` is the ordered
    [(partition_id, edge_count)] manifest count tasks use to assemble
    the index node-locally (:func:`_fetch_shared_index`)."""
    import pyarrow as pa
    import pyarrow.fs as pafs
    from pyspark import TaskContext

    fs, base = pafs.FileSystem.from_uri(shared_uri)
    fs.create_dir(base, recursive=True)
    dt = "int32" if n <= (1 << 31) - 1 else "int64"

    def dump(batches):
        import pyarrow.fs as pafs_t

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        att = ctx.taskAttemptId()
        us, vs = [], []
        for bt in batches:
            us.append(bt.column("src").to_numpy(zero_copy_only=False))
            vs.append(bt.column("dst").to_numpy(zero_copy_only=False))
        cnt = 0
        if us:
            u = np.asarray(np.concatenate(us), dtype="int64")
            v = np.asarray(np.concatenate(vs), dtype="int64")
            cnt = len(u)
            tfs, tbase = pafs_t.FileSystem.from_uri(shared_uri)
            # tmp + move publishes whole files; tmp names carry the
            # task ATTEMPT id so a speculative or retried attempt
            # cannot interleave writes with the original into one tmp
            # path — content is deterministic (sorted), so whichever
            # move lands last publishes identical bytes
            dtmp = f"{tbase}/.dst_{pid:05d}.{att}.tmp"
            with tfs.open_output_stream(dtmp) as out:
                out.write(v.astype(dt, copy=False).tobytes())
            tfs.move(dtmp, f"{tbase}/dst_{pid:05d}.bin")
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            runs = np.diff(np.r_[starts, cnt]).astype("int64")
            rtmp = f"{tbase}/.rle_{pid:05d}.{att}.tmp"
            with tfs.open_output_stream(rtmp) as out:
                out.write(u[starts].astype("int64").tobytes())
                out.write(runs.tobytes())
            tfs.move(rtmp, f"{tbase}/rle_{pid:05d}.bin")
        yield pa.RecordBatch.from_arrays(
            [pa.array([pid], type=pa.int32()), pa.array([cnt], type=pa.int64())],
            names=["pid", "cnt"],
        )

    parts = sorted(
        (r["pid"], r["cnt"])
        for r in oriented.select("src", "dst")
        .orderBy("src", "dst")
        .mapInArrow(dump, "pid int, cnt long")
        .collect()
    )
    # ptr from the RLE summaries alone — driver reads O(Σ distinct
    # srcs), a few MB even at the 400M-edge cap, never the dst data
    counts = np.zeros(n, dtype="int64")
    for pid, cnt in parts:
        if cnt == 0:
            continue
        with fs.open_input_stream(f"{base}/rle_{pid:05d}.bin") as f:
            raw = f.read()
        pairs = np.frombuffer(raw, dtype="int64")
        half = len(pairs) // 2
        np.add.at(counts, pairs[:half], pairs[half:])
    ptr = np.zeros(n + 1, dtype="int64")
    np.cumsum(counts, out=ptr[1:])
    with fs.open_output_stream(f"{base}/.ptr.bin.tmp") as out:
        out.write(ptr.tobytes())
    fs.move(f"{base}/.ptr.bin.tmp", f"{base}/ptr.bin")
    return parts, ptr


#: node-local index caches from runs finished more than this many
#: seconds ago are swept on the next fetch (a count phase runs minutes;
#: 6 h leaves a wide margin while bounding tmp growth to recent runs)
IDX_CACHE_TTL = int(os.environ.get("PGB_TRI_IDX_CACHE_TTL", str(6 * 3600)))


def _fetch_shared_index(shared_uri: str, parts, n: int, dt: str):
    """Node-local assembly of the shared probe index: the FIRST worker
    process on a node downloads ptr + the dst blocks (in partition
    order) from the shared dir into a flock-guarded local cache; every
    other worker on that node mmaps the same files. Per-NODE traffic is
    one index copy pulled in parallel from the shared filesystem — the
    bandwidth shape of a torrent broadcast, with zero driver bytes.

    Caches are per-run (the staging URI is unique per run), so each
    fetch also sweeps sibling cache dirs idle past ``IDX_CACHE_TTL`` —
    tmp growth is bounded to the runs of the last few hours. The live
    cache's ``done`` marker is touched on every fetch, keeping
    long-running count phases fresh."""
    import fcntl
    import hashlib
    import shutil
    import tempfile
    import time

    import pyarrow.fs as pafs

    key = hashlib.sha256(f"{shared_uri}|{n}".encode()).hexdigest()[:16]
    root = os.path.join(tempfile.gettempdir(), "pgb_tri_idx")
    cdir = os.path.join(root, key)
    os.makedirs(cdir, exist_ok=True)
    now = time.time()
    for sib in os.listdir(root):
        if sib == key:
            continue
        p = os.path.join(root, sib)
        try:
            ref = os.path.join(p, "done")
            m = os.path.getmtime(ref if os.path.exists(ref) else p)
            if now - m > IDX_CACHE_TTL:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass  # concurrent sweep/download — leave it
    with open(os.path.join(cdir, ".lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            done = os.path.join(cdir, "done")
            if os.path.exists(done):
                os.utime(done)
            else:
                fs, base = pafs.FileSystem.from_uri(shared_uri)
                with fs.open_input_stream(f"{base}/ptr.bin") as f, open(
                    os.path.join(cdir, "ptr.bin"), "wb"
                ) as out:
                    shutil.copyfileobj(f, out)
                with open(os.path.join(cdir, "dsts.bin"), "wb") as out:
                    for pid, cnt in parts:
                        if cnt == 0:
                            continue
                        with fs.open_input_stream(
                            f"{base}/dst_{pid:05d}.bin"
                        ) as f:
                            shutil.copyfileobj(f, out)
                with open(done, "w") as f:
                    f.write("ok")
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
    ptr = np.memmap(os.path.join(cdir, "ptr.bin"), dtype="int64", mode="r")
    dst = np.memmap(os.path.join(cdir, "dsts.bin"), dtype=dt, mode="r")
    return ptr, dst


def _wedge_balanced_bounds(ptr: np.ndarray, tasks: int) -> np.ndarray:
    """Pivot-range boundaries splitting total wedge work (Σ d·(d−1)/2)
    evenly across ``tasks`` — the skew-proof replacement for hashing
    pivots into blocks (one hub pivot can hold a large share of all
    wedges; equal-wedge ranges keep every task's work bounded)."""
    d = np.diff(ptr)
    w = np.cumsum(d * (d - 1) // 2)
    total = int(w[-1]) if len(w) else 0
    if total == 0:
        return np.array([0, len(d)], dtype="int64")
    targets = (np.arange(1, tasks) * total) // tasks
    cuts = np.searchsorted(w, targets, side="left") + 1
    bounds = np.unique(np.r_[0, cuts, len(d)])
    return bounds.astype("int64")


class BlockedIndexTooLarge(RuntimeError):
    """Blocked tier unavailable: no shared staging dir is configured on
    this cluster and the oriented edge set exceeds what the driver's
    memory can safely collect+broadcast (``blocked_driver_cap``).
    Callers fall back to the pure-shuffle DataFrame join plan."""


def triangle_count_blocked(
    edges: DataFrame,
    n: int,
    num_blocks: int | None = None,
    shared_dir: str | None = None,
    use_shared_fs: bool | None = None,
) -> int:
    """Blocked tier: Spark orients in (deg, id)-rank space and writes the
    range-sorted CSR probe index from its own tasks (no driver-funnel
    collect — ``_dump_sorted_index`` to tmpfs in local mode,
    ``_dump_sorted_index_fs`` to a shared-filesystem URI on a cluster);
    counting fans out as wedge-balanced pivot ranges, each probing ONE
    node-local copy of the index. Only the boundary table (#tasks rows)
    and the small run-length summaries ever reach the driver.

    On a cluster without a configured shared dir
    (``spark.pygraphblas.tri.sharedDir`` / ``PGB_TRI_SHARED_DIR``) the
    legacy driver-collect path remains, but only up to
    ``blocked_driver_cap`` oriented edges (derived from
    ``spark.driver.memory``) — beyond that :class:`BlockedIndexTooLarge`
    is raised and the caller's join plan takes over."""
    import pyarrow as pa

    spark = edges.sparkSession
    sc = spark.sparkContext
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    local_mode = sc.master.startswith("local")
    shared = shared_dir or _shared_index_dir(spark)
    if use_shared_fs is None:
        use_shared_fs = not local_mode and shared is not None
    if use_shared_fs and shared is not None:
        # unique staging subdir per run: node-local fetch caches key on
        # the URI, so reusing one path across runs would serve stale data
        import uuid

        shared = f"{shared.rstrip('/')}/tri_{uuid.uuid4().hex[:12]}"

    oriented, n_ranked, pinned = _oriented_ranked_df(edges, num_blocks, n=n)
    n = n_ranked  # pair keys pack against the (tighter) ranked domain
    # the global sort's range-partitioner SAMPLES its child before the
    # real exchange — unpersisted, that executes the whole orientation
    # pipeline twice (measured ~2x dump cost at every level)
    oriented = oriented.persist()

    ptr_path = dst_path = ptr_b = dst_b = tmpdir = None
    fs_parts = fs_dt = None
    if use_shared_fs:
        if shared is None:
            raise ValueError(
                "use_shared_fs requires a shared dir "
                "(spark.pygraphblas.tri.sharedDir / PGB_TRI_SHARED_DIR)"
            )
        fs_parts, ptr = _dump_sorted_index_fs(oriented, n, shared)
        fs_dt = "int32" if n <= (1 << 31) - 1 else "int64"
    elif local_mode:
        import tempfile

        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        tmpdir = tempfile.mkdtemp(prefix="pgb_tri_", dir=base)
        ptr_path, dst_path = _dump_sorted_index(oriented, n, tmpdir)
        ptr = np.load(ptr_path, mmap_mode="r")
    else:
        # legacy driver-collect fallback (no shared dir configured):
        # bounded by what THIS driver can hold — a silent 6.4 GB pull
        # at the old fixed 400M cap is exactly the funnel the north
        # rule forbids
        cap = blocked_driver_cap(spark, n)
        m_oriented = oriented.count()
        if m_oriented > cap:
            oriented.unpersist()
            for p in pinned:
                p.unpersist()
            raise BlockedIndexTooLarge(
                f"{m_oriented} oriented edges exceed the driver-collect cap "
                f"{cap} (from spark.driver.memory); configure "
                "spark.pygraphblas.tri.sharedDir for the task-side index "
                "dump or use the DataFrame join plan"
            )
        import warnings

        warnings.warn(
            "triangle_count_blocked: no shared index dir configured — "
            f"collecting {m_oriented} oriented edges through the driver "
            "(set spark.pygraphblas.tri.sharedDir to keep the index "
            "task-side)",
            RuntimeWarning,
            stacklevel=2,
        )
        ktbl = oriented.select("src", "dst").orderBy("src", "dst").toArrow()
        ptr, dsts = _csr_index_cols(
            np.asarray(
                ktbl.column("src").to_numpy(zero_copy_only=False), dtype="int64"
            ),
            np.asarray(
                ktbl.column("dst").to_numpy(zero_copy_only=False), dtype="int64"
            ),
            n,
        )
        del ktbl
        ptr_b = sc.broadcast(ptr)
        dst_b = sc.broadcast(dsts)
    oriented.unpersist()
    for p in pinned:
        p.unpersist()

    # wedge-balanced pivot ranges: bounds from ptr alone (driver-cheap),
    # one Spark task per range, all probing the shared index — the
    # second full shuffle+sort of the oriented edges is gone
    bounds = _wedge_balanced_bounds(np.asarray(ptr), num_blocks)
    ranges = spark.createDataFrame(
        [(int(bounds[i]), int(bounds[i + 1])) for i in range(len(bounds) - 1)],
        "lo long, hi long",
    ).repartition(max(1, len(bounds) - 1))

    def count(batches, pp=ptr_path, dp=dst_path, pb=ptr_b, db=dst_b,
              su=shared if use_shared_fs else None, sp=fs_parts, sn=n,
              sdt=fs_dt):
        if su is not None:
            pv, dv = _fetch_shared_index(su, sp, sn, sdt)
        else:
            pv = np.load(pp, mmap_mode="r") if pp is not None else pb.value
            dv = np.load(dp, mmap_mode="r") if dp is not None else db.value
        t = 0
        for bt in batches:
            for lo, hi in zip(
                bt.column("lo").to_numpy(zero_copy_only=False),
                bt.column("hi").to_numpy(zero_copy_only=False),
            ):
                base = int(pv[lo])
                seg = np.asarray(dv[base : int(pv[hi])])
                starts = np.asarray(pv[lo:hi], dtype="int64") - base
                t += _closures_for_segments(seg, starts, pv, dv)
        yield pa.RecordBatch.from_arrays(
            [pa.array([t], type=pa.int64())], names=["t"]
        )

    try:
        tbl = ranges.mapInArrow(count, "t long").toArrow()
        return int(sum(tbl.column("t").to_pylist()))
    finally:
        for b in (ptr_b, dst_b):
            if b is not None:
                b.unpersist()
        if tmpdir is not None:
            import shutil

            del ptr
            shutil.rmtree(tmpdir, ignore_errors=True)
        if use_shared_fs and shared is not None:
            # staging files are one-shot: delete the unique subdir (the
            # node-local fetch caches sweep themselves — any cache idle
            # past IDX_CACHE_TTL is removed by the next fetch on that
            # node, see _fetch_shared_index)
            try:
                import pyarrow.fs as pafs

                fsys, fbase = pafs.FileSystem.from_uri(shared)
                fsys.delete_dir(fbase)
            except Exception:
                pass
