"""Triangle counting over CSR segments — the kernel tiers behind
``algorithms.triangle_count``.

Same algebra as the reference Sandia form (``L.mxm(L, mask=L,
PLUS_PAIR)`` — demo/TriangleCentrality.ipynb cell 17) and the same
degree-ordered orientation as the DataFrame plan (bounds every out-list
by O(sqrt(m)), killing hub wedge explosion). What the kernels change is
the physical execution: instead of a wedge self-JOIN + closing semi-join
(three shuffles, JVM row processing), wedges are enumerated with
vectorized numpy inside each pivot segment and closed with a binary
search against the sorted oriented-edge key array.

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

Orientation-free closing test: the oriented edge between wedge tips
(v, w) exists in exactly one direction (the (deg, id) total order), so
membership is checked for BOTH packed keys — no rank relabel needed
inside the kernel, and each triangle is counted exactly once at its
lowest-rank pivot.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-chunk wedge budget for the vectorized enumerate (bounds temp
#: memory to ~16 arrays x 8B x chunk ~= 1GB at the default)
WEDGE_CHUNK = int(os.environ.get("PGB_TRI_WEDGE_CHUNK", "8000000"))

#: above this many oriented edges the shared key array (8B/edge) stops
#: being reasonable to ship to every node; callers fall back to the
#: DataFrame join plan
BLOCKED_MAX_ORIENTED = int(os.environ.get("PGB_TRI_MAX_ORIENTED", "400000000"))


def _closures_for_segments(
    dst: np.ndarray,
    starts: np.ndarray,
    keys: np.ndarray,
    n: int,
    ranked: bool = False,
    threads: int = 1,
) -> int:
    """Count closed wedges for pivot segments (``dst`` split at
    ``starts``) against the sorted oriented key array ``keys``.

    Vectorized pair enumeration: wedge offsets within each segment are
    decoded to (i, j) index pairs with the triangular-number inverse —
    O(1) numpy ops per wedge, chunked to ``WEDGE_CHUNK``.

    ``ranked=True`` means ids are already (deg, id)-rank-relabelled and
    segment dst lists are sorted ascending, so the closing edge between
    wedge tips (a, b) with a < b can only be oriented a→b — ONE
    searchsorted per wedge instead of two. ``threads`` fans chunks out
    over a thread pool (the heavy numpy ops release the GIL).
    """
    m = len(keys)
    if len(dst) == 0 or m == 0:
        return 0
    d = np.diff(np.r_[starts, len(dst)])
    c = d * (d - 1) // 2  # wedges per segment
    seg_end = np.cumsum(c)
    seg_begin = seg_end - c
    W = int(seg_end[-1]) if len(seg_end) else 0
    if W == 0:
        return 0

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
        b = dst[base + j]
        if ranked:
            k1 = a * n + b
            idx1 = np.searchsorted(keys, k1)
            hit = (idx1 < m) & (keys[np.minimum(idx1, m - 1)] == k1)
        else:
            k1 = a * n + b
            k2 = b * n + a
            idx1 = np.searchsorted(keys, k1)
            idx2 = np.searchsorted(keys, k2)
            hit1 = (idx1 < m) & (keys[np.minimum(idx1, m - 1)] == k1)
            hit2 = (idx2 < m) & (keys[np.minimum(idx2, m - 1)] == k2)
            hit = hit1 | hit2
        return int(hit.sum())

    bounds = list(range(0, W, WEDGE_CHUNK))
    chunks = [(p, min(p + WEDGE_CHUNK, W)) for p in bounds]
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
    per wedge (see ``_closures_for_segments(ranked=True)``). Chunks fan
    out over ``threads`` GIL-releasing numpy workers.
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
    if threads is None:
        threads = min(16, os.cpu_count() or 1)
    return _closures_for_segments(dst, starts, ko, n, ranked=True, threads=threads)


def _oriented_df(edges: DataFrame) -> DataFrame:
    """Spark-side degree-ordered orientation (the scalable setup path —
    same plan as the DataFrame triangle counter's front half)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    with_deg = (
        sym.join(
            deg.withColumnRenamed("src", "u").withColumnRenamed("deg", "du"),
            sym["src"] == F.col("u"),
        )
        .join(
            deg.withColumnRenamed("src", "v").withColumnRenamed("deg", "dv"),
            sym["dst"] == F.col("v"),
        )
        .select("src", "dst", "du", "dv")
    )
    return with_deg.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def triangle_count_blocked(
    edges: DataFrame, n: int, num_blocks: int | None = None
) -> int:
    """Blocked tier: Spark orients; each src-block enumerates + closes
    its wedges against one shared sorted key array."""
    import pyarrow as pa

    spark = edges.sparkSession
    sc = spark.sparkContext
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    local_mode = sc.master.startswith("local")

    oriented = _oriented_df(edges).persist()
    # one pull of the oriented keys -> the shared membership array
    ktbl = oriented.select((F.col("src") * n + F.col("dst")).alias("k")).toArrow()
    keys = np.sort(
        np.asarray(ktbl.column("k").to_numpy(zero_copy_only=False), dtype="int64")
    )

    path = bcast = None
    if local_mode:
        import tempfile

        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        tmpdir = tempfile.mkdtemp(prefix="pgb_tri_", dir=base)
        path = os.path.join(tmpdir, "keys.npy")
        np.save(path, keys)
    else:
        bcast = sc.broadcast(keys)

    blocks = oriented.repartition(num_blocks, "src").sortWithinPartitions(
        "src", "dst"
    )

    def count(batches, p=path, b=bcast, nn=n):
        kv = np.load(p, mmap_mode="r") if p is not None else b.value
        us, vs = [], []
        for bt in batches:
            us.append(bt.column("src").to_numpy(zero_copy_only=False))
            vs.append(bt.column("dst").to_numpy(zero_copy_only=False))
        if us:
            u = np.asarray(np.concatenate(us), dtype="int64")
            v = np.asarray(np.concatenate(vs), dtype="int64")
            starts, dst = _segments_from_sorted(u, v)
            t = _closures_for_segments(dst, starts, kv, nn)
        else:
            t = 0
        yield pa.RecordBatch.from_arrays(
            [pa.array([t], type=pa.int64())], names=["t"]
        )

    try:
        tbl = blocks.mapInArrow(count, "t long").toArrow()
        return int(sum(tbl.column("t").to_pylist()))
    finally:
        oriented.unpersist()
        if bcast is not None:
            bcast.unpersist()
        if path is not None:
            import shutil

            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
