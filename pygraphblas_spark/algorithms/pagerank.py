"""PageRank — exact reimplementation of the reference's GAP kernel.

Reference (``gap/prmark.py:8-30``):

    d = out_degree / damping                       # apply_second DIV
    r[:] = 1/n
    for i in range(iters):
        t = r
        w = t / d                                  # emult DIV
        r[:] = teleport                            # assign_scalar
        A.mxv(w, out=r, accum=PLUS, semiring=PLUS_SECOND, desc=T0)
        rdiff = sum(abs(t - r))
        if rdiff <= tol: break

Semantics notes (replicated exactly so scores allclose 1e-6 vs the oracle):
- ``w = t/d`` is an eMult intersection: vertices with NO out-edges drop out
  of ``w`` and contribute nothing (GAP-style dangling handling — rank mass
  leaks, same as the reference). We fold ``damping/out_degree`` into the
  edge table ONCE (every edge's src has out-degree >= 1 by construction, so
  the fold is lossless and exactly equivalent to the per-iteration eMult).
- The SpMV is over Aᵀ (desc=T0): new rank of v sums w over v's IN-neighbors.
- accum=PLUS onto r[:]=teleport: every vertex holds at least the teleport
  term.

Scale shape (what survives a 1000-executor / 100 TB run):
- **Degree fold**: ``ew = edges ⋈ out_degree`` happens once; iterations do a
  single join instead of two. The big side is scanned from cache, never
  re-shuffled.
- **Vector-join strategy** (``strategy=``): ``broadcast`` ships the rank
  vector (n rows, 16 B/row) to every task — the edge table never moves, and
  the only shuffle is the tiny partial-aggregated contribution exchange.
  Right up to the memory limit this is the optimal plan (hub skew is
  irrelevant: map-side combine absorbs it). ``shuffle`` is the beyond-memory
  path: ``ew`` is hash-partitioned by ``src`` once and persisted; the rank
  vector arrives already hash-partitioned by ``id`` from the previous
  iteration's aggregation, so Catalyst reuses both partitionings and only
  the vector's P partial files move. ``auto`` picks by ``n`` vs
  ``broadcast_max_rows``.
- **One action per iteration**: the new-rank frame is lineage-cut with a
  *lazy* ``localCheckpoint`` and materialized by the convergence reduce —
  checkpoint + L1-diff in a single job. The superseded iteration's blocks
  are unpersisted eagerly (long runs would otherwise evict under memory
  pressure).
- Durable resumability via CheckpointManager (parquet + manifest) on its
  cadence.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.plans.checkpoint import (
    CheckpointManager,
    iteration_conf,
    release_state,
)

#: above this many vertices the rank vector stops being broadcast and the
#: co-partitioned shuffle join takes over. Measured crossover on local[*]
#: is well under 1M rows: the driver-side collect + hash-relation build is
#: serial and grows with n, while the shuffle path's per-iteration cost is
#: flat (the big side is cached pre-partitioned AND pre-sorted, so only the
#: vector side sorts).
BROADCAST_MAX_ROWS = 500_000


def _cut_lazy(df: DataFrame) -> DataFrame:
    """Truncate lineage NOW (plan becomes a LogicalRDD scan) but let the
    next action materialize the partitions — fuses the checkpoint write
    with the convergence reduce into one job."""
    return df.localCheckpoint(eager=False)


def pagerank(
    edges: DataFrame,
    n: Optional[int] = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    max_iters: int = 100,
    checkpoint: Optional[CheckpointManager] = None,
    num_partitions: Optional[int] = None,
    strategy: str = "auto",
    init: Optional[DataFrame] = None,
    start_iteration: int = 0,
) -> DataFrame:
    """Compute PageRank over a directed edge DataFrame (src, dst).

    Returns (id: long, rank: double) for every vertex 0..n-1.
    ``n`` defaults to max(src, dst)+1 (one pass).
    ``strategy``: 'broadcast' | 'shuffle' | 'auto' — how the rank vector
    meets the edge table each iteration (see module docstring).
    ``init`` / ``start_iteration`` warm-start from a prior state — pass
    the (id, rank) DataFrame and iteration number that
    ``CheckpointManager.resume`` returns to continue a run mid-stream;
    checkpoint records continue the original numbering.
    """
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="pagerank")
    if strategy in ("auto", "kernel"):
        from pygraphblas_spark.kernels.csr_dense import (
            DENSE_KERNEL_MAX_ROWS,
            pagerank_dense_kernel,
        )

        kn = n
        if kn is None and strategy == "auto":
            mx = edges.agg(F.max("src"), F.max("dst")).first()
            kn = int(max(mx[0], mx[1])) + 1 if mx[0] is not None else 0
        if strategy == "kernel" or kn <= DENSE_KERNEL_MAX_ROWS:
            return pagerank_dense_kernel(
                edges,
                n=kn,
                damping=damping,
                tol=tol,
                max_iters=max_iters,
                num_blocks=num_partitions,
                checkpoint=ckpt,
                init=init,
                start_iteration=start_iteration,
            )
        strategy = "shuffle"
    with iteration_conf(spark):
        return _pagerank_loop(
            spark, edges, n, damping, tol, max_iters, ckpt, num_partitions,
            strategy, init, start_iteration,
        )


def _pagerank_loop(
    spark, edges, n, damping, tol, max_iters, ckpt, num_partitions, strategy,
    init=None, start_iteration=0,
):
    e = edges.select("src", "dst")
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    e = e.persist()

    if n is None:
        mx = e.agg(F.max("src"), F.max("dst")).first()
        n = int(max(mx[0], mx[1])) + 1
    else:
        e.count()  # materialize the persisted edges

    if strategy == "auto":
        strategy = "broadcast" if n <= BROADCAST_MAX_ROWS else "shuffle"

    teleport = (1.0 - damping) / n

    # Fold damping/out_degree into the edges once (≡ per-iteration
    # w = t/d eMult; prmark.py:19,22 — see module docstring).
    d = e.groupBy("src").agg((F.lit(damping) / F.count(F.lit(1))).alias("inv_d"))
    ew = e.join(d, "src").select("src", "dst", "inv_d")
    if strategy == "shuffle":
        # Shuffle AND sort the big side exactly once, here: the cached
        # partitioning (hash by the per-iteration join key) and the cached
        # sort order are both reused by every iteration's sort-merge join,
        # so iterations never move or re-sort the edge table — only the
        # narrow rank vector sorts.
        if not num_partitions:
            ew = ew.repartition("src")
        ew = ew.sortWithinPartitions("src")
    ew = ew.persist()
    ew.count()
    e.unpersist()

    # r = 1/n everywhere (prmark.py:20) — or the warm-start state
    if init is not None:
        r = init.select("id", "rank")
    else:
        r = spark.range(n).select(F.col("id"), F.lit(1.0 / n).alias("rank"))
    r = r.localCheckpoint(eager=True)

    iters = 0
    rdiff = float("inf")
    for it in range(max_iters):
        t = r
        tv = F.broadcast(t) if strategy == "broadcast" else t
        # contribution: for each edge (src,dst), rank[src]*inv_d flows to
        # dst; PLUS_SECOND over Aᵀ == groupBy(dst).sum — partial (map-side)
        # aggregation absorbs hub in-degree skew before the shuffle
        contrib = (
            ew.join(tv, ew["src"] == t["id"])
            .groupBy(ew["dst"].alias("id"))
            .agg(F.sum(F.col("rank") * F.col("inv_d")).alias("c"))
        )
        # fused update + convergence pass: t covers every vertex 0..n-1,
        # so one left join produces both the new rank and the per-vertex
        # L1 term; lazy lineage cut + the reduce = ONE job per iteration
        merged = t.join(contrib, "id", "left_outer").select(
            "id",
            (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))).alias("rank"),
            F.abs(
                F.col("rank")
                - (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0)))
            ).alias("__diff"),
        )
        merged = _cut_lazy(merged)
        rdiff = merged.agg(F.sum("__diff")).first()[0]
        r_new = merged.select("id", "rank")
        iters = start_iteration + it + 1
        states = ckpt.save(iters, {"rank": r_new}, {"rdiff": rdiff, "n": n})
        release_state(t)
        r = states["rank"]
        if rdiff <= tol:
            break

    ew.unpersist()
    return r.select("id", "rank")
