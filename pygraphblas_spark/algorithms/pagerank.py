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
  leaks, same as the reference).
- The SpMV is over Aᵀ (desc=T0): new rank of v sums w over v's IN-neighbors.
- accum=PLUS onto r[:]=teleport: every vertex holds at least the teleport
  term.

Scale shape:
- Edges are loaded once, projected to (src, dst), repartitioned by ``src``
  (the per-iteration join key) and persisted — the big side never
  re-shuffles; only the rank vector (|V| rows, narrow) moves per iteration.
- One action per iteration (the convergence reduce); lineage truncated
  every iteration via localCheckpoint, durably via CheckpointManager.
- Hub skew on ``dst`` (high in-degree vertices) is absorbed by partial
  (map-side) aggregation of ``sum`` — the skewed groupBy key never
  concentrates raw rows on one reducer; AQE skew-join handles the join side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.plans.checkpoint import CheckpointManager


def pagerank(
    edges: DataFrame,
    n: Optional[int] = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    max_iters: int = 100,
    checkpoint: Optional[CheckpointManager] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Compute PageRank over a directed edge DataFrame (src, dst).

    Returns (id: long, rank: double) for every vertex 0..n-1.
    ``n`` defaults to max(src, dst)+1 (one pass).
    """
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="pagerank")
    e = edges.select("src", "dst")
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    e = e.persist()

    if n is None:
        mx = e.agg(F.max("src"), F.max("dst")).first()
        n = int(max(mx[0], mx[1])) + 1
    else:
        e.count()  # materialize the persisted edges

    teleport = (1.0 - damping) / n

    # d = out_degree / damping  (prmark.py:19: d.assign_second(DIV, damping))
    d = e.groupBy("src").agg((F.count(F.lit(1)) / damping).alias("d"))
    d = d.persist()
    d.count()

    # r = 1/n everywhere (prmark.py:20)
    r = spark.range(n).select(F.col("id"), F.lit(1.0 / n).alias("rank"))
    r = ckpt.cut(r)

    iters = 0
    rdiff = float("inf")
    for it in range(max_iters):
        t = r
        # w = t / d  — inner join: dangling vertices drop out
        w = t.join(d, t["id"] == d["src"], "inner").select(
            d["src"].alias("wid"), (t["rank"] / d["d"]).alias("w")
        )
        # contribution: for each edge (src,dst), w[src] flows to dst;
        # PLUS_SECOND over Aᵀ == groupBy(dst).sum(w)
        contrib = (
            e.join(w, e["src"] == w["wid"])
            .groupBy(e["dst"].alias("id"))
            .agg(F.sum("w").alias("c"))
        )
        # fused update + convergence pass: t covers every vertex 0..n-1,
        # so one left join produces both the new rank and the per-vertex
        # L1 term — one materialization, one tiny agg action per
        # iteration (no second join against the new state)
        merged = t.join(contrib, "id", "left_outer").select(
            "id",
            (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))).alias("rank"),
            F.abs(
                F.col("rank")
                - (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0)))
            ).alias("__diff"),
        )
        merged = ckpt.cut(merged)
        rdiff = merged.agg(F.sum("__diff")).first()[0]
        r_new = merged.select("id", "rank")
        iters = it + 1
        states = ckpt.save(iters, {"rank": r_new}, {"rdiff": rdiff, "n": n})
        r = states["rank"]
        if rdiff <= tol:
            break

    e.unpersist()
    d.unpersist()
    return r.select("id", "rank")
