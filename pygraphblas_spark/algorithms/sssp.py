"""Single-source shortest paths — min-plus semiring relaxation to fixpoint.

Reference (``demo/Introduction-to-GraphBLAS-with-Python.ipynb`` cell 33):

    v[s] = 0
    loop: v.min_plus(A, out=v, accum=min)   until v stops changing

Bellman-Ford over the MIN_PLUS semiring. Delta optimization: only relax
out-edges of vertices whose distance improved last round (the frontier) —
same shape as connected_components.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.plans.checkpoint import CheckpointManager, iteration_conf


def sssp(
    edges: DataFrame,
    source: int,
    max_iters: int = 10_000,
    checkpoint: Optional[CheckpointManager] = None,
) -> DataFrame:
    """Shortest distances from ``source`` over weighted edges
    (src, dst, val). Returns (id: long, dist: double) for reached
    vertices. Negative cycles are not detected (max_iters bounds work,
    same as the reference's fixpoint loop)."""
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="sssp")
    with iteration_conf(spark):
        incore = _sssp_incore(spark, edges, source, max_iters, ckpt)
        if incore is not None:
            return incore
        return _sssp_loop(spark, edges, source, max_iters, ckpt)


def _sssp_incore(spark, edges, source, max_iters, ckpt):
    """Sub-crossover graphs run Bellman-Ford frontier relaxation
    driver-side in numpy — zero Spark jobs per round (the in-core tier;
    see kernels/csr_dense.py INCORE_MAX_NNZ). Returns None off-tier."""
    from pygraphblas_spark.kernels.csr_dense import (
        INCORE_MAX_NNZ,
        _frontier_gather,
        _incore_out_csr,
        _maybe_durable,
    )
    import numpy as np
    import pandas as pd

    if not spark.sparkContext.master.startswith("local"):
        return None
    if int(source) < 0:  # join path handles out-of-domain ids gracefully
        return None
    if edges.count() > INCORE_MAX_NNZ:
        return None
    n, indptr, dst, w = _incore_out_csr(edges, weighted=True)
    s = int(source)
    if n == 0 or s >= n:
        return spark.createDataFrame([(s, 0.0)], "id long, dist double")

    dist = np.full(n, np.inf)
    dist[s] = 0.0
    frontier = np.array([s], dtype="int64")
    for it in range(max_iters):
        idx, esrc = _frontier_gather(indptr, frontier)
        if len(idx) == 0:
            break
        cand = dist[esrc] + w[idx]
        new = dist.copy()
        np.minimum.at(new, dst[idx], cand)
        frontier = np.flatnonzero(new < dist)
        dist = new
        _maybe_durable(
            ckpt, spark, it + 1, "dist", n, dist, "dist",
            {"improved": int(len(frontier))},
        )
        if len(frontier) == 0:
            break
    reached = np.flatnonzero(np.isfinite(dist))
    return spark.createDataFrame(
        pd.DataFrame({"id": reached, "dist": dist[reached]})
    )


def _sssp_loop(spark, edges, source, max_iters, ckpt):
    e = edges.select("src", "dst", F.col("val").cast("double")).persist()
    e.count()

    dist = spark.createDataFrame([(int(source), 0.0)], "id long, dist double")
    dist = ckpt.cut(dist)
    frontier = dist

    for it in range(max_iters):
        # relax frontier out-edges: candidate dist via each edge
        cand = (
            e.join(frontier, e["src"] == frontier["id"])
            .groupBy(e["dst"].alias("cid"))
            .agg(F.min(frontier["dist"] + e["val"]).alias("cdist"))
        )
        # merge with current distances (min-accum eadd)
        merged = (
            dist.join(cand, dist["id"] == F.col("cid"), "full_outer")
            .select(
                F.coalesce(dist["id"], F.col("cid")).alias("id"),
                F.least(
                    F.coalesce(dist["dist"], F.lit(float("inf"))),
                    F.coalesce(F.col("cdist"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("cdist").isNotNull()
                    & (
                        dist["dist"].isNull() | (F.col("cdist") < dist["dist"])
                    )
                ).alias("__improved"),
            )
        )
        merged = ckpt.cut(merged)
        new_frontier = merged.filter(F.col("__improved")).select("id", "dist")
        improved = new_frontier.count()
        dist = merged.select("id", "dist")
        ckpt.save(it + 1, {"dist": dist}, {"improved": improved})
        frontier = new_frontier
        if improved == 0:
            break

    e.unpersist()
    return dist
