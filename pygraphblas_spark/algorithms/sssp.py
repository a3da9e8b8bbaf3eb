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
        return _sssp_loop(spark, edges, source, max_iters, ckpt)


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
