"""BFS levels — the reference's masked-vxm frontier loop.

Reference (``demo/Introduction-to-GraphBLAS-with-Python.ipynb`` cell 31):

    q[s] = True
    for level in 1..n:
        v⟨q⟩ = level                 # assign level under frontier mask
        q⟨!v⟩ = q vxm A              # expand frontier, complement mask
        until q is empty

Spark shape: the frontier is a (small) id DataFrame; expansion is a
semi-filtered join; the visited set is accumulated and anti-joined — the
complement-mask idiom (descriptor RC). Frontier-sized work per level.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.plans.checkpoint import CheckpointManager, iteration_conf


def bfs_levels(
    edges: DataFrame,
    source: int,
    max_levels: int = 10_000,
    checkpoint: Optional[CheckpointManager] = None,
) -> DataFrame:
    """Breadth-first levels from ``source`` over directed edges (src, dst).

    Returns (id: long, level: int) for reached vertices; source has
    level 0 (the reference assigns 1-based levels in the demo; 0-based
    here, documented).
    """
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="bfs")
    with iteration_conf(spark):
        incore = _try_incore(spark, edges, source, max_levels, ckpt, parents=False)
        if incore is not None:
            return incore
        return _bfs_loop(spark, edges, source, max_levels, ckpt)


def _try_incore(spark, edges, source, max_levels, ckpt, parents, weighted=False):
    """Sub-crossover graphs run the whole frontier loop driver-side in
    numpy — zero Spark jobs per level (the same in-core tier pagerank /
    cc / lpa have in kernels/csr_dense.py). Returns None when the graph
    is too big or the master is a real cluster."""
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
    n, indptr, dst, w = _incore_out_csr(edges, weighted=weighted)
    s = int(source)
    if n == 0 or s >= n:
        n = max(n, s + 1)
        out = pd.DataFrame({"id": [s], "level": np.array([0], dtype="int32")})
        if parents:
            out["parent"] = np.array([s], dtype="int64")
        return spark.createDataFrame(out)

    level = np.full(n, -1, dtype="int64")
    parent = np.full(n, -1, dtype="int64") if parents else None
    level[s] = 0
    if parents:
        parent[s] = s
    frontier = np.array([s], dtype="int64")
    lvl = 0
    # the join path assigns levels 1..max_levels (it breaks before
    # unioning a level > max_levels) — match exactly
    while len(frontier) and lvl < max_levels:
        lvl += 1
        idx, esrc = _frontier_gather(indptr, frontier)
        neigh = dst[idx]
        fresh = level[neigh] < 0
        cand, cpar = neigh[fresh], esrc[fresh]
        if len(cand) == 0:
            break
        new_nodes = np.unique(cand)
        if parents:
            # deterministic MIN-parent (matches the join path's F.min)
            best = np.full(n, np.iinfo("int64").max, dtype="int64")
            np.minimum.at(best, cand, cpar)
            parent[new_nodes] = best[new_nodes]
        level[new_nodes] = lvl
        frontier = new_nodes
        _maybe_durable(
            ckpt, spark, lvl, "visited", n, level, "level",
            {"frontier": int(len(new_nodes))},
        )
    reached = np.flatnonzero(level >= 0)
    out = pd.DataFrame(
        {"id": reached, "level": level[reached].astype("int32")}
    )
    if parents:
        out["parent"] = parent[reached]
    return spark.createDataFrame(out)


def _bfs_loop(spark, edges, source, max_levels, ckpt):
    e = edges.select("src", "dst").persist()
    e.count()

    visited = spark.createDataFrame([(int(source), 0)], "id long, level int")
    visited = ckpt.cut(visited)
    frontier = visited.select("id")

    level = 0
    while True:
        level += 1
        # expand: neighbors of the frontier not yet visited (complement mask)
        nxt = (
            e.join(frontier, e["src"] == frontier["id"], "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(level).cast("int").alias("level"))
        )
        nxt = ckpt.cut(nxt)
        cnt = nxt.count()
        if cnt == 0 or level > max_levels:
            break
        visited = ckpt.cut(visited.unionByName(nxt))
        frontier = nxt.select("id")
        ckpt.save(level, {"visited": visited}, {"frontier": cnt})

    e.unpersist()
    return visited


def bfs_tree(
    edges: DataFrame,
    source: int,
    max_levels: int = 10_000,
    checkpoint: Optional[CheckpointManager] = None,
) -> DataFrame:
    """BFS levels AND parents (the reference's parent-BFS demo, which
    uses the SECONDI positional semiring: pi = q.vxm(A, ANY_SECONDI)).
    The parent of each newly-reached vertex is the MINIMUM frontier
    in-neighbor — deterministic where the reference's ANY is not, so the
    result is oracle-checkable. source's parent is itself.

    Returns (id: long, level: int, parent: long).
    """
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="bfs_tree")
    with iteration_conf(spark):
        incore = _try_incore(spark, edges, source, max_levels, ckpt, parents=True)
        if incore is not None:
            return incore
        e = edges.select("src", "dst").persist()
        e.count()

        visited = spark.createDataFrame(
            [(int(source), 0, int(source))], "id long, level int, parent long"
        )
        visited = ckpt.cut(visited)
        frontier = visited.select("id")

        level = 0
        while True:
            level += 1
            nxt = (
                e.join(frontier, e["src"] == frontier["id"], "left_semi")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("src").alias("parent"))  # MIN_SECONDI rule
                .join(visited.select("id"), "id", "left_anti")
                .select("id", F.lit(level).cast("int").alias("level"), "parent")
            )
            nxt = ckpt.cut(nxt)
            cnt = nxt.count()
            if cnt == 0 or level > max_levels:
                break
            visited = ckpt.cut(visited.unionByName(nxt))
            frontier = nxt.select("id")
            ckpt.save(level, {"visited": visited}, {"frontier": cnt})

        e.unpersist()
        return visited
