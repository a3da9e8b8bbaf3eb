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
        return _bfs_loop(spark, edges, source, max_levels, ckpt)


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
