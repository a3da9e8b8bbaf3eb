"""Betweenness centrality — batched multi-source Brandes.

Reference (``gap/bcmark.py:16-67``, ``demo/BetweenessCentrality.ipynb``
cell 1): a forward phase of frontier pushes with the PLUS_FIRST semiring
(σ path counts), levels recorded per depth, then a backward dependency
sweep accumulating δ = Σ_succ (σ_v/σ_w)(1+δ_w). The reference batches 4
sources into one matrix-valued frontier; we batch ALL requested sources
as a ``source`` key column — one DataFrame per phase, every join keyed on
``(source, vertex)`` so Spark parallelizes across sources AND vertices
(the same trick, transposed into relational form).

Scale shape: per level one join + one aggregation over the frontier-
adjacent edges (frontier-sized work, not |E|); levels are cached per
depth for the backward sweep (they are exactly the per-iteration
checkpoint states); vertex-dimension partitioning spreads hub skew, the
``source`` key spreads it further. For web-scale graphs run sampled
sources (the GAP benchmark itself uses 4-source batches).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.plans.checkpoint import iteration_conf


def betweenness_centrality(
    edges: DataFrame,
    sources: Optional[Sequence[int]] = None,
    directed: bool = True,
    normalized: bool = False,
    max_levels: int = 10_000,
) -> DataFrame:
    """Brandes betweenness over directed edges (src, dst).

    ``sources``: vertex ids to run from (default: every vertex that
    appears in the graph — exact betweenness; pass a sample for scale).
    Returns (id: long, bc: double) for every vertex appearing in the
    graph; ``normalized`` divides by (n-1)(n-2) (directed convention).
    """
    spark = edges.sparkSession
    with iteration_conf(spark):
        e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
        if not directed:
            e = e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        e = e.distinct().persist()
        e.count()

        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
            .persist()
        )
        n = verts.count()

        try:
            return _bc_passes(
                spark, e, verts, n, sources, normalized, max_levels
            )
        finally:
            e.unpersist()
            verts.unpersist()


def _bc_passes(spark, e, verts, n, sources, normalized, max_levels):
        from pygraphblas_spark.plans.checkpoint import release_state

        if sources is None:
            srcs = verts.select(F.col("id").alias("source"))
        else:
            srcs = spark.createDataFrame(
                [(int(s),) for s in sources], "source long"
            )

        # forward: level 0 = the sources themselves, sigma = 1
        frontier = srcs.select(
            "source", F.col("source").alias("id"), F.lit(1.0).alias("sigma")
        ).localCheckpoint(eager=True)
        visited = frontier.select("source", "id", "sigma", F.lit(0).alias("level"))
        visited = visited.localCheckpoint(eager=True)
        levels = [frontier]

        depth = 0
        while depth < max_levels:
            depth += 1
            # push: sigma flows along out-edges (PLUS_FIRST shape:
            # sum of predecessor sigmas), minus already-settled vertices
            nxt = (
                frontier.join(e, frontier["id"] == e["src"])
                .select("source", F.col("dst").alias("id"), "sigma")
                .groupBy("source", "id")
                .agg(F.sum("sigma").alias("sigma"))
                .join(
                    visited.select(
                        F.col("source").alias("vsource"), F.col("id").alias("vid")
                    ),
                    (F.col("source") == F.col("vsource"))
                    & (F.col("id") == F.col("vid")),
                    "left_anti",
                )
            )
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            levels.append(nxt)
            prev_visited = visited
            visited = visited.unionByName(
                nxt.select("source", "id", "sigma", F.lit(depth).alias("level"))
            ).localCheckpoint(eager=True)
            release_state(prev_visited)
            frontier = nxt

        # backward: delta over levels deepest-first
        delta = None  # (source, id, delta)
        bc_parts = []
        for lvl in range(len(levels) - 1, 0, -1):
            w = levels[lvl]  # (source, id, sigma) at this depth
            if delta is not None:
                w_aug = w.join(delta, ["source", "id"], "left_outer").select(
                    "source",
                    "id",
                    "sigma",
                    F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
                )
            else:
                w_aug = w.select("source", "id", "sigma", F.lit(0.0).alias("delta"))
            # contribution to predecessors v (at lvl-1): σ_v/σ_w · (1+δ_w)
            prev = levels[lvl - 1].select(
                "source", F.col("id").alias("vid"), F.col("sigma").alias("sigma_v")
            )
            contrib = (
                w_aug.join(e, w_aug["id"] == e["dst"])
                .select(
                    "source",
                    F.col("src").alias("vid"),
                    F.col("id").alias("wid"),
                    "sigma",
                    "delta",
                )
                .join(prev, ["source", "vid"])
                .select(
                    "source",
                    F.col("vid").alias("id"),
                    (
                        F.col("sigma_v") / F.col("sigma") * (F.lit(1.0) + F.col("delta"))
                    ).alias("d"),
                )
                .groupBy("source", "id")
                .agg(F.sum("d").alias("delta"))
            )
            # NB: superseded deltas are NOT released — bc_parts keeps a
            # reference to every level's delta until the final union
            delta = contrib.localCheckpoint(eager=True)
            # deltas at this (now settled) predecessor level accumulate
            # into bc for non-source vertices
            bc_parts.append(
                delta.filter(F.col("id") != F.col("source")).select("id", "delta")
            )

        if bc_parts:
            allc = bc_parts[0]
            for p in bc_parts[1:]:
                allc = allc.unionByName(p)
            bc = allc.groupBy("id").agg(F.sum("delta").alias("bc"))
        else:
            bc = verts.select("id", F.lit(0.0).alias("bc"))
        bc = verts.join(bc, "id", "left_outer").select(
            "id", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc")
        )
        if normalized and n > 2:
            bc = bc.select("id", (F.col("bc") / ((n - 1) * (n - 2))).alias("bc"))
        # materialize before the caller's finally unpersists e/verts —
        # the returned frame must not depend on the dropped caches
        return bc.localCheckpoint(eager=True)
