"""Connected components — min-label diffusion to fixed point.

The north star names "min-plus label diffusion"; the GraphBLAS form is a
MIN_SECOND semiring mxv iterated to fixpoint (SURVEY.md §2.11; the
reference ships the primitive, not a demo — expressible with its
``Vector.vxm(A, MIN_SECOND, accum=MIN)``).

    label[v] ← min(label[v], min_{(u,v) ∈ E} label[u])   until no change

Scale shape:
- Edges symmetrized once, repartitioned by ``src``, persisted.
- **Delta frontier** (north-rule requirement): after the first sweep only
  vertices whose label CHANGED last round propagate — the per-iteration
  join shrinks with the frontier, turning O(iters × |E|) into
  O(Σ frontier-adjacent edges). This is the GraphBLAS masked-vxm idiom
  (complement mask on the unchanged set) done Spark-side.
- Convergence = empty frontier (count action per iteration).
- Label skew (one giant component → one hot label value) is harmless:
  the groupBy key is the vertex id, not the label.
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
from pygraphblas_spark.algorithms.pagerank import BROADCAST_MAX_ROWS


def connected_components(
    edges: DataFrame,
    n: Optional[int] = None,
    max_iters: int = 100,
    directed: bool = False,
    checkpoint: Optional[CheckpointManager] = None,
    num_partitions: Optional[int] = None,
    strategy: str = "auto",
    init: Optional[DataFrame] = None,
    start_iteration: int = 0,
) -> DataFrame:
    """Connected components over an edge DataFrame (src, dst).

    ``init`` / ``start_iteration`` warm-start from a prior (id,
    component) state — e.g. the output of ``CheckpointManager.resume``
    — continuing the checkpoint numbering.

    Returns (id: long, component: long) where component is the minimum
    vertex id in the component — exact, deterministic labels.
    ``directed=False`` (default) symmetrizes, computing undirected CCs.
    ``strategy``: 'kernel' (dense CSR-block gather-scatter, zero shuffles
    per iteration, n ≤ ~10M) | 'join' (fully distributed) | 'auto'.
    """
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="cc")
    if strategy in ("auto", "kernel"):
        from pygraphblas_spark.kernels.csr_dense import (
            DENSE_KERNEL_MAX_ROWS,
            cc_dense_kernel,
        )

        kn = n
        if kn is None and strategy == "auto":
            mx = edges.agg(F.max("src"), F.max("dst")).first()
            kn = int(max(mx[0], mx[1])) + 1 if mx[0] is not None else 0
        if strategy == "kernel" or kn <= DENSE_KERNEL_MAX_ROWS:
            return cc_dense_kernel(
                edges,
                n=kn,
                max_iters=max_iters,
                directed=directed,
                num_blocks=num_partitions,
                checkpoint=ckpt,
                init=init,
                start_iteration=start_iteration,
            )
    with iteration_conf(spark):
        return _cc_loop(
            spark, edges, n, max_iters, directed, ckpt, num_partitions,
            init, start_iteration,
        )


def _cc_loop(spark, edges, n, max_iters, directed, ckpt, num_partitions,
             init=None, start_iteration=0):
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    else:
        e = e.repartition("src")
    # pre-sort by the per-iteration join key: the cached ordering is
    # reused by every round's sort-merge join (only the label/frontier
    # side sorts; the edge table never moves or re-sorts)
    e = e.sortWithinPartitions("src")
    e = e.persist()

    if n is None:
        mx = e.agg(F.max("src"), F.max("dst")).first()
        n = int(max(mx[0], mx[1])) + 1 if mx[0] is not None else 0
    else:
        e.count()

    # label[v] = v — or the warm-start state
    if init is not None:
        labels = init.select("id", "component")
    else:
        labels = spark.range(n).select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    # frontier: vertices whose label changed last round (all, initially —
    # a warm start conservatively re-propagates every label once)
    frontier = labels.select("id", "component")
    frontier_rows = n
    for it in range(max_iters):
        # propagate only frontier labels: min incoming label per dst.
        # The frontier SHRINKS every round — broadcast it once it fits
        # (it usually does after round 1), so the edge table never moves.
        fv = (
            F.broadcast(frontier)
            if frontier_rows <= BROADCAST_MAX_ROWS
            else frontier
        )
        prop = (
            e.join(fv, e["src"] == frontier["id"])
            .groupBy(e["dst"].alias("pid"))
            .agg(F.min("component").alias("new_component"))
        )
        # merge: keep the smaller of old and proposed label; lazy lineage
        # cut + the changed-count reduce = ONE job per iteration
        merged = (
            labels.join(prop, labels["id"] == F.col("pid"), "left_outer")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("new_component"), F.col("component")),
                ).alias("component"),
                F.coalesce(
                    F.col("new_component") < F.col("component"), F.lit(False)
                ).alias("__changed"),
            )
        )
        merged = merged.localCheckpoint(eager=False)
        changed = merged.agg(
            F.sum(F.col("__changed").cast("long"))
        ).first()[0]
        new_frontier = merged.filter(F.col("__changed")).select("id", "component")
        new_labels = merged.select("id", "component")
        states = ckpt.save(
            start_iteration + it + 1,
            {"labels": new_labels, "frontier": new_frontier},
            {"changed": changed, "n": n},
        )
        release_state(labels)
        labels, frontier = states["labels"], states["frontier"]
        frontier_rows = changed
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components: not converged after {max_iters} "
            f"iterations ({changed} labels still changing) — components "
            "may be split; raise max_iters (graph diameter bounds the "
            "iteration count)",
            RuntimeWarning,
        )

    e.unpersist()
    return labels
