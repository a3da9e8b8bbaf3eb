"""Label propagation (LPA) — synchronous rounds, deterministic tie-break.

The reference ships a modularity-based Louvain variant
(``demo/Louvain.ipynb`` cells 5-6, row-serial); plain LPA is expressible
with its semiring ops (SURVEY.md §2.11). Each round every vertex adopts the
most frequent label among its neighbors; ties break to the SMALLEST label
so results are exactly reproducible (the reference's ANY-semiring tie
behavior is nondeterministic — we pin it, as SURVEY.md §7.3 requires).

Spark shape per round (no per-row Python):

    counts  = edges ⋈ labels → groupBy(dst, label) → count
    winner  = counts → groupBy(dst) → max_by(struct(count, -label))
    labels' = winner (vertices with no neighbors keep their label)

The two-stage aggregation keeps hub skew off single reducers: stage 1
partial-aggregates (dst, label) pairs map-side; stage 2 reduces the much
smaller per-label counts.
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


def label_propagation(
    edges: DataFrame,
    n: Optional[int] = None,
    max_iters: int = 20,
    directed: bool = False,
    checkpoint: Optional[CheckpointManager] = None,
    num_partitions: Optional[int] = None,
    strategy: str = "auto",
    init: Optional[DataFrame] = None,
    start_iteration: int = 0,
) -> DataFrame:
    """Synchronous LPA over an edge DataFrame (src, dst).

    ``init`` / ``start_iteration`` warm-start from a prior (id, label)
    state — e.g. the output of ``CheckpointManager.resume`` —
    continuing the checkpoint numbering.

    Returns (id: long, label: long). Deterministic: most-frequent
    neighbor label, ties to the smallest label; stops when no vertex
    changes or after ``max_iters`` rounds.
    ``strategy``: 'kernel' (dense CSR-block vote kernel, zero shuffles
    per iteration, n ≤ ~10M) | 'join' (fully distributed) | 'auto'.
    """
    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="lpa")
    if strategy in ("auto", "kernel"):
        from pygraphblas_spark.kernels.csr_dense import (
            DENSE_KERNEL_MAX_ROWS,
            lpa_dense_kernel,
        )

        kn = n
        if kn is None and strategy == "auto":
            mx = edges.agg(F.max("src"), F.max("dst")).first()
            kn = int(max(mx[0], mx[1])) + 1 if mx[0] is not None else 0
        if strategy == "kernel" or kn <= DENSE_KERNEL_MAX_ROWS:
            return lpa_dense_kernel(
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
        return _lpa_loop(
            spark, edges, n, max_iters, directed, ckpt, num_partitions,
            init, start_iteration,
        )


def _lpa_loop(spark, edges, n, max_iters, directed, ckpt, num_partitions,
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

    if init is not None:
        labels = init.select("id", "label")
    else:
        labels = spark.range(n).select("id", F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iters):
        # neighbor label counts: two-stage agg (map-side partials absorb
        # hub skew before the shuffle). Labels are broadcast while they
        # fit so the persisted edge table never re-shuffles.
        lv = F.broadcast(labels) if n <= BROADCAST_MAX_ROWS else labels
        counts = (
            e.join(lv, e["src"] == labels["id"])
            .groupBy(e["dst"].alias("vid"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax with min-label tie-break: max of (cnt, -label)
        winner = counts.groupBy("vid").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("w")
        ).select(F.col("vid"), (-F.col("w.neg")).alias("new_label"))
        merged = labels.join(winner, labels["id"] == F.col("vid"), "left_outer").select(
            "id",
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            (F.coalesce(F.col("new_label"), F.col("label")) != F.col("label")).alias(
                "__changed"
            ),
        )
        # lazy lineage cut + changed-count reduce = ONE job per iteration
        merged = merged.localCheckpoint(eager=False)
        changed = merged.agg(F.sum(F.col("__changed").cast("long"))).first()[0]
        new_labels = merged.select("id", "label")
        states = ckpt.save(
            start_iteration + it + 1,
            {"labels": new_labels},
            {"changed": changed, "n": n},
        )
        release_state(labels)
        labels = states["labels"]
        if changed == 0:
            break

    e.unpersist()
    return labels
