"""Betweenness centrality — batched multi-source Brandes, in waves.

Reference (``gap/bcmark.py:16-67``, ``demo/BetweenessCentrality.ipynb``
cell 1): a forward phase of frontier pushes with the PLUS_FIRST semiring
(σ path counts), levels recorded per depth, then a backward dependency
sweep accumulating δ = Σ_succ (σ_v/σ_w)(1+δ_w). The reference batches 4
sources into one matrix-valued frontier; we batch a WAVE of sources as a
``source`` key column — one DataFrame per phase, every join keyed on
``(source, vertex)`` so Spark parallelizes across sources AND vertices
(the same trick, transposed into relational form).

Scale shape:

- **Source waves** (``wave_size``): sources are processed in bounded
  batches; peak executor state is O(wave_size × levels × frontier) no
  matter how many sources are requested. Waves are formed by hash
  (``pmod(xxhash64(source), n_waves)``) — no driver-side source list.
- **State lifecycle**: each BFS level's sigma frame is released as soon
  as the backward sweep has consumed it; per-level deltas are released
  right after the wave's contribution union materializes; each wave's
  running-total checkpoint supersedes (and releases) the previous one.
- **Sampled default**: with ``sources=None`` a deterministic
  ``sample_sources``-vertex sample (smallest xxhash64(id) — the same
  idiom as similarity._sample_centroids) is used, matching how the GAP
  benchmark itself runs BC at scale. Pass ``exact=True`` for
  all-vertices exact BC (cost: |V| BFS traversals — wave batching keeps
  memory flat but the compute is inherently O(V·E)).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.plans.checkpoint import (
    CheckpointManager,
    iteration_conf,
    release_state,
)


def betweenness_centrality(
    edges: DataFrame,
    sources: Optional[Sequence[int]] = None,
    directed: bool = True,
    normalized: bool = False,
    max_levels: int = 10_000,
    wave_size: int = 64,
    sample_sources: int = 64,
    exact: bool = False,
    checkpoint: Optional[CheckpointManager] = None,
    init: Optional[DataFrame] = None,
    start_wave: int = 0,
    max_waves: Optional[int] = None,
) -> DataFrame:
    """Brandes betweenness over directed edges (src, dst).

    ``sources``: vertex ids to run from. Default (None): a deterministic
    ``sample_sources``-vertex sample, or every vertex when
    ``exact=True``. Sources are processed in waves of ``wave_size``.
    Returns (id: long, bc: double) for every vertex appearing in the
    graph; ``normalized`` divides by (n-1)(n-2) (directed convention).

    **Durable resume**: a 10k-source exact run is hours of waves — pass a
    durable ``checkpoint`` (root + interval) and each wave's RUNNING
    TOTAL is persisted with a manifest record. To resume after a crash,
    call ``CheckpointManager.resume(spark, root)`` → (wave, {"bc": df},
    manifest) and re-invoke with the SAME sources/wave_size plus
    ``init=states["bc"], start_wave=wave + 1`` — waves are formed by a
    deterministic source hash, so the remaining waves are exactly the
    unprocessed ones. ``max_waves`` bounds how many waves THIS invocation
    processes (budgeted operation / split runs); a bounded run returns
    the partial total, which is the valid ``init`` for the continuation.
    Any of these three arguments (or a durable checkpoint) routes the run
    to the wave engine — the in-core tier computes all sources in one
    shot and cannot resume mid-wave.
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

        if sources is not None:
            srcs = spark.createDataFrame(
                [(int(s),) for s in sources], "source long"
            )
            n_src = len(set(int(s) for s in sources))
        elif exact:
            srcs = verts.select(F.col("id").alias("source"))
            n_src = n
        else:
            srcs = (
                verts.orderBy(F.xxhash64(F.col("id")), F.col("id"))
                .limit(sample_sources)
                .select(F.col("id").alias("source"))
            )
            n_src = min(sample_sources, n)
        srcs = srcs.localCheckpoint(eager=True)

        # In-core tier: sub-crossover graphs with a bounded source set run
        # full numpy Brandes driver-side — zero Spark jobs per level
        # (same tier as pagerank/cc/lpa/bfs/sssp). The join-path waves
        # remain the cluster/exact-BC engine.
        from pygraphblas_spark.kernels.csr_dense import INCORE_MAX_NNZ

        ckpt = checkpoint or CheckpointManager(algorithm="betweenness")
        wave_engine_forced = (
            ckpt.durable
            or init is not None
            or start_wave > 0
            or max_waves is not None
        )
        if (
            not wave_engine_forced
            and spark.sparkContext.master.startswith("local")
            and n_src <= 4096
            and e.count() <= INCORE_MAX_NNZ
        ):
            try:
                src_ids = [r["source"] for r in srcs.collect()]
                bc_df = _bc_incore(spark, e, src_ids, max_levels)
                bc = verts.join(bc_df, "id", "left_outer").select(
                    "id", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc")
                )
                if normalized and n > 2:
                    bc = bc.select(
                        "id", (F.col("bc") / ((n - 1) * (n - 2))).alias("bc")
                    )
                return bc.localCheckpoint(eager=True)
            finally:
                e.unpersist()
                verts.unpersist()

        n_waves = max(1, -(-n_src // wave_size))
        end_wave = (
            n_waves
            if max_waves is None
            else min(n_waves, start_wave + max_waves)
        )
        try:
            bc = init
            for wv in range(start_wave, end_wave):
                wave_srcs = (
                    srcs
                    if n_waves == 1
                    else srcs.filter(
                        F.pmod(F.xxhash64(F.col("source")), F.lit(n_waves)) == wv
                    )
                )
                part = _bc_wave(spark, e, wave_srcs, max_levels)
                if part is not None:
                    if bc is None:
                        bc = part
                    else:
                        prev = bc
                        bc = (
                            bc.unionByName(part)
                            .groupBy("id")
                            .agg(F.sum("bc").alias("bc"))
                            .localCheckpoint(eager=True)
                        )
                        release_state(prev)
                        release_state(part)
                # per-wave durable running total + manifest record: the
                # crash-resume unit (empty waves still advance the marker)
                saved = ckpt.save(
                    wv,
                    {
                        "bc": bc
                        if bc is not None
                        else spark.createDataFrame([], "id long, bc double")
                    },
                    {"wave": wv, "n_waves": n_waves, "empty": part is None},
                )
                if ckpt.on_cadence(wv):
                    # swap to the durably-reloaded total; release the
                    # superseded localCheckpoint so executor storage
                    # holds one wave total, not one per cadence hit
                    reloaded = saved["bc"]
                    if bc is not None and reloaded is not bc:
                        release_state(bc)
                    bc = reloaded
            if bc is None:
                bc = verts.select("id", F.lit(0.0).alias("bc"))
            bc = verts.join(bc, "id", "left_outer").select(
                "id", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc")
            )
            if normalized and n > 2:
                bc = bc.select(
                    "id", (F.col("bc") / ((n - 1) * (n - 2))).alias("bc")
                )
            # materialize before the caller's finally unpersists e/verts —
            # the returned frame must not depend on the dropped caches
            return bc.localCheckpoint(eager=True)
        finally:
            e.unpersist()
            verts.unpersist()


def _bc_wave(spark, e, srcs, max_levels):
    """One wave of batched Brandes: returns (id, bc) partial sums for the
    wave's sources, or None when the wave is empty. All intermediate
    checkpoint state (levels, visited, deltas) is released before
    returning."""
    # forward: level 0 = the sources themselves, sigma = 1
    frontier = srcs.select(
        "source", F.col("source").alias("id"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    if frontier.isEmpty():
        release_state(frontier)
        return None
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
            release_state(nxt)
            break
        levels.append(nxt)
        prev_visited = visited
        visited = visited.unionByName(
            nxt.select("source", "id", "sigma", F.lit(depth).alias("level"))
        ).localCheckpoint(eager=True)
        release_state(prev_visited)
        frontier = nxt
    release_state(visited)

    # backward: delta over levels deepest-first. Levels are released as
    # soon as consumed; deltas after the union materializes.
    delta = None  # (source, id, delta)
    bc_parts = []
    deltas = []
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
        delta = contrib.localCheckpoint(eager=True)
        deltas.append(delta)
        # this level's sigma frame is fully consumed now (it was w at
        # this step and prev at the previous one)
        release_state(levels[lvl])
        # deltas at this (now settled) predecessor level accumulate
        # into bc for non-source vertices
        bc_parts.append(
            delta.filter(F.col("id") != F.col("source")).select("id", "delta")
        )
    release_state(levels[0])

    if not bc_parts:
        for d in deltas:
            release_state(d)
        return None
    allc = bc_parts[0]
    for p in bc_parts[1:]:
        allc = allc.unionByName(p)
    bc = (
        allc.groupBy("id")
        .agg(F.sum("delta").alias("bc"))
        .localCheckpoint(eager=True)
    )
    # union materialized → the per-level deltas can go
    for d in deltas:
        release_state(d)
    return bc


def _bc_incore(spark, e, src_ids, max_levels=10_000):
    """Vectorized numpy Brandes per source over a driver-side out-CSR
    (one Arrow pull). Each source costs O(E) of numpy gathers — the exact
    algorithm the join-path waves run, minus the per-level Spark jobs."""
    import numpy as np
    import pandas as pd

    from pygraphblas_spark.kernels.csr_dense import (
        _frontier_gather,
        _incore_out_csr,
    )

    n, indptr, dst, _ = _incore_out_csr(e)
    bc = np.zeros(n)
    for s in src_ids:
        s = int(s)
        if s < 0 or s >= n:
            continue  # source absent from the graph: no dependencies
        level = np.full(n, -1, dtype="int64")
        sigma = np.zeros(n)
        level[s] = 0
        sigma[s] = 1.0
        frontiers = [np.array([s], dtype="int64")]
        d = 0
        while d < max_levels:  # same truncation as the wave path
            idx, esrc = _frontier_gather(indptr, frontiers[-1])
            if len(idx) == 0:
                break
            neigh = dst[idx]
            # discover depth d+1
            fresh = level[neigh] < 0
            nxt = np.unique(neigh[fresh])
            if len(nxt) == 0:
                break
            level[nxt] = d + 1
            # count shortest paths along edges into depth d+1
            on_next = level[neigh] == d + 1
            np.add.at(sigma, neigh[on_next], sigma[esrc[on_next]])
            frontiers.append(nxt)
            d += 1
        # backward dependency sweep
        delta = np.zeros(n)
        for depth in range(len(frontiers) - 1, 0, -1):
            prev = frontiers[depth - 1]
            idx, esrc = _frontier_gather(indptr, prev)
            if len(idx) == 0:
                continue
            neigh = dst[idx]
            m = level[neigh] == depth
            contrib = (sigma[esrc[m]] / sigma[neigh[m]]) * (1.0 + delta[neigh[m]])
            np.add.at(delta, esrc[m], contrib)
        delta[s] = 0.0
        bc += delta
    ids = np.flatnonzero(bc != 0.0)
    if len(ids) == 0:
        return spark.createDataFrame([], "id long, bc double")
    return spark.createDataFrame(pd.DataFrame({"id": ids, "bc": bc[ids]}))
