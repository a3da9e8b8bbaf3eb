"""Louvain community detection — synchronous modularity-gain rounds with
multi-level contraction, deterministic tie-breaks.

The reference ships Louvain as a worked demo (``demo/Louvain.ipynb``
cells 5-6): a row-serial asynchronous sweep (``for j in kI: ... vxm``)
with ``random.choice`` tie-breaks, validated against the GraphChallenge
block-model ground-truth partitions (``demo/louvain_data/
*truePartition.tsv``, cell 9's ``compare_groups``). A serial sweep
doesn't distribute, so this module re-derives the method Spark-first:

- **Synchronous rounds.** Every vertex evaluates, in parallel, the
  modularity gain of moving to each neighboring community::

      score(j -> c) = w_jc - k_j * (K_c - [c = cur] * k_j) / 2m

  (w_jc = weight from j to members of c, k_j = strength of j, K_c =
  total strength of c, 2m = total weight) and moves to the argmax when
  it strictly beats staying. This is the standard distributed-Louvain
  first phase (Blondel et al. 2008 gain, evaluated synchronously).
- **Determinism.** Ties prefer the current community, then the smallest
  community id — no RNG anywhere (the reference's ``random.choice`` is
  pinned away, as SURVEY.md §7.3 requires for every algorithm here).
- **Rotating-bit gating.** Synchronous updates can oscillate (two
  vertices swapping communities forever). Round pair (2t, 2t+1) gates
  on bit ``t % B`` of the vertex id (B = bits of n): round 2t lets
  bit==0 vertices move, round 2t+1 lets bit==1. Every vertex is
  eligible once per round pair, and any two distinct ids differ in
  some bit, so every swap cycle is eventually applied asymmetrically
  and collapses into a merge — deterministic, no RNG. A level ends
  when no vertex has a strictly positive move (gate ignored) or after
  ``max_iters`` rounds.
- **Contraction (phase 2).** Converged communities collapse into
  super-vertices (intra-community weight becomes a self-loop, which
  stays in k and 2m but never counts toward w_jc), and phase 1 reruns
  on the contracted graph — the full multi-level Louvain the serial
  demo skips (it runs one level; contraction lets the synchronous
  variant merge residual fragments and match the same ground truth).

Community ids are canonicalized to the MINIMUM ORIGINAL VERTEX ID of
each community, so results are stable across tiers and engines.

Two execution tiers with identical semantics (bit-equal on integer-
weighted graphs; float ULP order effects can differ on weighted input):

- in-core (local master, nnz <= INCORE_MAX_NNZ): the whole level loop
  is vectorized numpy driver-side — sort + reduceat for w_jc, bincount
  for K_c, lexsort argmax — zero Spark jobs per round.
- join (any size): per round, one edges-to-labels join (labels
  broadcast while small, the persisted edge table never re-shuffles —
  the LPA plan shape) plus two small aggregations; the move count rides
  the same lazy-localCheckpoint single-job pattern as pagerank/cc/lpa.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.algorithms.pagerank import BROADCAST_MAX_ROWS
from pygraphblas_spark.plans.checkpoint import (
    CheckpointManager,
    iteration_conf,
    release_state,
)

GAIN_EPS = 1e-12


def louvain(
    edges: DataFrame,
    n: Optional[int] = None,
    weight_col: Optional[str] = None,
    max_iters: int = 40,
    max_levels: int = 10,
    strategy: str = "auto",
    num_partitions: Optional[int] = None,
    checkpoint: Optional[CheckpointManager] = None,
    init: Optional[DataFrame] = None,
    start_level: int = 0,
) -> DataFrame:
    """Louvain communities over an edge DataFrame (src, dst[, weight]).

    The graph is treated as undirected (edges are symmetrized by sum,
    matching the reference demo's ``G = A.T + A``). Returns
    (id: long, community: long) for every vertex in [0, n); community
    ids are the minimum member vertex id. Deterministic.

    ``strategy``: 'incore' (driver-side numpy level loop, local mode,
    nnz <= INCORE_MAX_NNZ) | 'join' (fully distributed) | 'auto'.

    ``checkpoint`` records one manifest entry per LEVEL (durable cadence
    writes the cumulative (id, community) mapping — the complete resume
    state, since contracting the original edges by it reproduces the
    level graph exactly). ``init`` + ``start_level`` warm-start from a
    prior mapping (e.g. ``CheckpointManager.resume``'s ``assign`` state
    or a previous ``louvain`` result; community ids must be member
    vertex ids, which both provide), continuing the level numbering.
    """
    spark = edges.sparkSession
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        w.alias("w"),
    )
    if strategy in ("auto", "incore"):
        from pygraphblas_spark.kernels.csr_dense import INCORE_MAX_NNZ

        if spark.sparkContext.master.startswith("local") and (
            strategy == "incore" or e.count() <= INCORE_MAX_NNZ
        ):
            return _louvain_incore(
                spark, e, n, max_iters, max_levels,
                checkpoint=checkpoint, init=init, start_level=start_level,
            )
    with iteration_conf(spark):
        return _louvain_join(
            spark, e, n, max_iters, max_levels, num_partitions,
            checkpoint=checkpoint, init=init, start_level=start_level,
        )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: Optional[str] = None,
) -> float:
    """Newman modularity Q of a labeling over an undirected graph.

    Q = (1/2m) * sum_ij (A_ij - k_i k_j / 2m) [c_i = c_j], computed on
    the symmetrized graph. ``labels`` is (id, community). Pure
    DataFrame aggregation — one join, two small aggs."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    g = e.unionByName(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    lab = labels.select(
        F.col("id").alias("__lid"), F.col("community").alias("__c")
    )
    two_m = g.agg(F.sum("w")).first()[0]
    if not two_m:
        return 0.0
    # intra-community weight (both directions, so already 2*internal)
    intra = (
        g.join(lab, g["src"] == F.col("__lid"))
        .drop("__lid")
        .withColumnRenamed("__c", "__ca")
        .join(lab, F.col("dst") == F.col("__lid"))
        .filter(F.col("__ca") == F.col("__c"))
        .agg(F.sum("w"))
        .first()[0]
        or 0.0
    )
    # sum over communities of K_c^2
    kdf = g.groupBy("src").agg(F.sum("w").alias("k"))
    ksq = (
        kdf.join(lab, kdf["src"] == F.col("__lid"))
        .groupBy("__c")
        .agg(F.sum("k").alias("K"))
        .agg(F.sum(F.col("K") * F.col("K")))
        .first()[0]
        or 0.0
    )
    return float(intra / two_m - ksq / (two_m * two_m))


# ---------------------------------------------------------------------
# in-core tier
# ---------------------------------------------------------------------


def _contract_incore(ls, ld, lw, labels, n):
    """Aggregate weights over (labels[src], labels[dst]) — intra-community
    weight becomes the super-vertex self-loop."""
    cs = labels[ls]
    cd = labels[ld]
    key = cs * n + cd
    order = np.argsort(key, kind="stable")
    ks = key[order]
    ws = lw[order]
    bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    ukey = ks[bounds]
    return ukey // n, ukey % n, np.add.reduceat(ws, bounds)


def _louvain_incore(spark, e, n, max_iters, max_levels,
                    checkpoint=None, init=None, start_level=0):
    import pandas as pd

    tbl = e.select("src", "dst", "w").toArrow()
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    wv = tbl.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1 if len(src) else 0
    if n == 0:
        return spark.createDataFrame([], "id long, community long")

    # symmetrize by sum (G = A.T + A): both directions, self-loops doubled
    ls = np.r_[src, dst]
    ld = np.r_[dst, src]
    lw = np.r_[wv, wv]
    assign = np.arange(n, dtype=np.int64)
    if init is not None:
        t = init.select("id", "community").toArrow()
        assign[t.column("id").to_numpy(zero_copy_only=False)] = (
            t.column("community").to_numpy(zero_copy_only=False)
        )
        # pre-contract the original graph by the warm-start mapping —
        # reproduces the level graph the prior run ended on exactly
        ls, ld, lw = _contract_incore(ls, ld, lw, assign, n)

    for _level in range(start_level, start_level + max_levels):
        labels, any_moved = _level_incore(ls, ld, lw, n, max_iters)
        if not any_moved:
            if checkpoint is not None:
                checkpoint.record(_level, {"moved": 0, "converged": True})
            break
        assign = labels[assign]
        # canonicalize to min-ORIGINAL-member ids every level (not just at
        # the end): level-graph vertex ids are then well-defined canonical
        # communities, so a warm start (init=prior result) reproduces the
        # exact same level graph and tie-breaks as the straight run
        canon = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(canon, assign, np.arange(n, dtype=np.int64))
        assign = canon[assign]
        ls, ld, lw = _contract_incore(ls, ld, lw, canon[labels], n)
        if checkpoint is not None:
            metrics = {
                "moved": 1,
                "communities": int(len(np.unique(assign))),
            }
            if checkpoint.durable:
                adf = spark.createDataFrame(
                    pd.DataFrame(
                        {"id": np.arange(n, dtype=np.int64),
                         "community": assign}
                    )
                )
                checkpoint.save(_level, {"assign": adf}, metrics)
            else:
                checkpoint.record(_level, metrics)

    # canonical community ids: minimum original member id
    canon = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(canon, assign, np.arange(n, dtype=np.int64))
    out = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "community": canon[assign]}
    )
    return spark.createDataFrame(out)


def _level_incore(ls, ld, lw, n, max_iters):
    """One synchronous phase-1 level in numpy. Vertex/community id space
    is the ORIGINAL [0, n) at every level (community ids are always
    existing vertex ids), so parity gating and tie-breaks are identical
    across levels and tiers."""
    labels = np.arange(n, dtype=np.int64)
    k = np.zeros(n, dtype=np.float64)
    np.add.at(k, ls, lw)
    two_m = float(lw.sum())
    if two_m == 0.0 or len(ls) == 0:
        return labels, False
    nonself = ls != ld
    ss, dd, ww = ls[nonself], ld[nonself], lw[nonself]
    ids = np.arange(n, dtype=np.int64)
    nbits = max(1, int(n - 1).bit_length())

    any_moved = False
    for r in range(max_iters):
        # w_jc: neighbor weight into each adjacent community
        key = ss * n + labels[dd]
        order = np.argsort(key, kind="stable")
        ks_, ws_ = key[order], ww[order]
        bounds = np.flatnonzero(np.r_[True, ks_[1:] != ks_[:-1]])
        ukey = ks_[bounds]
        wjc = np.add.reduceat(ws_, bounds)
        j = ukey // n
        c = ukey % n
        # guaranteed stay option (w = 0) for every vertex
        j2 = np.r_[j, ids]
        c2 = np.r_[c, labels]
        w2 = np.r_[wjc, np.zeros(n)]

        K = np.bincount(labels, weights=k, minlength=n)
        cur = labels[j2]
        is_cur = c2 == cur
        keff = K[c2] - np.where(is_cur, k[j2], 0.0)
        score = w2 - k[j2] * keff / two_m

        # stay score: max over the current-community rows per vertex
        stay = np.full(n, -np.inf)
        np.maximum.at(stay, j2[is_cur], score[is_cur])

        # argmax per vertex: score desc, then prefer cur, then min c
        ord2 = np.lexsort((-c2, is_cur, score, j2))
        sj = j2[ord2]
        last = np.flatnonzero(np.r_[sj[1:] != sj[:-1], True])
        rows = ord2[last]
        bj, bc, bs = j2[rows], c2[rows], score[rows]

        want = (bc != labels[bj]) & (bs > stay[bj] + GAIN_EPS)
        if not want.any():
            break  # converged: nobody gains by moving, gate ignored
        bit = (r // 2) % nbits
        move = want & (((bj >> bit) & 1) == (r % 2))
        if move.any():
            labels = labels.copy()
            labels[bj[move]] = bc[move]
            any_moved = True
    return labels, any_moved


# ---------------------------------------------------------------------
# join tier
# ---------------------------------------------------------------------


def _louvain_join(spark, e, n, max_iters, max_levels, num_partitions,
                  checkpoint=None, init=None, start_level=0):
    if n is None:
        mx = e.agg(F.max("src"), F.max("dst")).first()
        n = int(max(mx[0], mx[1])) + 1 if mx[0] is not None else 0
    if n == 0:
        return spark.createDataFrame([], "id long, community long")

    g = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    g = g.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    if init is not None:
        # total-ize the warm-start mapping first: vertices missing from a
        # partial init self-map (id → id), exactly the in-core tier's
        # arange-then-overwrite initialization. The previous inner joins
        # against a partial init silently dropped those vertices' edges
        # AND their output rows.
        assign = (
            spark.range(n)
            .join(init.select("id", "community"), "id", "left")
            .select(
                "id", F.coalesce("community", F.col("id")).alias("community")
            )
            .localCheckpoint(eager=True)
        )
        # pre-contract the symmetrized graph by the (now-total) mapping
        lab_s = assign.select(F.col("id").alias("__i"), F.col("community").alias("__cs"))
        lab_d = assign.select(F.col("id").alias("__i"), F.col("community").alias("__cd"))
        g = (
            g.join(lab_s, g["src"] == lab_s["__i"]).drop("__i")
            .join(lab_d, F.col("dst") == lab_d["__i"])
            .groupBy(F.col("__cs").alias("src"), F.col("__cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
    else:
        assign = spark.range(n).select("id", F.col("id").alias("community"))
        assign = assign.localCheckpoint(eager=True)
    g = g.localCheckpoint(eager=True)

    for _level in range(start_level, start_level + max_levels):
        labels, any_moved = _level_join(
            spark, g, n, max_iters, num_partitions
        )
        if not any_moved:
            if checkpoint is not None:
                checkpoint.record(_level, {"moved": 0, "converged": True})
            release_state(labels)
            break
        new_raw = assign.join(
            labels.select(
                F.col("id").alias("__cid"),
                F.col("label").alias("__new"),
            ),
            assign["community"] == F.col("__cid"),
        ).select("id", F.col("__new").alias("community"))
        # canonicalize to min-member ids every level (see in-core note:
        # makes warm starts bit-exact vs the straight run); materialize
        # canon FIRST — everything below depends on it, and the old
        # assign/labels it reads from are released at the end of the loop
        canon = (
            new_raw.groupBy("community")
            .agg(F.min("id").alias("__canon"))
            .localCheckpoint(eager=True)
        )
        new_assign = (
            new_raw.join(canon, "community")
            .select("id", F.col("__canon").alias("community"))
            .localCheckpoint(eager=True)
        )
        labels_canon = (
            labels.join(
                canon.withColumnRenamed("community", "__lab"),
                labels["label"] == F.col("__lab"),
            )
            .select("id", F.col("__canon").alias("label"))
            .localCheckpoint(eager=True)
        )
        release_state(assign)
        release_state(labels)
        release_state(canon)
        assign = new_assign
        labels = labels_canon
        lab_s = labels.select(F.col("id").alias("__i"), F.col("label").alias("__cs"))
        lab_d = labels.select(F.col("id").alias("__i"), F.col("label").alias("__cd"))
        g2 = (
            g.join(lab_s, g["src"] == lab_s["__i"]).drop("__i")
            .join(lab_d, F.col("dst") == lab_d["__i"])
            .groupBy(
                F.col("__cs").alias("src"), F.col("__cd").alias("dst")
            )
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        release_state(labels)
        g = g2
        if checkpoint is not None:
            checkpoint.save(_level, {"assign": assign}, {"moved": 1})

    # canonical ids: minimum original member id per community
    canon = assign.groupBy("community").agg(F.min("id").alias("__canon"))
    out = (
        assign.join(canon, "community")
        .select("id", F.col("__canon").alias("community"))
    )
    return out


def _level_join(spark, g, n, max_iters, num_partitions):
    """One synchronous phase-1 level as DataFrame rounds — semantics
    identical to ``_level_incore`` (same scores, same tie-breaks, same
    parity gate), one edges-to-labels join per round."""
    gn = g.filter(F.col("src") != F.col("dst"))
    if num_partitions:
        gn = gn.repartition(num_partitions, "dst")
    else:
        gn = gn.repartition("dst")
    gn = gn.sortWithinPartitions("dst").persist()
    kdf = (
        g.groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("k"))
        .persist()
    )
    two_m = g.agg(F.sum("w")).first()[0]
    if not two_m:
        gn.unpersist()
        kdf.unpersist()
        labels = spark.range(n).select("id", F.col("id").alias("label"))
        return labels.localCheckpoint(eager=True), False

    labels = spark.range(n).select("id", F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    any_moved = False
    nbits = max(1, int(n - 1).bit_length())
    for r in range(max_iters):
        lv = F.broadcast(labels) if n <= BROADCAST_MAX_ROWS else labels
        wjc = (
            gn.join(lv, gn["dst"] == lv["id"])
            .groupBy(gn["src"].alias("j"), F.col("label").alias("c"))
            .agg(F.sum("w").alias("wjc"))
        )
        stay0 = labels.select(
            F.col("id").alias("j"),
            F.col("label").alias("c"),
            F.lit(0.0).alias("wjc"),
        )
        cand = wjc.unionByName(stay0)
        kc = (
            labels.join(kdf, "id")
            .groupBy(F.col("label").alias("c"))
            .agg(F.sum("k").alias("K"))
        )
        cur = labels.select(
            F.col("id").alias("j"), F.col("label").alias("cur")
        )
        kj = kdf.select(F.col("id").alias("j"), F.col("k").alias("kj"))
        scored = (
            cand.join(F.broadcast(kc) if n <= BROADCAST_MAX_ROWS else kc, "c")
            .join(F.broadcast(cur) if n <= BROADCAST_MAX_ROWS else cur, "j")
            .join(F.broadcast(kj) if n <= BROADCAST_MAX_ROWS else kj, "j")
            .select(
                "j",
                "c",
                "cur",
                (F.col("c") == F.col("cur")).alias("is_cur"),
                (
                    F.col("wjc")
                    - F.col("kj")
                    * (
                        F.col("K")
                        - F.when(
                            F.col("c") == F.col("cur"), F.col("kj")
                        ).otherwise(F.lit(0.0))
                    )
                    / F.lit(float(two_m))
                ).alias("score"),
            )
        )
        best = scored.groupBy("j").agg(
            F.max(
                F.struct(
                    F.col("score"),
                    F.col("is_cur"),
                    (-F.col("c")).alias("negc"),
                )
            ).alias("b"),
            F.max(F.when(F.col("is_cur"), F.col("score"))).alias("stay"),
            F.first("cur").alias("cur"),
        )
        bit = (r // 2) % nbits
        want = (F.col("b.negc") != -F.col("cur")) & (
            F.col("b.score") > F.col("stay") + F.lit(GAIN_EPS)
        )
        gate = (
            F.shiftright(F.col("j"), bit).bitwiseAND(F.lit(1)) == F.lit(r % 2)
        )
        decided = best.select(
            F.col("j").alias("id"),
            F.when(want & gate, -F.col("b.negc"))
            .otherwise(F.col("cur"))
            .alias("label"),
            want.alias("__want"),
            (want & gate).alias("__applied"),
        )
        # lazy lineage cut + the two counts = ONE job per round
        decided = decided.localCheckpoint(eager=False)
        counts = decided.agg(
            F.sum(F.col("__want").cast("long")),
            F.sum(F.col("__applied").cast("long")),
        ).first()
        new_labels = decided.select("id", "label")
        release_state(labels)
        labels = new_labels
        if counts[1]:
            any_moved = True
        if not counts[0]:
            break  # converged: nobody gains by moving, gate ignored
    gn.unpersist()
    kdf.unpersist()
    return labels, any_moved
