"""CSR-kernel SpMV path: equality with the join path and the oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.algorithms import pagerank
from pygraphblas_spark.kernels.csr import pagerank_csr, spmv_csr
from tests.oracles import pagerank_oracle

PR_I = [1, 2, 3, 4, 5, 3, 4, 4, 5, 6, 6, 7, 7, 8, 8, 9, 10]
PR_J = [2, 1, 1, 1, 1, 0, 3, 5, 4, 1, 4, 1, 4, 1, 4, 4, 4]


def edges_df(spark, I, J, vals=None):
    if vals is None:
        vals = [1.0] * len(I)
    return spark.createDataFrame(
        list(zip(map(int, I), map(int, J), map(float, vals))),
        "src long, dst long, val double",
    )


def test_spmv_csr_matches_join(spark):
    e = edges_df(spark, PR_I, PR_J)
    v = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(11)], "id long, val double"
    )
    got = {r["id"]: r["val"] for r in spmv_csr(e, v, num_blocks=4).collect()}
    # join-path PLUS_SECOND: y[dst] = Σ v[src]
    want = {
        r["dst"]: r["s"]
        for r in e.join(v, e["src"] == v["id"])
        .groupBy("dst")
        .agg(F.sum(v["val"]).alias("s"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_spmv_csr_times(spark):
    e = edges_df(spark, [0, 1], [1, 0], [2.0, 3.0])
    v = spark.createDataFrame([(0, 10.0), (1, 20.0)], "id long, val double")
    got = {r["id"]: r["val"] for r in spmv_csr(e, v, mul="times").collect()}
    assert got == {1: 20.0, 0: 60.0}


def test_pagerank_strategies_agree(spark):
    """broadcast / shuffle join paths and the dense block kernel produce
    identical ranks (1e-12) and match the numpy oracle (1e-6)."""
    e = edges_df(spark, PR_I, PR_J)
    want = pagerank_oracle(PR_I, PR_J, 11, tol=1e-8)
    results = {}
    for strat in ("broadcast", "shuffle", "kernel"):
        got = {
            r["id"]: r["rank"]
            for r in pagerank(e, n=11, tol=1e-8, strategy=strat).collect()
        }
        assert len(got) == 11, strat
        arr = np.array([got[i] for i in range(11)])
        assert np.allclose(arr, want, atol=1e-6), strat
        results[strat] = arr
    assert np.allclose(results["broadcast"], results["kernel"], atol=1e-12)
    assert np.allclose(results["broadcast"], results["shuffle"], atol=1e-12)


def test_pagerank_dense_kernel_durable_checkpoint(spark, tmp_path):
    """The dense kernel honors the CheckpointManager cadence: durable
    parquet states + manifest with rdiff metrics, resumable."""
    from pygraphblas_spark.kernels.csr_dense import pagerank_dense_kernel
    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    e = edges_df(spark, PR_I, PR_J)
    ck = CheckpointManager(root=str(tmp_path / "pr"), interval=2, algorithm="pr")
    pagerank_dense_kernel(e, n=11, tol=1e-8, max_iters=7, checkpoint=ck)
    resumed = CheckpointManager.resume(spark, str(tmp_path / "pr"))
    assert resumed is not None
    it, states, manifest = resumed
    assert it % 2 == 0 and it >= 2
    assert states["rank"].count() == 11
    recs = manifest["records"]
    assert all("rdiff" in r["metrics"] for r in recs)


def test_cc_lpa_dense_kernels_match_join(spark):
    """cc/lpa dense kernels produce exactly the join paths' labels."""
    from pygraphblas_spark.algorithms import (
        connected_components,
        label_propagation,
    )

    # two components + a tail; symmetrized by the algorithms
    I = [0, 1, 2, 5, 6, 7, 8, 3]
    J = [1, 2, 0, 6, 7, 5, 5, 4]
    e = edges_df(spark, I, J)
    cj = {r["id"]: r["component"]
          for r in connected_components(e, strategy="join").collect()}
    ck = {r["id"]: r["component"]
          for r in connected_components(e, strategy="kernel").collect()}
    assert cj == ck and len(cj) == 9
    assert ck[0] == ck[1] == ck[2] == 0
    assert ck[5] == ck[6] == ck[7] == ck[8] == 5
    assert ck[3] == ck[4] == 3

    lj = {r["id"]: r["label"]
          for r in label_propagation(e, max_iters=5, strategy="join").collect()}
    lk = {r["id"]: r["label"]
          for r in label_propagation(e, max_iters=5, strategy="kernel").collect()}
    assert lj == lk and len(lk) == 9


def test_pagerank_csr_matches_oracle_and_join(spark):
    e = edges_df(spark, PR_I, PR_J)
    got_csr = {
        r["id"]: r["rank"]
        for r in pagerank_csr(e, n=11, tol=1e-8, num_blocks=4).collect()
    }
    want = pagerank_oracle(PR_I, PR_J, 11, tol=1e-8)
    arr = np.array([got_csr[i] for i in range(11)])
    assert np.allclose(arr, want, atol=1e-6)
    got_join = {
        r["id"]: r["rank"] for r in pagerank(e, n=11, tol=1e-8).collect()
    }
    for i in range(11):
        assert got_csr[i] == pytest.approx(got_join[i], abs=1e-9)


def test_all_three_tiers_agree(spark):
    """The engine has three iteration tiers: in-core driver rounds
    (local mode, nnz ≤ INCORE_MAX_NNZ — what a default small-graph call
    takes), the fused memmap-scatter loop (local, engine pre-built), and
    the cluster-mode broadcast+collect loop (forced by flipping
    ``local_mode`` on a pre-built engine — broadcast transport works in
    local mode too). All three must stay equivalent: exactly for the
    integer label updates, to 1e-12 for PageRank (fp sum order)."""
    from pygraphblas_spark.kernels.csr_dense import (
        _BlockEngine,
        _symmetrized,
        cc_dense_kernel,
        lpa_dense_kernel,
        pagerank_dense_kernel,
    )
    from pygraphblas_spark.plans.checkpoint import iteration_conf

    e = edges_df(spark, PR_I, PR_J).select("src", "dst")

    # tier 1: default call → in-core driver rounds
    incore_pr = {
        r["id"]: r["rank"]
        for r in pagerank_dense_kernel(e, n=11, tol=1e-10, max_iters=50).collect()
    }
    incore_cc = {
        r["id"]: r["component"] for r in cc_dense_kernel(e, n=11).collect()
    }
    incore_lpa = {
        r["id"]: r["label"] for r in lpa_dense_kernel(e, n=11, max_iters=8).collect()
    }

    def run_pr_cc_lpa(flip_local):
        with iteration_conf(spark):
            eng = _BlockEngine(e, 11, 4).build()
            eng_s = _BlockEngine(_symmetrized(e, False), 11, 4).build()
        if flip_local:
            eng.local_mode = eng_s.local_mode = False
        pr = {
            r["id"]: r["rank"]
            for r in pagerank_dense_kernel(
                e, n=11, tol=1e-10, max_iters=50, engine=eng
            ).collect()
        }
        cc = {
            r["id"]: r["component"]
            for r in cc_dense_kernel(e, n=11, directed=False, engine=eng_s).collect()
        }
        lpa = {
            r["id"]: r["label"]
            for r in lpa_dense_kernel(
                e, n=11, max_iters=8, directed=False, engine=eng_s
            ).collect()
        }
        eng.close()
        eng_s.close()
        return pr, cc, lpa

    # tier 2: pre-built engine, local → fused memmap loop
    # tier 3: local_mode flipped off → cluster broadcast+collect loop
    for flip in (False, True):
        pr, cc, lpa = run_pr_cc_lpa(flip)
        assert pr.keys() == incore_pr.keys()
        for k in pr:
            assert pr[k] == pytest.approx(incore_pr[k], abs=1e-12)
        assert cc == incore_cc
        assert lpa == incore_lpa


def test_cc_contraction_converges_on_deep_paths(spark):
    """FastSV-style hook+contract between diffusion rounds: a path graph
    with shuffled vertex ids has O(length) plain-diffusion rounds (the
    min label crawls local-minimum to local-minimum), far past the
    default ``max_iters=100`` for a 3000-vertex path. The contraction
    step (kernels/csr_dense.py ``_contract_labels``) must bring every
    tier to the exact min-id labeling within O(log length) rounds.

    Reference parity: the reference converges such graphs too (its CC
    demo iterates a GrB_mxv fixpoint in C at ~ns/round, so round count
    is immaterial there); in Spark each round is a job, so round count
    IS the latency — this is a behavioral requirement the Spark
    re-expression adds, not one it inherits."""
    import numpy as np

    from pygraphblas_spark.kernels.csr_dense import (
        _BlockEngine,
        _symmetrized,
        cc_dense_kernel,
    )
    from pygraphblas_spark.plans.checkpoint import (
        CheckpointManager,
        iteration_conf,
    )

    n = 3000
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    I = perm[:-1].tolist()
    J = perm[1:].tolist()
    e = edges_df(spark, I, J)

    # in-core tier (default local call)
    ck = CheckpointManager(algorithm="cc_path_incore")
    got = cc_dense_kernel(e, n=n, checkpoint=ck).toPandas()
    assert sorted(got["component"].unique()) == [0]  # one component, min id 0
    assert len(ck.records) <= 20, f"{len(ck.records)} rounds (want O(log n))"

    # fused memmap tier (pre-built engine)
    with iteration_conf(spark):
        eng = _BlockEngine(_symmetrized(e, False), n, 4).build()
    ck2 = CheckpointManager(algorithm="cc_path_fused")
    got2 = cc_dense_kernel(e, n=n, directed=False, engine=eng, checkpoint=ck2).toPandas()
    eng.close()
    assert sorted(got2["component"].unique()) == [0]
    assert len(ck2.records) <= 20, f"{len(ck2.records)} rounds (want O(log n))"
    assert got2.sort_values("id")["component"].tolist() == got.sort_values("id")["component"].tolist()


def test_delta_frontier_vote_matches_full_vote():
    """Delta-frontier rounds (`_affected_segments` + sub-CSR re-vote)
    must be bit-identical to the always-full vote for both LPA and CC,
    including CC's contraction interplay (contraction-changed labels
    feed the next round's frontier). Run the loop with the frontier
    forced on after round 1 (DIV=1) vs forced off (huge DIV) on random
    graphs, directed and symmetrized."""
    from functools import partial

    from pygraphblas_spark.kernels import csr_dense as K

    rng = np.random.default_rng(11)
    for trial, (n, m, sym) in enumerate(
        [(200, 700, True), (500, 1500, False), (300, 4000, True)]
    ):
        s = rng.integers(0, n, m)
        d = rng.integers(0, n, m)
        if sym:
            s, d = np.r_[s, d], np.r_[d, s]
        K2 = np.unique(d * n + s)
        dstk = K2 // n
        starts = np.flatnonzero(np.r_[True, dstk[1:] != dstk[:-1]]).astype(
            "int64"
        )
        uniq, src = dstk[starts], K2 % n

        def run(block_fn, shortcut, div):
            old = K.DELTA_FRONTIER_DIV
            K.DELTA_FRONTIER_DIV = div
            try:
                from pygraphblas_spark.plans.checkpoint import (
                    CheckpointManager,
                )

                labels, conv = K._label_incore_loop(
                    None, CheckpointManager(algorithm="t"), n, uniq,
                    starts, src, 30, block_fn, "label", shortcut=shortcut,
                )
            finally:
                K.DELTA_FRONTIER_DIV = old
            return labels, conv

        for block_fn, shortcut in (
            (partial(K._lpa_block_update, base=n + 1), False),
            (K._cc_block_update, True),
        ):
            full, cf = run(block_fn, shortcut, 10**9)
            delta, cd = run(block_fn, shortcut, 1)
            assert cf == cd, (trial, shortcut)
            assert np.array_equal(full, delta), (trial, shortcut)
