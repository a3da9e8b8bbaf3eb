"""Algorithm correctness vs numpy oracles + the reference's documented
expectations (FIXTURES.md §3: PageRank 11-node graph, CC/LPA two-component
fixture, triangle fixtures)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygraphblas_spark import Matrix
from pygraphblas_spark.algorithms import (
    bfs_levels,
    connected_components,
    label_propagation,
    pagerank,
    sssp,
    triangle_count,
    triangle_count_sandia,
)
from tests.oracles import cc_oracle, lpa_oracle, pagerank_oracle, triangle_oracle

# FIXTURES.md §3b — the reference demo/PageRank.ipynb 11-node graph
PR_I = [1, 2, 3, 4, 5, 3, 4, 4, 5, 6, 6, 7, 7, 8, 8, 9, 10]
PR_J = [2, 1, 1, 1, 1, 0, 3, 5, 4, 1, 4, 1, 4, 1, 4, 4, 4]
PR_N = 11

# FIXTURES.md §3a — canonical 7-node doc graph
DOC_I = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
DOC_J = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]


def edges_df(spark, I, J, vals=None):
    if vals is None:
        vals = [1.0] * len(I)
    return spark.createDataFrame(
        list(zip(map(int, I), map(int, J), map(float, vals))),
        "src long, dst long, val double",
    )


def test_pagerank_11node_vs_oracle(spark):
    e = edges_df(spark, PR_I, PR_J)
    got = pagerank(e, n=PR_N, damping=0.85, tol=1e-4, max_iters=100)
    rows = {r["id"]: r["rank"] for r in got.collect()}
    want = pagerank_oracle(PR_I, PR_J, PR_N)
    got_arr = np.array([rows[i] for i in range(PR_N)])
    # north rule: per-vertex scores allclose 1e-6
    assert np.allclose(got_arr, want, atol=1e-6)
    # this is the Wikipedia PageRank example graph (reference
    # demo/PageRank.ipynb cell 4): B (=1) and C (=2) rank highest
    top2 = set(np.argsort(-got_arr)[:2])
    assert top2 == {1, 2}


def test_pagerank_strict_tolerance_vs_oracle(spark):
    # tighter tol exercises more iterations and the checkpoint path
    e = edges_df(spark, DOC_I, DOC_J)
    got = pagerank(e, n=7, tol=1e-10, max_iters=100)
    rows = {r["id"]: r["rank"] for r in got.collect()}
    want = pagerank_oracle(DOC_I, DOC_J, 7, tol=1e-10)
    assert np.allclose([rows[i] for i in range(7)], want, atol=1e-6)


def test_cc_two_components(spark):
    # FIXTURES.md §3d: path 0-1-2-3, triangle 4-5-6, isolated 7
    I = [0, 1, 2, 4, 5, 6]
    J = [1, 2, 3, 5, 6, 4]
    e = edges_df(spark, I, J)
    got = {r["id"]: r["component"] for r in connected_components(e, n=8).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}


def test_cc_vs_oracle_random(spark):
    rng = np.random.RandomState(7)
    n, m = 60, 120
    I = rng.randint(0, n, m).tolist()
    J = rng.randint(0, n, m).tolist()
    e = edges_df(spark, I, J)
    got = {r["id"]: r["component"] for r in connected_components(e, n=n).collect()}
    want = cc_oracle(I, J, n)
    assert got == {i: int(want[i]) for i in range(n)}


def test_lpa_vs_oracle(spark):
    # two dense cliques joined by one edge — LPA must separate them
    I = [0, 0, 1, 4, 4, 5, 3]
    J = [1, 2, 2, 5, 6, 6, 4]
    e = edges_df(spark, I, J)
    got = {r["id"]: r["label"] for r in label_propagation(e, n=7, max_iters=20).collect()}
    want = lpa_oracle(I, J, 7, max_iters=20)
    assert got == {i: int(want[i]) for i in range(7)}


def test_triangle_fixture(spark):
    # FIXTURES.md §3c: triangle + pendant = 1 triangle
    I = [0, 1, 0, 2]
    J = [1, 2, 2, 3]
    e = edges_df(spark, I, J)
    assert triangle_count(e) == 1


def test_triangle_7node(spark):
    e = edges_df(spark, DOC_I, DOC_J)
    want = triangle_oracle(DOC_I, DOC_J, 7)
    assert triangle_count(e) == want == 2


def test_triangle_sandia_matches_scalable(spark):
    # both implementations agree with the oracle on a random graph
    rng = np.random.RandomState(3)
    n, m = 40, 200
    I = rng.randint(0, n, m).tolist()
    J = rng.randint(0, n, m).tolist()
    e = edges_df(spark, I, J)
    want = triangle_oracle(I, J, n)
    assert triangle_count(e) == want

    sym = Matrix.from_lists(spark, I, J, True, n, n)
    sym = sym.eadd(sym.T, "LOR").offdiag()
    L = sym.tril(-1)
    assert triangle_count_sandia(L) == want


def test_triangle_strategies_agree(spark):
    # in-core / blocked CSR kernels / DataFrame join plan: identical
    # exact counts on random multigraph-ish inputs (dupes, self-loops)
    rng = np.random.RandomState(7)
    for n, m in ((25, 120), (60, 500), (100, 900)):
        I = rng.randint(0, n, m).tolist()
        J = rng.randint(0, n, m).tolist()
        e = edges_df(spark, I, J)
        want = triangle_oracle(I, J, n)
        assert triangle_count(e, strategy="incore") == want
        assert triangle_count(e, strategy="blocked") == want
        assert triangle_count(e, strategy="join") == want
        assert triangle_count(e) == want  # auto


def test_triangle_empty_and_tiny(spark):
    e = edges_df(spark, [], [])
    assert triangle_count(e) == 0
    e2 = edges_df(spark, [0], [0])  # lone self-loop
    assert triangle_count(e2) == 0


def test_triangle_cluster_shared_fs_no_driver_funnel(spark, monkeypatch, tmp_path):
    """The blocked kernel's CLUSTER path must never pull the oriented
    edge set through the driver (the r4 verdict's funnel,
    tri_csr.py): with a shared staging dir the task-side fs dump runs
    and every driver Arrow materialization stays bounded. Spy on
    DataFrame.toArrow and record result sizes — the only table allowed
    through is the per-range count (≤ num_blocks rows)."""
    from pyspark.sql.classic.dataframe import DataFrame as SparkDF

    from pygraphblas_spark.kernels import tri_csr

    rng = np.random.RandomState(17)
    n, m = 80, 700
    I = rng.randint(0, n, m).tolist()
    J = rng.randint(0, n, m).tolist()
    e = edges_df(spark, I, J).select("src", "dst")
    want = triangle_oracle(I, J, n)

    seen = []
    orig = SparkDF.toArrow

    def spy(self):
        tbl = orig(self)
        seen.append(tbl.num_rows)
        return tbl

    monkeypatch.setattr(SparkDF, "toArrow", spy)
    shared_root = tmp_path / "tri_shared"
    got = tri_csr.triangle_count_blocked(
        e, n, shared_dir=f"file://{shared_root}", use_shared_fs=True
    )
    assert got == want
    assert seen and max(seen) <= 64, seen
    # the unique staging subdir was cleaned up by the driver
    assert not any(shared_root.glob("tri_*"))


def test_blocked_driver_cap_from_memory(spark):
    """#8: the legacy driver-collect fallback's cap is DERIVED from
    spark.driver.memory, not a silent fixed constant."""
    from pygraphblas_spark.kernels import tri_csr

    assert tri_csr._parse_mem("4g") == 4 << 30
    assert tri_csr._parse_mem("512m") == 512 << 20
    assert tri_csr._parse_mem("2048") == 2048
    # Spark's JavaUtils also accepts two-letter suffixes and bare bytes
    assert tri_csr._parse_mem("16gb") == 16 << 30
    assert tri_csr._parse_mem("512mb") == 512 << 20
    assert tri_csr._parse_mem("1024b") == 1024
    mem = tri_csr._parse_mem(
        spark.sparkContext.getConf().get("spark.driver.memory", "1g")
    )
    n = 1000
    want = min((mem // 4 - 16 * n) // 24, tri_csr.BLOCKED_MAX_ORIENTED)
    assert tri_csr.blocked_driver_cap(spark, n) == want

    class _Conf:
        def get(self, k, d=None):
            return "64m"

    class _SC:
        def getConf(self):
            return _Conf()

    class _Spark:
        sparkContext = _SC()

    # a tiny driver caps out at zero rather than going negative
    assert tri_csr.blocked_driver_cap(_Spark(), n=10**9) == 0


def test_blocked_too_large_falls_back_to_join(spark, monkeypatch):
    """auto strategy: when the blocked tier raises BlockedIndexTooLarge
    (cluster, no shared dir, index over the driver cap) the DataFrame
    join plan owns the count."""
    from pygraphblas_spark.algorithms import triangles as T
    from pygraphblas_spark.kernels import csr_dense, tri_csr

    rng = np.random.RandomState(23)
    n, m = 50, 400
    I = rng.randint(0, n, m).tolist()
    J = rng.randint(0, n, m).tolist()
    e = edges_df(spark, I, J)
    want = triangle_oracle(I, J, n)

    hit = {}

    def boom(edges, nn, **kw):
        hit["blocked"] = True
        raise tri_csr.BlockedIndexTooLarge("test: over driver cap")

    monkeypatch.setattr(csr_dense, "INCORE_MAX_NNZ", 0)
    monkeypatch.setattr(tri_csr, "triangle_count_blocked", boom)
    assert triangle_count(e) == want
    assert hit.get("blocked")


def test_triangle_wedge_chunking(spark, monkeypatch):
    # force many tiny chunks through the vectorized enumerate so the
    # intra-segment split path is exercised
    from pygraphblas_spark.kernels import tri_csr

    monkeypatch.setattr(tri_csr, "WEDGE_CHUNK", 7)
    rng = np.random.RandomState(11)
    n, m = 30, 300
    I = rng.randint(0, n, m).tolist()
    J = rng.randint(0, n, m).tolist()
    e = edges_df(spark, I, J)
    want = triangle_oracle(I, J, n)
    assert triangle_count(e, strategy="incore") == want
    assert triangle_count(e, strategy="blocked") == want


def test_bfs_levels(spark):
    e = edges_df(spark, DOC_I, DOC_J)
    got = {r["id"]: r["level"] for r in bfs_levels(e, source=0).collect()}
    # hand-traced: 0 →{1,3}→{4,6,2}→{5}
    assert got == {0: 0, 1: 1, 3: 1, 4: 2, 6: 2, 2: 2, 5: 3}


def test_sssp(spark):
    # weighted diamond: 0→1 (1), 0→2 (4), 1→2 (1), 2→3 (1), 1→3 (5)
    e = edges_df(spark, [0, 0, 1, 2, 1], [1, 2, 2, 3, 3], [1.0, 4.0, 1.0, 1.0, 5.0])
    got = {r["id"]: r["dist"] for r in sssp(e, source=0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_pagerank_resume_from_checkpoint(spark, tmp_path):
    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    root = str(tmp_path / "ckpt")
    ckpt = CheckpointManager(root=root, interval=1, algorithm="pagerank")
    e = edges_df(spark, PR_I, PR_J)
    got = pagerank(e, n=PR_N, max_iters=3, checkpoint=ckpt)
    # resume picks up iteration 3's state
    resumed = CheckpointManager.resume(spark, root)
    assert resumed is not None
    it, states, manifest = resumed
    assert it == 3 and "rank" in states
    assert states["rank"].count() == PR_N
    # manifest carries convergence lineage
    assert [r["iteration"] for r in manifest["records"]] == [1, 2, 3]
    assert all("rdiff" in r["metrics"] for r in manifest["records"])
    # resumed state equals the returned result
    a = {r["id"]: r["rank"] for r in got.collect()}
    b = {r["id"]: r["rank"] for r in states["rank"].collect()}
    assert a == pytest.approx(b)


def test_resume_survives_truncated_manifest(spark, tmp_path):
    """A crash mid-manifest-write must not brick every later resume:
    resume() falls back to manifest.json.bak when manifest.json is
    truncated/unparseable, and returns None (not a parse crash) when
    neither survives."""
    import shutil

    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    root = str(tmp_path / "ckpt")
    ckpt = CheckpointManager(root=root, interval=1, algorithm="pagerank")
    e = edges_df(spark, PR_I, PR_J)
    pagerank(e, n=PR_N, max_iters=3, checkpoint=ckpt)
    manifest = tmp_path / "ckpt" / "manifest.json"
    good = manifest.read_text()

    # simulate the crash window: rotation done, new write truncated
    shutil.copy(manifest, str(manifest) + ".bak")
    manifest.write_text(good[: len(good) // 2])
    resumed = CheckpointManager.resume(spark, root)
    assert resumed is not None
    it, states, mf = resumed
    assert it == 3 and "rank" in states

    # both corrupt -> clean None, never a JSONDecodeError
    (tmp_path / "ckpt" / "manifest.json.bak").write_text("{not json")
    assert CheckpointManager.resume(spark, root) is None


def test_checkpoint_uri_root_via_hadoop_fs(spark, tmp_path):
    """URI-schemed checkpoint roots (object stores) go through the Hadoop
    FileSystem API for manifest I/O — exercised locally via file://."""
    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    root = "file://" + str(tmp_path / "ckpt_uri")
    ckpt = CheckpointManager(root=root, interval=1, algorithm="pagerank")
    e = edges_df(spark, PR_I, PR_J)
    got = pagerank(e, n=PR_N, max_iters=2, checkpoint=ckpt)
    resumed = CheckpointManager.resume(spark, root)
    assert resumed is not None
    it, states, manifest = resumed
    assert it == 2 and states["rank"].count() == PR_N
    assert [r["iteration"] for r in manifest["records"]] == [1, 2]
    a = {r["id"]: r["rank"] for r in got.collect()}
    b = {r["id"]: r["rank"] for r in states["rank"].collect()}
    assert a == pytest.approx(b)
    # nonexistent URI root resolves cleanly to None, not an OSError
    assert (
        CheckpointManager.resume(spark, "file://" + str(tmp_path / "nope"))
        is None
    )


def test_warm_start_continues_runs(spark, tmp_path):
    """Splitting a run at iteration k and continuing via init/
    start_iteration reproduces the unsplit run exactly — the
    north-rule 'resume mid-iteration' path, across every engine tier."""
    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    e = edges_df(spark, PR_I, PR_J)

    for strategy in ("kernel", "shuffle"):
        straight = {
            r["id"]: r["rank"]
            for r in pagerank(
                e, n=PR_N, tol=0.0, max_iters=6, strategy=strategy
            ).collect()
        }
        root = str(tmp_path / f"pr_{strategy}")
        ck = CheckpointManager(root=root, interval=1, algorithm="pagerank")
        pagerank(e, n=PR_N, tol=0.0, max_iters=3, strategy=strategy, checkpoint=ck)
        it, states, _ = CheckpointManager.resume(spark, root)
        assert it == 3
        ck2 = CheckpointManager(root=str(tmp_path / f"pr2_{strategy}"),
                                interval=1, algorithm="pagerank")
        cont = pagerank(
            e, n=PR_N, tol=0.0, max_iters=3, strategy=strategy,
            init=states["rank"], start_iteration=it, checkpoint=ck2,
        )
        got = {r["id"]: r["rank"] for r in cont.collect()}
        assert got == pytest.approx(straight, abs=1e-12), strategy
        # records continue the original numbering
        assert [r["iteration"] for r in ck2.records] == [4, 5, 6]

    for algo, col in ((connected_components, "component"),
                      (label_propagation, "label")):
        for strategy in ("kernel", "join"):
            straight = {
                r["id"]: r[col]
                for r in algo(e, n=PR_N, max_iters=4, strategy=strategy).collect()
            }
            half = algo(e, n=PR_N, max_iters=2, strategy=strategy)
            cont = algo(
                e, n=PR_N, max_iters=2, strategy=strategy,
                init=half, start_iteration=2,
            )
            got = {r["id"]: r[col] for r in cont.collect()}
            assert got == straight, (algo.__name__, strategy)


def test_betweenness_matches_brandes_oracle(spark):
    """Batched-source Brandes vs the plain-Python oracle, directed and
    undirected, on the canonical 7-node doc graph."""
    from pygraphblas_spark.algorithms import betweenness_centrality
    from tests.oracles import betweenness_oracle

    I = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
    J = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]
    e = spark.createDataFrame(list(zip(I, J)), "src long, dst long")

    for directed in (True, False):
        want = betweenness_oracle(I, J, 7, directed=directed)
        got = {
            r["id"]: r["bc"]
            for r in betweenness_centrality(e, directed=directed).collect()
        }
        for v in range(7):
            assert got.get(v, 0.0) == pytest.approx(want[v], abs=1e-9), (
                directed, v)


def test_betweenness_sampled_sources(spark):
    """Source sampling: running from a subset equals the oracle restricted
    to those sources."""
    from pygraphblas_spark.algorithms import betweenness_centrality

    I = [0, 1, 2, 3, 4]
    J = [1, 2, 3, 4, 0]  # 5-cycle
    e = spark.createDataFrame(list(zip(I, J)), "src long, dst long")
    got = {
        r["id"]: r["bc"]
        for r in betweenness_centrality(e, sources=[0, 2]).collect()
    }
    n = 5
    expect = {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}
    for s in (0, 2):
        # unique shortest paths in a directed 5-cycle: s->s+1..s+4; vertex
        # v strictly between s and t on the cycle gets +1 per (s,t) pair
        for t in range(n):
            if t == s:
                continue
            d = (t - s) % n
            for step in range(1, d):
                expect[(s + step) % n] += 1.0
    for v in range(n):
        assert got.get(v, 0.0) == pytest.approx(expect[v], abs=1e-9), v


def test_betweenness_waves_match_single_batch(spark):
    """Source waves (wave_size < n_sources) produce exactly the same BC
    as one batch — and exact=True covers all vertices."""
    from pygraphblas_spark.algorithms import betweenness_centrality
    from tests.oracles import betweenness_oracle

    I = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
    J = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]
    e = spark.createDataFrame(list(zip(I, J)), "src long, dst long")
    want = betweenness_oracle(I, J, 7, directed=True)
    got = {
        r["id"]: r["bc"]
        for r in betweenness_centrality(e, exact=True, wave_size=2).collect()
    }
    for v in range(7):
        assert got.get(v, 0.0) == pytest.approx(want[v], abs=1e-9), v


def test_betweenness_durable_resume_matches_straight_run(spark, tmp_path):
    """Split run — process 2 of 4 waves with a durable per-wave running
    total, crash, resume from the manifest — equals the straight run
    (mirrors test_warm_start_matches_straight_run for pagerank/louvain)."""
    from pygraphblas_spark.algorithms import betweenness_centrality
    from pygraphblas_spark.plans.checkpoint import CheckpointManager
    from tests.oracles import betweenness_oracle

    I = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
    J = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]
    e = spark.createDataFrame(list(zip(I, J)), "src long, dst long")
    want = betweenness_oracle(I, J, 7, directed=True)

    root = str(tmp_path / "bc_ck")
    ck = CheckpointManager(root=root, interval=1, algorithm="betweenness")
    # exact over 7 sources, wave_size=2 → 4 waves; stop after 2
    betweenness_centrality(e, exact=True, wave_size=2, checkpoint=ck, max_waves=2)
    durable = [r for r in ck.records if r.get("durable")]
    assert [r["iteration"] for r in durable] == [0, 1]
    assert all("n_waves" in r["metrics"] for r in durable)

    # fresh driver: resume from the manifest alone
    it, states, manifest = CheckpointManager.resume(spark, root)
    assert it == 1 and manifest["algorithm"] == "betweenness"
    resumed = betweenness_centrality(
        e,
        exact=True,
        wave_size=2,
        init=states["bc"],
        start_wave=it + 1,
        checkpoint=CheckpointManager(
            root=str(tmp_path / "bc_ck2"), interval=1, algorithm="betweenness"
        ),
    )
    got = {r["id"]: r["bc"] for r in resumed.collect()}
    for v in range(7):
        assert got.get(v, 0.0) == pytest.approx(want[v], abs=1e-9), v


def test_bfs_sssp_incore_matches_join_path(spark, monkeypatch):
    # the in-core frontier tier must produce byte-identical results to
    # the distributed join loop (same cross-strategy contract as
    # pagerank/cc/lpa)
    from pygraphblas_spark.algorithms import bfs_levels, bfs_tree, sssp
    from pygraphblas_spark.kernels import csr_dense

    edges = [
        (0, 1), (0, 3), (1, 4), (1, 6), (2, 5), (3, 0), (3, 2),
        (4, 5), (5, 2), (6, 2), (6, 3), (6, 4), (7, 8), (8, 7),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    ew = e.withColumn("val", (F.col("src") % 3 + 1).cast("double"))

    def run_all():
        return (
            sorted(map(tuple, bfs_levels(e, 0).collect())),
            sorted(map(tuple, bfs_tree(e, 0).collect())),
            sorted(map(tuple, sssp(ew, 0, max_iters=50).collect())),
        )

    incore = run_all()
    monkeypatch.setattr(csr_dense, "INCORE_MAX_NNZ", 0)  # force join path
    join_path = run_all()
    assert incore == join_path
    # unreachable component {7, 8} must be absent
    assert all(r[0] not in (7, 8) for r in incore[0])


def test_betweenness_incore_matches_join_path(spark, monkeypatch):
    from pygraphblas_spark.algorithms import betweenness_centrality
    from pygraphblas_spark.kernels import csr_dense

    edges = [
        (0, 1), (0, 3), (1, 4), (1, 6), (2, 5), (3, 0), (3, 2),
        (4, 5), (5, 2), (6, 2), (6, 3), (6, 4),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")

    def run():
        return {
            r["id"]: round(r["bc"], 9)
            for r in betweenness_centrality(
                e, sources=[0, 2, 6], directed=False
            ).collect()
        }

    incore = run()
    monkeypatch.setattr(csr_dense, "INCORE_MAX_NNZ", 0)  # force join path
    assert incore == run()


def test_wedge_balanced_bounds_properties():
    # pure-numpy: the pivot-range cuts must tile [0, n) exactly and no
    # range may carry more than ~(total/tasks + max single-pivot load)
    # wedges — the hub-skew guarantee hash-blocking could not give
    from pygraphblas_spark.kernels.tri_csr import _wedge_balanced_bounds

    rng = np.random.RandomState(3)
    for n, tasks in ((1, 1), (10, 4), (1000, 32), (5000, 7)):
        deg = rng.zipf(1.8, n).clip(0, 4000)  # heavy-tailed like a hub graph
        ptr = np.zeros(n + 1, dtype="int64")
        np.cumsum(deg, out=ptr[1:])
        b = _wedge_balanced_bounds(ptr, tasks)
        assert b[0] == 0 and b[-1] == n
        assert (np.diff(b) > 0).all()  # contiguous, non-empty ranges
        w = deg.astype("int64") * (deg.astype("int64") - 1) // 2
        total, biggest = int(w.sum()), int(w.max())
        loads = [int(w[b[i] : b[i + 1]].sum()) for i in range(len(b) - 1)]
        assert sum(loads) == total  # every wedge counted exactly once
        # each range holds at most one "overshoot" pivot beyond its fair share
        assert max(loads) <= total // tasks + biggest + 1

    # all-zero degrees: single full range, no crash
    z = np.zeros(12, dtype="int64")
    ptr0 = np.zeros(13, dtype="int64")
    b0 = _wedge_balanced_bounds(ptr0, 4)
    assert b0[0] == 0 and b0[-1] == 12
