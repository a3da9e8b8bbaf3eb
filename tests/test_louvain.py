"""Louvain golden tests against the reference's own ground truth.

The reference validates its Louvain demo (demo/Louvain.ipynb cell 9)
against GraphChallenge block-model partitions shipped at
demo/louvain_data/*truePartition.tsv via ``compare_groups`` (partition
equality as sets of member sets). Same fixtures, same criterion here —
plus cross-tier equality and modularity sanity.
"""

import pandas as pd
import pytest

from pygraphblas_spark.algorithms.louvain import louvain, modularity

FIX = "/root/reference/demo/louvain_data"

# reference demo two-community test graph (Louvain.ipynb cell 3)
DEMO_I = [0,0,0,0,1,1,1,1,2,2,2,2,3,3,3,3,4,4,4,4,5,5,5,5,5,6,6,6,7,7,7,7]
DEMO_J = [0,2,3,6,1,2,3,7,0,2,4,6,0,1,3,5,0,2,4,6,1,3,5,6,7,0,4,6,1,3,5,7]


def _groups(rows):
    g = {}
    for r in rows:
        g.setdefault(r["community"], set()).add(r["id"])
    return sorted(map(sorted, g.values()))


def _fixture_edges(spark, size):
    fx = pd.read_csv(
        f"{FIX}/simulated_blockmodel_graph_{size}_nodes.tsv",
        sep="\t",
        names=["i", "j", "w"],
    )
    return spark.createDataFrame(
        pd.DataFrame({"src": fx.i - 1, "dst": fx.j - 1})
    )


def _truth_groups(size):
    truth = pd.read_csv(
        f"{FIX}/simulated_blockmodel_graph_{size}_nodes_truePartition.tsv",
        sep="\t",
        names=["i", "p"],
    )
    g = {}
    for _, row in truth.iterrows():
        g.setdefault(row.p, set()).add(row.i - 1)
    return sorted(map(sorted, g.values()))


def test_demo_graph_two_communities(spark):
    e = spark.createDataFrame(
        list(zip(DEMO_I, DEMO_J)), "src long, dst long"
    )
    labels = louvain(e)
    assert _groups(labels.collect()) == [[0, 2, 4, 6], [1, 3, 5, 7]]
    # Q = 0.375 is the known optimum for this graph
    assert abs(modularity(e, labels) - 0.375) < 1e-12


@pytest.mark.parametrize("size", [50, 100, 500, 1000])
def test_blockmodel_fixtures_match_truth(spark, size):
    got = _groups(louvain(_fixture_edges(spark, size)).collect())
    assert got == _truth_groups(size)


def test_tiers_identical(spark):
    e = _fixture_edges(spark, 100)
    a = sorted(
        (r["id"], r["community"])
        for r in louvain(e, strategy="incore").collect()
    )
    b = sorted(
        (r["id"], r["community"])
        for r in louvain(e, strategy="join").collect()
    )
    assert a == b


def test_community_ids_are_min_members(spark):
    e = _fixture_edges(spark, 50)
    rows = louvain(e).collect()
    g = {}
    for r in rows:
        g.setdefault(r["community"], set()).add(r["id"])
    for cid, members in g.items():
        assert cid == min(members)


def test_modularity_of_truth_beats_singletons(spark):
    e = _fixture_edges(spark, 50)
    labels = louvain(e)
    q = modularity(e, labels)
    singletons = labels.selectExpr("id", "id AS community")
    assert q > modularity(e, singletons)
    assert 0.0 < q <= 1.0


def test_warm_start_matches_straight_run(spark):
    """Split run (level 1, then resume with init=result) equals the
    straight 2-level run exactly — per-level canonical labels make the
    resumed contraction reproduce the same level graph and tie-breaks.
    Checked on both tiers."""
    e = _fixture_edges(spark, 100)
    for strategy in ("incore", "join"):
        straight = sorted(
            (r["id"], r["community"])
            for r in louvain(e, strategy=strategy, max_levels=2).collect()
        )
        first = louvain(e, strategy=strategy, max_levels=1)
        resumed = sorted(
            (r["id"], r["community"])
            for r in louvain(
                e, strategy=strategy, max_levels=1, init=first, start_level=1
            ).collect()
        )
        assert resumed == straight, strategy


def test_partial_init_tiers_agree(spark):
    """A warm-start init covering only SOME vertices must not drop the
    other vertices' edges: both tiers self-map missing vertices (the join
    tier previously inner-joined and silently lost those edges)."""
    from pyspark.sql import functions as F

    e = _fixture_edges(spark, 100)
    # partial mapping: only even ids, mapped to id-rounded-down-to-4
    init = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id") % 2 == 0)
        .select("id", (F.col("id") - F.col("id") % 4).alias("community"))
    )
    results = {}
    for strategy in ("incore", "join"):
        results[strategy] = _groups(
            louvain(e, strategy=strategy, init=init, start_level=1).collect()
        )
    assert results["incore"] == results["join"]
    # every vertex still present — nothing was dropped
    n_verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert sum(len(g) for g in results["join"]) == n_verts


def test_louvain_checkpoint_records_levels(spark, tmp_path):
    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    e = _fixture_edges(spark, 50)
    ck = CheckpointManager(
        root=str(tmp_path / "louvain_ck"), interval=1, algorithm="louvain"
    )
    louvain(e, checkpoint=ck)
    assert ck.records, "no manifest records"
    durable = [r for r in ck.records if r.get("durable")]
    assert durable, "no durable level state written"
    # resume loads the assign mapping back
    it, states, _ = CheckpointManager.resume(spark, str(tmp_path / "louvain_ck"))
    assert "assign" in states
    assert states["assign"].count() == 50
