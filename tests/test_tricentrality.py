"""Triangle centrality (reference demo/TriangleCentrality.ipynb TC1) and
degree centrality (demo/Centrality.ipynb cell 3).

Three-way cross-check on the notebook's own 8-vertex example graph:

1. a pure-python oracle of the TC1 formula,
2. the Matrix-facade chain exactly as the notebook writes it
   (``A.mxm(A, mask=A)`` → ``reduce_vector`` → ``3A − 2T̂ + I`` → mxv),
3. ``algorithms.triangle_centrality`` (the DataFrame scale plan).
"""

import math

import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.matrix import Matrix
from pygraphblas_spark.vector import Vector
from pygraphblas_spark.algorithms import triangle_centrality, degree_centrality


# demo/TriangleCentrality.ipynb cell 2: a b c V d e f = 0..6 (vertex 7
# unused — the notebook allocates 8×8), undirected
_EDGES = [(0, 1), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]


def _sym():
    s = set()
    for u, v in _EDGES:
        s.add((u, v))
        s.add((v, u))
    return s


def _tc1_oracle():
    """TC1 in plain python over the example graph."""
    sym = _sym()
    verts = sorted({u for u, _ in sym})
    nbr = {v: {w for (u, w) in sym if u == v} for v in verts}
    # T[i,j] = common neighbors of adjacent i,j
    T = {}
    for (i, j) in sym:
        c = len(nbr[i] & nbr[j])
        if c:
            T[(i, j)] = c
    y = {v: sum(t for (i, _), t in T.items() if i == v) for v in verts}
    k = sum(y.values())
    out = {}
    for v in verts:
        ny = sum(y[j] for j in nbr[v])
        ty = sum(y[j] for (i, j) in T if i == v)
        out[v] = (3.0 * ny - 2.0 * ty + y[v]) / k
    return out


def _edge_df(spark):
    return spark.createDataFrame(_EDGES, "src long, dst long")


def test_triangle_centrality_matches_oracle(spark):
    want = _tc1_oracle()
    for strategy in ("incore", "join"):
        got = {
            r["id"]: r["centrality"]
            for r in triangle_centrality(
                _edge_df(spark), strategy=strategy
            ).collect()
        }
        assert set(got) == set(want), strategy
        for v in want:
            assert math.isclose(got[v], want[v], rel_tol=1e-12), (
                strategy,
                v,
                got[v],
                want[v],
            )


def test_tc1_facade_chain_matches_oracle(spark):
    """The literal notebook chain through the Matrix facade."""
    sym = sorted(_sym())
    I = [u for u, _ in sym]
    J = [v for _, v in sym]
    A = Matrix.from_lists(spark, I, J, [1.0] * len(sym), 8, 8)

    T = A.mxm(A, mask=A)
    y = T.reduce_vector()
    k = y.reduce_float()
    T_hat = T.pattern("FP64")
    X = (3 * A) - (2 * T_hat) + Matrix.identity(spark, "FP64", 8)
    tc = (1.0 / k) * (X @ y)

    want = _tc1_oracle()
    got = dict(zip(*tc.to_lists()))
    # vertex 7 is isolated: the facade result may omit it or carry the
    # identity-diagonal zero contribution — y[7] is absent so X@y has no
    # row-7 entry at all
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-12), (v, got[v], want[v])


def test_degree_centrality(spark):
    sym = sorted(_sym())
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r["id"]: r["centrality"] for r in degree_centrality(df).collect()}
    nbr = {}
    for u, v in sym:
        nbr.setdefault(u, set()).add(v)
    n = len(sym)
    for v, ns in nbr.items():
        assert math.isclose(got[v], len(ns) / n, rel_tol=1e-12)


def test_triangle_centrality_no_triangles(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    rows = triangle_centrality(df).collect()
    assert {r["id"] for r in rows} == {0, 1, 2, 3}
    assert all(r["centrality"] == 0.0 for r in rows)


def test_tc2_tc3_facade_variants_match_oracle(spark):
    """The notebook's TC2 and TC3 reformulations (plus_pair dispatch,
    ST1 descriptor, dense-accum reduce, tril-masked half-count) produce
    the same centrality as TC1."""
    from pygraphblas_spark import descriptor

    want = _tc1_oracle()
    sym = sorted(_sym())
    I = [u for u, _ in sym]
    J = [v for _, v in sym]
    A = Matrix.from_lists(spark, I, J, [1.0] * len(sym), 8, 8)

    # TC2 (demo/TriangleCentrality.ipynb cell 6)
    T = A.plus_pair(A, mask=A, desc=descriptor.ST1)
    y = Vector.dense(spark, "FP64", 8)
    y = T.reduce_vector(out=y, accum="PLUS")
    k = y.reduce_float()
    tc2 = (1.0 / k) * (3 * A.plus_second(y) - 2 * T.plus_second(y) + y)
    got2 = dict(zip(*tc2.to_lists()))
    for v in want:
        assert math.isclose(got2[v], want[v], rel_tol=1e-12), ("TC2", v)

    # TC3 (cell 8): tril-masked half-count, forward + transposed sums
    M = A.tril(-1)
    T = A.plus_pair(A, mask=M, desc=descriptor.ST1)
    T_T = T.T
    y = T.reduce_vector(out=Vector.dense(spark, "FP64", 8), accum="PLUS")
    y = T_T.reduce_vector(out=y, accum="PLUS")
    k = y.reduce_float()
    tc3 = (
        3 * A.plus_second(y)
        - (2 * (T.plus_second(y) + T_T.plus_second(y)))
        + y
    ) / k
    got3 = dict(zip(*tc3.to_lists()))
    for v in want:
        assert math.isclose(got3[v], want[v], rel_tol=1e-12), ("TC3", v)
