"""K-truss algorithm + user-defined algebra (reference §2.9 surface)."""

import pytest
from pyspark.sql import functions as F

from pygraphblas_spark import Matrix, binary_op, monoid, semiring, unary_op
from pygraphblas_spark.algorithms import k_truss


def edges_df(spark, I, J):
    return spark.createDataFrame(
        list(zip(map(int, I), map(int, J), [1.0] * len(I))),
        "src long, dst long, val double",
    )


def test_k_truss_3(spark):
    # K4 on {0,1,2,3} plus a pendant triangle edge chain 3-4, 4-5:
    # 3-truss = K4 (every edge in >= 1 triangle among survivors)
    K4_I = [0, 0, 0, 1, 1, 2]
    K4_J = [1, 2, 3, 2, 3, 3]
    I = K4_I + [3, 4]
    J = K4_J + [4, 5]
    got = k_truss(edges_df(spark, I, J), k=3)
    pairs = {(r["src"], r["dst"]) for r in got.collect()}
    want = {(i, j) for i, j in zip(K4_I, K4_J)} | {
        (j, i) for i, j in zip(K4_I, K4_J)
    }
    assert pairs == want
    # supports: every K4 edge closes 2 triangles
    sup = {(r["src"], r["dst"]): r["support"] for r in got.collect()}
    assert all(v == 2 for v in sup.values())


def test_k_truss_4_kills_single_triangles(spark):
    # a lone triangle has edge support 1 < k-2=2 → empty 4-truss
    got = k_truss(edges_df(spark, [0, 1, 0], [1, 2, 2]), k=4)
    assert got.count() == 0


def test_user_defined_algebra(spark):
    # the reference builds user ops via numba-jitted functions
    # (binaryop.py:137-191) and custom semirings via type methods
    # (types.py:113-129, tests/test_udt.py:89-140 log-semiring);
    # ours are Column-expression factories registered the same way
    unary_op("DOUBLE_IT", lambda c: c * 2)
    binary_op("SATURATING_ADD", lambda a, b: F.least(a + b, F.lit(10.0)))
    monoid("SATMAX", lambda c: F.least(F.max(c), F.lit(10.0)), 0.0, "MAX")
    logsum = semiring(
        "LOGSUM_PLUS",
        monoid("LOGSUMEXP", lambda c: F.log(F.sum(F.exp(c))), 0.0, "PLUS"),
        binary_op("PLUS"),
    )

    m = Matrix.from_lists(spark, [0, 1], [0, 1], [3.0, 4.0])
    assert m.apply("DOUBLE_IT").to_dict() == {(0, 0): 6.0, (1, 1): 8.0}
    n = Matrix.from_lists(spark, [0, 1], [0, 1], [9.0, 9.0])
    assert m.eadd(n, "SATURATING_ADD").to_dict() == {(0, 0): 10.0, (1, 1): 10.0}

    # custom semiring drives mxm: log-space product accumulation
    a = Matrix.from_lists(spark, [0, 0], [0, 1], [0.0, 0.0], 1, 2)
    b = Matrix.from_lists(spark, [0, 1], [0, 0], [1.0, 1.0], 2, 1)
    r = a.mxm(b, semiring=logsum)
    import math

    # logsumexp(0+1, 0+1) = log(2e) = 1 + ln 2
    assert r.to_dict()[(0, 0)] == pytest.approx(1.0 + math.log(2.0), abs=1e-9)


def test_struct_valued_shortest_path_semiring(spark):
    """UDT-analog (reference tests/test_udt.py:11-52 Bellman-Ford
    (w, h, pi) triples): struct<w,h,pi> values flow through the generic
    contraction + eadd machinery with a user semiring — min-by-(weight,
    hops, parent) ⊕, (w₁+w₂, h₁+h₂, edge-src) ⊗. Spark orders structs
    lexicographically, so F.min/F.least ARE the UDT monoid."""
    from pygraphblas_spark.algebra import binary_op, monoid, semiring
    from pygraphblas_spark.operators.contraction import mxv
    from pygraphblas_spark.operators import core

    # diamond: 0→1 (1), 0→2 (4), 1→2 (1), 2→3 (1), 1→3 (5)
    E = [(0, 1, 1.0), (0, 2, 4.0), (1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0)]
    # transpose orientation for the pull step; edge val carries pi=src
    at = spark.createDataFrame(
        [(j, i, {"w": w, "h": 1, "pi": i}) for i, j, w in E],
        "src long, dst long, val struct<w double, h int, pi long>",
    )
    sp_mul = binary_op(
        "SP_EXTEND",
        lambda a, b: F.struct(
            (a["w"] + b["w"]).alias("w"),
            (a["h"] + b["h"]).alias("h"),
            a["pi"].alias("pi"),
        ),
    )
    sp = semiring("SP_MIN_EXTEND", monoid("SP_MIN", F.min, None, "MIN"), sp_mul)
    least = binary_op("SP_LEAST", lambda a, b: F.least(a, b))

    dist = spark.createDataFrame(
        [(0, {"w": 0.0, "h": 0, "pi": 0})],
        "id long, val struct<w double, h int, pi long>",
    )
    for _ in range(4):
        relaxed = mxv(at, dist, sp)
        dist = core.ewise_add(dist, relaxed, ["id"], least)
    got = {r["id"]: (r["val"]["w"], r["val"]["h"], r["val"]["pi"])
           for r in dist.collect()}
    assert got[0] == (0.0, 0, 0)
    assert got[1] == (1.0, 1, 0)          # 0→1
    assert got[2] == (2.0, 2, 1)          # 0→1→2 beats 0→2 (4)
    assert got[3] == (3.0, 3, 2)          # 0→1→2→3 beats 0→1→3 (6)
