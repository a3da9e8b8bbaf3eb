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
