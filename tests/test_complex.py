"""Complex FC32/FC64 support: struct<re,im> values + the *_FC op family.

Reference: pygraphblas/types.py:326-345 (FC32/FC64), SuiteSparse GxB
complex ops (CONJ/CREAL/CIMAG/CARG). Oracles are Python's own complex
arithmetic / numpy complex matmul.
"""

import numpy as np
import pytest

from pygraphblas_spark.matrix import Matrix
from pygraphblas_spark.vector import Vector

I = [0, 0, 1, 2]
J = [1, 2, 0, 2]
VA = [1 + 2j, -0.5 + 0j, 3 - 1j, 0 + 4j]


def test_complex_from_lists_roundtrip(spark):
    M = Matrix.from_lists(spark, I, J, VA, 3, 3)
    assert M.typ == "FC64"
    i, j, v = M.to_lists()
    assert sorted(zip(i, j, v)) == sorted(zip(I, J, VA))
    vec = Vector.from_lists(spark, [0, 2], [1j, 2 - 1j], 3)
    assert vec.typ == "FC64"
    ids, vals = vec.to_lists()
    assert vals == [1j, 2 - 1j]


def test_complex_eadd_emult(spark):
    A = Matrix.from_lists(spark, [0, 1], [0, 1], [1 + 1j, 2 - 1j], 2, 2)
    B = Matrix.from_lists(spark, [0, 1], [0, 0], [0.5 - 2j, 10 + 0j], 2, 2)
    i, j, v = A.eadd(B, "PLUS").to_lists()
    got = dict(zip(zip(i, j), v))
    assert got[(0, 0)] == (1 + 1j) + (0.5 - 2j)
    assert got[(1, 1)] == 2 - 1j  # union keeps lone entries
    assert got[(1, 0)] == 10 + 0j
    i, j, v = A.emult(B, "TIMES").to_lists()
    assert dict(zip(zip(i, j), v)) == {(0, 0): (1 + 1j) * (0.5 - 2j)}
    i, j, v = A.emult(B, "DIV").to_lists()
    assert v[0] == pytest.approx((1 + 1j) / (0.5 - 2j))


def test_complex_apply_ops(spark):
    A = Matrix.from_lists(spark, [0, 1], [1, 0], [3 + 4j, -1 - 1j], 2, 2)
    _, _, v = A.apply("CONJ").to_lists()
    assert sorted(v, key=abs) == sorted([3 - 4j, -1 + 1j], key=abs)
    R = A.apply("ABS")
    assert R.typ == "FP64"
    assert sorted(R.to_lists()[2]) == pytest.approx([abs(-1 - 1j), 5.0])
    assert A.apply("CREAL").to_lists()[2] == pytest.approx([3.0, -1.0])
    _, _, v = A.apply("MINV").to_lists()
    got = dict(zip(zip(*A.to_lists()[:2]), A.apply("MINV").to_lists()[2]))
    assert got[(0, 1)] == pytest.approx(1 / (3 + 4j))
    _, _, v = A.apply("AINV").to_lists()
    assert sorted(v, key=lambda c: c.real) == [-3 - 4j, 1 + 1j]


def test_complex_apply_scalar(spark):
    A = Matrix.from_lists(spark, [0], [0], [2 + 1j], 1, 1)
    assert A.apply_second("TIMES", 1j).to_lists()[2] == [(2 + 1j) * 1j]
    assert A.apply_first(1 - 1j, "MINUS").to_lists()[2] == [(1 - 1j) - (2 + 1j)]


def test_complex_mxm_matches_numpy(spark):
    rng = np.random.default_rng(3)
    a = (rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))).round(3)
    b = (rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))).round(3)
    ii, jj = np.indices((4, 4))
    A = Matrix.from_lists(spark, ii.ravel().tolist(), jj.ravel().tolist(), a.ravel().tolist(), 4, 4)
    B = Matrix.from_lists(spark, ii.ravel().tolist(), jj.ravel().tolist(), b.ravel().tolist(), 4, 4)
    C = A.mxm(B)  # default semiring dispatches to PLUS_TIMES_FC
    assert C.typ == "FC64"
    i, j, v = C.to_lists()
    got = np.zeros((4, 4), dtype=complex)
    got[i, j] = v
    assert np.allclose(got, a @ b, atol=1e-9)
    # explicit name string also dispatches
    C2 = A.mxm(B, semiring="PLUS_TIMES")
    assert np.allclose(
        np.array(C2.to_lists()[2]), np.array(C.to_lists()[2]), atol=1e-12
    )


def test_complex_mxv_reduce(spark):
    A = Matrix.from_lists(spark, [0, 0, 1], [0, 1, 1], [1 + 1j, 2j, 3 + 0j], 2, 2)
    x = Vector.from_lists(spark, [0, 1], [1 - 1j, 2 + 2j], 2)
    y = A.mxv(x)
    ids, vals = y.to_lists()
    want = {0: (1 + 1j) * (1 - 1j) + 2j * (2 + 2j), 1: (3 + 0j) * (2 + 2j)}
    assert {i: v for i, v in zip(ids, vals)} == pytest.approx(want)
    assert A.reduce("PLUS") == pytest.approx((1 + 1j) + 2j + (3 + 0j))
    assert x.reduce("PLUS") == pytest.approx((1 - 1j) + (2 + 2j))


def test_complex_promotion_mixed_real(spark):
    A = Matrix.from_lists(spark, [0, 1], [0, 1], [2.0, 3.0], 2, 2)  # FP64
    B = Matrix.from_lists(spark, [0, 1], [0, 1], [1j, 1 + 1j], 2, 2)  # FC64
    from pygraphblas_spark import gbtypes

    assert gbtypes.promote("FP64", "FC32") == "FC64"
    assert gbtypes.promote("FP32", "FC32") == "FC32"
    C = A.eadd(B, "PLUS")
    assert C.typ == "FC64"
    assert dict(zip(zip(*C.to_lists()[:2]), C.to_lists()[2])) == {
        (0, 0): 2 + 1j,
        (1, 1): 4 + 1j,
    }
    # real x complex contraction widens too
    D = A.mxm(B)
    assert D.typ == "FC64"
    assert dict(zip(zip(*D.to_lists()[:2]), D.to_lists()[2])) == {
        (0, 0): 2j,
        (1, 1): 3 + 3j,
    }


def test_complex_dense_iso_and_unsupported_ops(spark):
    M = Matrix.iso(spark, 1 - 2j, 2, 2)
    assert M.typ == "FC64"
    assert M.to_lists()[2] == [1 - 2j] * 4
    A = Matrix.from_lists(spark, [0], [0], [1j], 1, 1)
    with pytest.raises(NotImplementedError, match="not defined for complex"):
        A.eadd(A, "MIN")  # complex numbers are unordered
    with pytest.raises(NotImplementedError, match="not defined for complex"):
        A.apply("SQRT")
