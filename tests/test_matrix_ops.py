"""Operator goldens lifted from the reference's own unit tests.

Each test cites the reference test it replicates; the expected matrices
are the reference's hand-computed fixtures (tests/test_matrix.py).
"""

from itertools import product

import pytest

from pygraphblas_spark import Matrix, Vector, descriptor


def ML(spark, I, J, V, nrows=None, ncols=None, typ=None):
    return Matrix.from_lists(spark, I, J, V, nrows, ncols, typ)


def VL(spark, I, V, size=None, typ=None):
    return Vector.from_lists(spark, I, V, size, typ)


# ---- eadd / emult (reference tests/test_matrix.py:137-206) ----


def test_matrix_eadd(spark):
    I = list(range(10))
    v = ML(spark, I + [0], I + [1], I + [1])  # diag + v[0,1]=1
    w = ML(spark, I + [1], I + [0], I + [1])  # diag + w[1,0]=1

    addition_ref = ML(
        spark, I + [0, 1], I + [1, 0], list(range(0, 20, 2)) + [1, 1]
    )
    assert v.eadd(w).iseq(addition_ref)
    assert (v + w).iseq(addition_ref)
    assert v.eadd(w, "SECOND").iseq(v | w)


def test_matrix_sub(spark):
    # reference tests/test_matrix.py:164-181: diff has explicit zeros on
    # the diagonal; lone entries pass through (implicit-zero semantics).
    I = list(range(10))
    v = ML(spark, I + [0], I + [1], I + [1])
    w = ML(spark, I + [1], I + [0], I + [1])
    subtraction_ref = ML(spark, I + [0, 1], I + [1, 0], [0] * 10 + [1, 1])
    assert (v - w).iseq(subtraction_ref)


def test_matrix_emult(spark):
    I = list(range(10))
    V = list(range(1, 11))
    v = ML(spark, I, I, V)
    w = ML(spark, I, I, V)
    assert v.emult(w).iseq(ML(spark, I, I, [x * x for x in V]))
    assert v.emult(w, "SECOND").iseq(v & w)
    assert (v / w).iseq(ML(spark, I, I, [1] * 10))


# ---- reductions (reference tests/test_matrix.py:208-247) ----


def test_matrix_reduce_bool(spark):
    v = Matrix.sparse(spark, "BOOL", 10, 10)
    assert not v.reduce_bool()
    v = v.set_element(3, 3, True).set_element(4, 4, False)
    assert v.reduce_bool() is True
    assert bool(v.reduce("LAND")) is False


def test_matrix_reduce_int(spark):
    v = Matrix.sparse(spark, "INT8", 10, 10)
    assert v.reduce_int() == 0
    v = v.set_element(3, 3, 3).set_element(4, 4, 4)
    assert v.reduce_int() == 7
    assert int(v.reduce("TIMES")) == 12


def test_matrix_reduce_float(spark):
    v = Matrix.sparse(spark, "FP64", 10, 10)
    assert v.reduce_float() == 0.0
    v = v.set_element(3, 3, 3.3).set_element(4, 4, 4.4)
    assert v.reduce_float() == pytest.approx(7.7)
    assert float(v.reduce("TIMES")) == pytest.approx(14.52)


def test_matrix_reduce_vector(spark):
    m = ML(spark, list(range(10)), list(range(10)), list(range(10)))
    v = m.reduce_vector()
    assert v.iseq(VL(spark, list(range(10)), list(range(10))))


# ---- mxm / mxv (reference tests/test_matrix.py:249-307) ----


def test_mxm(spark):
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    n = ML(spark, [0, 1, 2], [1, 2, 0], [2, 3, 4])
    o = m.mxm(n)
    assert o.nrows == 3 and o.ncols == 3 and o.nvals == 3
    r = ML(spark, [0, 1, 2], [2, 0, 1], [3, 8, 6])
    assert o.iseq(r)
    assert r.iseq(m @ n)
    # reference does `m @= n` first, so its LOR_LAND check uses m@n as the
    # left operand; replicate without mutation
    o = (m @ n).mxm(n, semiring="LOR_LAND")
    assert o.cast("BOOL").iseq(
        ML(spark, [0, 1, 2], [0, 1, 2], [True, True, True])
    )


def test_mxm_plus_plus(spark):
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    n = ML(spark, [0, 1, 2], [1, 2, 0], [2, 3, 4])
    o = m.mxm(n, semiring="PLUS_PLUS")
    assert o.iseq(ML(spark, [0, 1, 2], [2, 0, 1], [4, 6, 5]))


def test_mxm_context_manager(spark):
    # reference tests/test_matrix.py:265-290: `with INT64.PLUS_PLUS: m @ n`
    from pygraphblas_spark.algebra import semiring

    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    n = ML(spark, [0, 1, 2], [1, 2, 0], [2, 3, 4])
    with semiring("PLUS_PLUS"):
        o = m @ n
    assert o.iseq(ML(spark, [0, 1, 2], [2, 0, 1], [4, 6, 5]))
    # default restored outside the context
    assert (m @ n).iseq(ML(spark, [0, 1, 2], [2, 0, 1], [3, 8, 6]))


def test_mxm_transpose_desc(spark):
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    n = ML(spark, [0, 1, 2], [1, 2, 0], [2, 3, 4])
    assert m.mxm(n, desc=descriptor.T0).iseq(m.transpose().mxm(n))
    assert m.mxm(n, desc=descriptor.T1).iseq(m.mxm(n.transpose()))


def test_mxv(spark):
    m = ML(spark, [0, 1, 2, 3], [1, 2, 0, 1], [1, 2, 3, 4])
    v = VL(spark, [0, 1, 2], [2, 3, 4])
    o = m.mxv(v)
    assert o.iseq(VL(spark, [0, 1, 2, 3], [3, 8, 6, 12]))
    assert o.iseq(m @ v)
    assert o.iseq(m.transpose().mxv(v, desc=descriptor.T0))
    o = m.mxv(v, semiring="PLUS_PLUS")
    assert o.iseq(VL(spark, [0, 1, 2, 3], [4, 6, 5, 7]))


def test_vxm(spark):
    # vxm(v, A) == mxv(Aᵀ, v) (reference tests/test_vector.py:298-316)
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    v = VL(spark, [0, 1, 2], [2, 3, 4])
    o = v.vxm(m)
    assert o.iseq(m.transpose().mxv(v))
    assert o.iseq(v @ m)


# ---- select ops (reference tests/test_matrix.py:580-655) ----


def test_select(spark):
    v = ML(spark, [0, 1, 2], [0, 1, 2], [0, 0, 3])
    assert v.select("!=0").to_lists() == [[2], [2], [3]]
    assert v.select("!=", 0).to_lists() == [[2], [2], [3]]
    assert v.select(">", 0).to_lists() == [[2], [2], [3]]
    assert v.select("<", 3).to_lists() == [[0, 1], [0, 1], [0, 0]]
    assert v.select(">=", 0).iseq(v)
    assert v.select(">=0").iseq(v)


def test_select_extremum(spark):
    v = ML(spark, [0, 1, 2], [0, 1, 2], [5, 2, 3])
    assert v.select("min").to_lists() == [[1], [1], [2]]
    assert v.select("max").to_lists() == [[0], [0], [5]]


def test_select_ops(spark):
    I, J = tuple(map(list, zip(*product(range(3), repeat=2))))
    V = list(range(9))
    m = ML(spark, I, J, V, 3, 3)

    assert m.tril().iseq(
        ML(spark, [0, 1, 1, 2, 2, 2], [0, 0, 1, 0, 1, 2], [0, 3, 4, 6, 7, 8])
    )
    assert m.triu().iseq(
        ML(spark, [0, 0, 0, 1, 1, 2], [0, 1, 2, 1, 2, 2], [0, 1, 2, 4, 5, 8])
    )
    assert m.diag().iseq(ML(spark, [0, 1, 2], [0, 1, 2], [0, 4, 8]))
    assert m.offdiag().iseq(
        ML(spark, [0, 0, 1, 1, 2, 2], [1, 2, 0, 2, 0, 1], [1, 2, 3, 5, 6, 7])
    )
    assert m.nonzero().iseq(
        ML(
            spark,
            [0, 0, 1, 1, 1, 2, 2, 2],
            [1, 2, 0, 1, 2, 0, 1, 2],
            [1, 2, 3, 4, 5, 6, 7, 8],
        )
    )
    assert (-m).iseq(ML(spark, I, J, [0, -1, -2, -3, -4, -5, -6, -7, -8]))
    assert abs(m.apply("AINV")).iseq(ML(spark, I, J, V))


def test_invert_fp(spark):
    m = ML(spark, [0, 1, 2], [0, 1, 2], [0.0, 1.0, 2.0], 3, 3)
    n = ~m
    assert n.to_lists()[2] == [float("inf"), 1.0, 0.5]


# ---- transpose / pattern / cast / kron ----


def test_transpose(spark):
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    assert m.T.to_lists() == [[0, 1, 2], [2, 0, 1], [3, 1, 2]]
    assert m.T.T.iseq(m)


def test_pattern(spark):
    m = ML(spark, [0, 1], [1, 2], [7, 9])
    assert m.pattern().to_lists() == [[0, 1], [1, 2], [True, True]]


def test_kronecker(spark):
    # 2x2 ⊗ 2x2 known product
    a = ML(spark, [0, 0, 1], [0, 1, 1], [1, 2, 3], 2, 2)
    b = ML(spark, [0, 1], [1, 0], [1, 1], 2, 2)
    k = a.kronecker(b)
    assert k.nrows == 4 and k.ncols == 4
    expected = {
        (0, 1): 1, (1, 0): 1,      # a00=1 * b
        (0, 3): 2, (1, 2): 2,      # a01=2 * b
        (2, 3): 3, (3, 2): 3,      # a11=3 * b
    }
    assert k.to_dict() == expected


def test_matrix_pow(spark):
    # 3-cycle: A^3 = I (values multiply to 6 along the cycle)
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    p = m ** 3
    assert p.to_dict() == {(0, 0): 6, (1, 1): 6, (2, 2): 6}


# ---- extract / assign / slicing (reference tests/test_matrix.py:374-520) ----


def test_extract_element_and_row_col(spark):
    I, J = tuple(map(list, zip(*product(range(3), repeat=2))))
    m = ML(spark, I, J, list(range(9)), 3, 3)
    assert m.extract_element(1, 2) == 5
    assert m[1, 2] == 5
    assert m.extract_row(1).to_lists() == [[0, 1, 2], [3, 4, 5]]
    assert m.extract_col(1).to_lists() == [[0, 1, 2], [1, 4, 7]]
    assert m[1].to_lists() == [[0, 1, 2], [3, 4, 5]]


def test_extract_matrix_slices(spark):
    I, J = tuple(map(list, zip(*product(range(3), repeat=2))))
    m = ML(spark, I, J, list(range(9)), 3, 3)
    # GraphBLAS slices are inclusive: m[0:1, 0:1] is 2x2
    s = m.extract_matrix(slice(0, 1), slice(0, 1))
    assert s.nrows == 2 and s.ncols == 2
    assert s.to_lists() == [[0, 0, 1, 1], [0, 1, 0, 1], [0, 1, 3, 4]]
    # explicit lists remap to positions
    s2 = m.extract_matrix([2, 0], [1])
    assert s2.to_dict() == {(0, 0): 7, (1, 0): 1}


def test_assign_scalar_and_matrix(spark):
    m = Matrix.sparse(spark, "INT64", 3, 3)
    m2 = m.assign_scalar(7, rows=slice(0, 1), cols=slice(0, 1))
    assert m2.to_dict() == {(0, 0): 7, (0, 1): 7, (1, 0): 7, (1, 1): 7}
    sub = ML(spark, [0], [0], [9], 1, 1)
    m3 = m2.assign_matrix(sub, rows=slice(1, 1), cols=slice(1, 1))
    assert m3.to_dict()[(1, 1)] == 9 and m3.to_dict()[(0, 0)] == 7


def test_setitem_delitem(spark):
    m = Matrix.sparse(spark, "INT64", 3, 3)
    m = m.set_element(0, 1, 5)
    assert m[0, 1] == 5
    m = m.set_element(0, 1, 6)
    assert m[0, 1] == 6 and m.nvals == 1
    m = m.del_element(0, 1)
    assert m.nvals == 0


def test_from_lists_duplicate_last_wins(spark):
    # reference sets elements in a loop → last write wins (matrix.py:329-331)
    m = ML(spark, [0, 0], [0, 0], [1, 9])
    assert m.to_dict() == {(0, 0): 9}


def test_resize_clear_dup(spark):
    m = ML(spark, [0, 2], [0, 2], [1, 2], 3, 3)
    assert m.resize(2, 2).to_dict() == {(0, 0): 1}
    assert m.clear().nvals == 0
    assert m.dup().iseq(m)


# ---- type promotion (reference tests/test_matrix.py:1017-1029) ----


def test_type_promotion_mxm(spark):
    a = ML(spark, [0], [0], [2], 1, 1, "INT64")
    b = ML(spark, [0], [0], [2.5], 1, 1, "FP64")
    assert a.mxm(b).typ == "FP64"
    assert a.eadd(b).typ == "FP64"


def test_apply_ops(spark):
    m = ML(spark, [0, 1], [0, 1], [4.0, 9.0])
    assert m.apply("SQRT").to_lists()[2] == [2.0, 3.0]
    assert m.apply_second("PLUS", 1.0).to_lists()[2] == [5.0, 10.0]
    assert m.apply_first(1.0, "MINUS").to_lists()[2] == [-3.0, -8.0]
    assert m.apply("POSITIONI").to_lists()[2] == [0, 1]


def test_setitem_delitem_sugar(spark):
    """Mutating sugar: A[i,j]=v, A[i,:]=Vector, A[Mask]=s, del A[i,j]
    (reference matrix.py:3241/3310)."""
    from pygraphblas_spark import Matrix, Vector

    m = Matrix.from_lists(spark, [0, 1], [1, 2], [1.0, 2.0], 3, 3)
    m[2, 0] = 9.0
    assert m.to_dict() == {(0, 1): 1.0, (1, 2): 2.0, (2, 0): 9.0}
    m[0, 1] = 5.0  # overwrite
    assert m.to_dict()[(0, 1)] == 5.0
    del m[2, 0]
    assert (2, 0) not in m.to_dict()
    # row assign
    v = Vector.from_lists(spark, [0, 2], [7.0, 8.0], size=3)
    m[1, :] = v
    d = m.to_dict()
    assert d[(1, 0)] == 7.0 and d[(1, 2)] == 8.0
    # masked scalar assign
    mask = Matrix.from_lists(spark, [0], [1], True, 3, 3)
    m[mask] = 0.5
    assert m.to_dict()[(0, 1)] == 0.5


# ---- gini (reference matrix.py:3560) ----


def test_gini_matches_numpy_and_is_distributed(spark):
    import numpy as np
    from pyspark.sql import functions as F

    # skewed out-degrees: vertex k has k+1 out-edges (k = 0..19)
    I, J = [], []
    for k in range(20):
        for j in range(k + 1):
            I.append(k)
            J.append(100 + j)
    m = Matrix.from_lists(spark, I, J, True, 200, 200)

    deg = np.sort(np.array([k + 1 for k in range(20)], dtype="float64"))
    n = len(deg)
    i = np.arange(1, n + 1)
    expected = float((2.0 * (i * deg).sum()) / (n * deg.sum()) - (n + 1.0) / n)
    assert abs(m.gini() - expected) < 1e-12
    assert abs(m.gini(num_buckets=3) - expected) < 1e-12

    # scale assertion: the rank must NOT funnel the degree table through
    # a single-partition window — the row_number window is partitioned
    # (range buckets) and only the num_buckets-row prefix-sum is global
    ranked, part = m._ranked_degrees(8)
    try:
        plan = ranked._jdf.queryExecution().executedPlan().toString()
    finally:
        part.unpersist()
    import re

    for line in plan.splitlines():
        if "row_number()" in line:
            assert "windowspecdefinition(part" in line, line
    assert "rangepartitioning" in plan


# ---- in-place / reflected sugar (reference matrix.py:64-90, 1625-1711) ----


def test_matrix_inplace_ops(spark):
    I = list(range(5))
    a = ML(spark, I, I, [1, 2, 3, 4, 5])
    b = ML(spark, I, I, [10, 20, 30, 40, 50])
    ref_add = a.eadd(b, "PLUS")
    m = ML(spark, I, I, [1, 2, 3, 4, 5])
    mid = id(m)
    m += b
    assert id(m) == mid  # facade mutates in place
    assert m.iseq(ref_add)
    m = ML(spark, I, I, [1, 2, 3, 4, 5])
    m *= b
    assert m.iseq(ML(spark, I, I, [10, 40, 90, 160, 250]))
    m = ML(spark, I, I, [10.0, 20.0, 30.0, 40.0, 50.0])
    m /= ML(spark, I, I, [2.0] * 5)
    assert m.iseq(ML(spark, I, I, [5.0, 10.0, 15.0, 20.0, 25.0]))
    m = ML(spark, I, I, [1, 2, 3, 4, 5])
    m -= b
    assert m.iseq(a.eadd(b, "MINUS"))
    m = ML(spark, I, I, [1, 2, 3, 4, 5])
    m |= b
    assert m.iseq(a.eadd(b, "SECOND"))
    m = ML(spark, I, I, [1, 2, 3, 4, 5])
    m &= b
    assert m.iseq(a.emult(b, "SECOND"))
    m = ML(spark, I, I, [1.0, 2.0, 3.0, 4.0, 5.0])
    m @= ML(spark, I, I, [2.0] * 5)
    assert m.iseq(ML(spark, I, I, [2.0, 4.0, 6.0, 8.0, 10.0]))
    # scalar in-place
    m = ML(spark, I, I, [1, 2, 3, 4, 5])
    m += 10
    assert m.iseq(ML(spark, I, I, [11, 12, 13, 14, 15]))


def test_matrix_reflected_ops(spark):
    I = list(range(4))
    a = ML(spark, I, I, [1.0, 2.0, 3.0, 4.0])
    assert (2.0 + a).iseq(ML(spark, I, I, [3.0, 4.0, 5.0, 6.0]))
    assert (2.0 * a).iseq(ML(spark, I, I, [2.0, 4.0, 6.0, 8.0]))
    assert (10.0 - a).iseq(ML(spark, I, I, [9.0, 8.0, 7.0, 6.0]))
    assert (12.0 / a).iseq(ML(spark, I, I, [12.0, 6.0, 4.0, 3.0]))


def test_binop_contextvar_scope(spark):
    from pygraphblas_spark import binary_op

    I = list(range(4))
    a = ML(spark, I, I, [1, 7, 3, 9])
    b = ML(spark, I, I, [5, 2, 8, 4])
    with binary_op("MIN"):
        got = a + b  # PLUS default overridden by scope
    assert got.iseq(ML(spark, I, I, [1, 2, 3, 4]))
    assert (a + b).iseq(ML(spark, I, I, [6, 9, 11, 13]))  # scope exited


def test_accum_contextvar_scope(spark):
    """with Accum(PLUS): an op writing into out= merges instead of
    replacing (reference binaryop.py:80-101 + tests/test_matrix.py
    accum sections)."""
    from pygraphblas_spark import Accum

    I = list(range(3))
    out = ML(spark, I, I, [100, 200, 300])
    a = ML(spark, I, I, [1.0, 2.0, 3.0])
    with Accum("PLUS"):
        r = a.apply("IDENTITY", out=out)
    assert sorted(r.to_lists()[2]) == [101.0, 202.0, 303.0]
    # outside the scope: plain replace
    r2 = a.apply("IDENTITY", out=ML(spark, I, I, [100, 200, 300]))
    assert sorted(r2.to_lists()[2]) == [1.0, 2.0, 3.0]


def test_desc_contextvar_scope(spark):
    from pygraphblas_spark import descriptor

    a = ML(spark, [0, 0], [1, 2], [1.0, 2.0], 3, 3)
    b = ML(spark, [0, 1], [2, 2], [1.0, 1.0], 3, 3)
    explicit = a.mxm(b, "PLUS_TIMES", desc=descriptor.T0)
    with descriptor.T0:
        scoped = a.mxm(b, "PLUS_TIMES")
    assert scoped.iseq(explicit)
    assert (scoped.nrows, scoped.ncols) == (explicit.nrows, explicit.ncols)


def test_matrix_all_get_contains_scipy(spark):
    m = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    n = ML(spark, [0, 1, 2], [1, 2, 0], [1, 2, 3])
    assert m.all(n, "EQ")
    assert not m.all(n, "GT")
    assert m.get(1, 2) == 2
    assert m.get(0, 0) is None
    assert m.get(0, 0, "foo") == "foo"
    assert (0, 1) in m and (0, 0) not in m
    # scipy round-trip (reference matrix.py:3495) — scipy optional
    pytest.importorskip("scipy")
    s = m.to_scipy_sparse()
    back = Matrix.from_scipy_sparse(spark, s)
    assert m.iseq(back)


def test_remainder_rounds_half_to_even(spark):
    """REMAINDER must match C remainder() (rint = half-to-even), not
    round-half-away: at exact .5 multiples the two differ by |b|."""
    import math

    from pygraphblas_spark.algebra import _BINARY
    from pyspark.sql import functions as F

    cases = [(2.5, 1.0), (3.5, 1.0), (-2.5, 1.0), (7.0, 2.0), (5.0, 3.0)]
    df = spark.createDataFrame(cases, "a double, b double")
    got = [
        r["r"]
        for r in df.select(
            _BINARY["REMAINDER"].fn(F.col("a"), F.col("b")).alias("r")
        ).collect()
    ]
    want = [math.remainder(a, b) for a, b in cases]
    assert got == want


def test_bitwise_and_frexp_ops(spark):
    import math

    from pygraphblas_spark.algebra import binary_op as bop, unary_op as uop
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(12,)], "x long")
    r = df.select(
        bop("BGET")(F.col("x"), F.lit(3)).alias("g"),
        bop("BSET")(F.col("x"), F.lit(1)).alias("s"),
        bop("BCLR")(F.col("x"), F.lit(3)).alias("c"),
        bop("BSHIFT")(F.col("x"), F.lit(2)).alias("l"),
        bop("BSHIFT")(F.col("x"), F.lit(-2)).alias("rr"),
        bop("BGET")(F.col("x"), F.lit(99)).alias("oob"),
    ).first()
    # 12 = 0b1100; 1-based bits: bit3=1, set bit1 -> 13, clear bit3 -> 8
    assert (r["g"], r["s"], r["c"], r["l"], r["rr"], r["oob"]) == (1, 13, 8, 48, 3, 0)

    vals = [8.0, 0.15, -3.7, 0.0, 1.0, 0.5, 1e-300]
    dfv = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = dfv.select(
        F.col("x"),
        uop("FREXPX")(F.col("x")).alias("m"),
        uop("FREXPE")(F.col("x")).alias("e"),
    ).collect()
    for row in rows:
        m_want, e_want = math.frexp(row["x"])
        assert row["m"] == pytest.approx(m_want, abs=0), row["x"]
        assert row["e"] == e_want, row["x"]

    rows = dfv.filter(F.col("x") > 0).select(
        F.col("x"),
        uop("LGAMMA")(F.col("x")).alias("lg"),
        uop("TGAMMA")(F.col("x")).alias("tg"),
        uop("ERF")(F.col("x")).alias("erf"),
        uop("ERFC")(F.col("x")).alias("erfc"),
    ).collect()
    for row in rows:
        assert row["lg"] == pytest.approx(math.lgamma(row["x"]), rel=1e-12)
        assert row["tg"] == pytest.approx(math.gamma(row["x"]), rel=1e-12)
        assert row["erf"] == pytest.approx(math.erf(row["x"]), rel=1e-12)
        assert row["erfc"] == pytest.approx(math.erfc(row["x"]), rel=1e-12)


def test_ssget_local_collection(spark, tmp_path):
    """ssget resolves a pre-populated local collection (no network,
    unlike reference matrix.py:596-623) in both the ssgetpy extract
    layout and flat layout, and the parquet binary cache round-trips."""
    from pygraphblas_spark.matrix import Matrix

    mm = "%%MatrixMarket matrix coordinate real general\n3 3 3\n1 2 1.5\n2 3 2.5\n3 1 3.5\n"
    d = tmp_path / "ss" / "Newman" / "karate"
    d.mkdir(parents=True)
    (d / "karate.mtx").write_text(mm)
    flat = tmp_path / "ss" / "tiny.mtx"
    flat.write_text(mm)

    got = dict(Matrix.ssget(spark, "Newman/karate", collection_dir=str(tmp_path / "ss")))
    assert list(got) == ["karate.mtx"]
    M = got["karate.mtx"]
    assert M.shape == (3, 3)
    assert sorted(M.to_lists()[0]) == [0, 1, 2]

    # bare-name and flat resolution
    assert "karate.mtx" in dict(Matrix.ssget(spark, "karate", collection_dir=str(tmp_path / "ss")))
    assert "tiny.mtx" in dict(Matrix.ssget(spark, "tiny", collection_dir=str(tmp_path / "ss")))

    # binary cache: second load reads parquet + sidecar, same values
    cache = str(tmp_path / "cache")
    import os as _os
    _os.makedirs(cache, exist_ok=True)
    first = dict(Matrix.ssget(spark, "Newman/karate", collection_dir=str(tmp_path / "ss"), binary_cache_dir=cache))
    assert _os.path.exists(_os.path.join(cache, "karate.mtx.parquet.meta.json"))
    second = dict(Matrix.ssget(spark, "Newman/karate", collection_dir=str(tmp_path / "ss"), binary_cache_dir=cache))
    a = sorted(zip(*first["karate.mtx"].to_lists()))
    b = sorted(zip(*second["karate.mtx"].to_lists()))
    assert a == b

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        list(Matrix.ssget(spark, "nope", collection_dir=str(tmp_path / "ss")))
    with _pytest.raises(FileNotFoundError):
        list(Matrix.ssget(spark, "anything", collection_dir=None))


def test_stepped_and_backwards_slices(spark):
    # GxB_STRIDE / GxB_BACKWARDS range semantics (reference base.py:216-250)
    from pygraphblas_spark.matrix import Matrix
    from pygraphblas_spark.vector import Vector

    m = Matrix.from_lists(
        spark, list(range(6)), list(range(6)), [10, 11, 12, 13, 14, 15], 6, 6
    )
    # stride: rows 0,2,4 land at positions 0,1,2
    s = m[0:4:2, :]
    assert s.shape == (3, 6)
    assert s.to_dict() == {(0, 0): 10, (1, 2): 12, (2, 4): 14}
    # backwards: rows 5,3,1 land at positions 0,1,2
    b = m[5:1:-2, :]
    assert b.shape == (3, 6)
    assert b.to_dict() == {(0, 5): 15, (1, 3): 13, (2, 1): 11}

    v = Vector.from_lists(spark, list(range(6)), [0.0, 1.0, 2.0, 3.0, 4.0, 5.0], 6)
    assert v[0:5:2].to_dict() == {0: 0.0, 1: 2.0, 2: 4.0}
    assert v[5:0:-2].to_dict() == {0: 5.0, 1: 3.0, 2: 1.0}


def test_stepped_assign(spark):
    from pygraphblas_spark.matrix import Matrix

    m = Matrix.sparse(spark, "INT64", 6, 6)
    sub = Matrix.from_lists(spark, [0, 1, 2], [0, 1, 2], [1, 2, 3], 3, 3)
    # positions 0,1,2 of sub land at rows/cols 0,2,4
    out = m.assign(sub, rows=slice(0, 4, 2), cols=slice(0, 4, 2))
    assert out.to_dict() == {(0, 0): 1, (2, 2): 2, (4, 4): 3}
    # backwards: positions land at 5,3,1
    back = m.assign(sub, rows=slice(5, 1, -2), cols=slice(5, 1, -2))
    assert back.to_dict() == {(5, 5): 1, (3, 3): 2, (1, 1): 3}
    # stepped scalar assign rectangle
    sc = m.assign_scalar(7, rows=slice(0, 4, 2), cols=slice(1, 1))
    assert sc.to_dict() == {(0, 1): 7, (2, 1): 7, (4, 1): 7}


def test_assign_scalar_write_rule(spark):
    # complement mask / replace / scoped accum through assign_scalar —
    # reference GrB_Matrix_assign semantics (matrix.py:3106)
    from pygraphblas_spark import Accum, descriptor
    from pygraphblas_spark.matrix import Matrix

    m = Matrix.from_lists(spark, [0, 1], [0, 1], [1, 2], 2, 2)
    mask = Matrix.from_lists(spark, [0], [0], [True], 2, 2, typ="BOOL")

    # complemented mask over an explicit region: writes everywhere the
    # mask does NOT admit
    out = m.assign_scalar(
        9, rows=slice(0, 1), cols=slice(0, 1), mask=mask, desc=descriptor.C
    )
    assert out.to_dict() == {(0, 0): 1, (0, 1): 9, (1, 0): 9, (1, 1): 9}

    # replace: out-of-mask cells are cleared
    rep = m.assign_scalar(9, mask=mask, desc=descriptor.R)
    assert rep.to_dict() == {(0, 0): 9}

    # scoped accumulator is honored (was silently ignored pre-fix)
    with Accum("PLUS"):
        acc = m.assign_scalar(10, mask=mask)
    assert acc.to_dict() == {(0, 0): 11, (1, 1): 2}


def test_vector_assign_scalar_write_rule(spark):
    from pygraphblas_spark import Accum, descriptor
    from pygraphblas_spark.vector import Vector

    v = Vector.from_lists(spark, [0, 1], [1.0, 2.0], 3)
    mask = Vector.from_lists(spark, [0], [True], 3, typ="BOOL")

    out = v.assign_scalar(9.0, sel=slice(0, 2), mask=mask, desc=descriptor.C)
    assert out.to_dict() == {0: 1.0, 1: 9.0, 2: 9.0}

    rep = v.assign_scalar(9.0, mask=mask, desc=descriptor.R)
    assert rep.to_dict() == {0: 9.0}

    with Accum("PLUS"):
        acc = v.assign_scalar(10.0, mask=mask)
    assert acc.to_dict() == {0: 11.0, 1: 2.0}


def test_stride_positions_are_exact_above_2_53(spark):
    # float division would corrupt positions above 2^53; div is exact
    from pygraphblas_spark.matrix import Matrix

    big = (1 << 53) + 1
    m = Matrix.from_lists(spark, [big], [0], [7], big + 1, 1)
    s = m[0 : big : 1, :]
    assert s.to_dict() == {(big, 0): 7}


def test_float_nan_inf_c_semantics(spark):
    # SuiteSparse float ops are C semantics: MINV(0)=inf, DIV by 0=inf,
    # MIN/MAX are fmin/fmax (NaN ignored unless all operands are NaN)
    import math

    from pygraphblas_spark.matrix import Matrix

    nan = float("nan")
    m = Matrix.from_lists(spark, [0, 0, 1], [0, 1, 0], [nan, 1.0, 2.0], 2, 2)
    assert m.reduce("MIN") == 1.0
    assert m.reduce("MAX") == 2.0  # fmax ignores the NaN
    assert math.isnan(m.reduce("PLUS"))  # + propagates, as in C

    allnan = Matrix.from_lists(spark, [0], [0], [nan], 1, 1)
    assert math.isnan(allnan.reduce("MAX"))

    a = Matrix.from_lists(spark, [0, 1], [0, 0], [nan, nan], 2, 1)
    b = Matrix.from_lists(spark, [0, 1], [0, 0], [3.0, nan], 2, 1)
    got = a.eadd(b, "MAX").to_dict()
    assert got[(0, 0)] == 3.0 and math.isnan(got[(1, 0)])

    z = Matrix.from_lists(spark, [0], [0], [0.0], 1, 1)
    assert (~z).to_dict() == {(0, 0): float("inf")}
    d = Matrix.from_lists(spark, [0], [0], [1.0], 1, 1)
    assert d.apply_second("DIV", 0.0).to_dict() == {(0, 0): float("inf")}


def test_kronecker_modifiers(spark):
    # reference matrix.py:2739: kron takes (op, mask, accum, desc)
    from pygraphblas_spark import descriptor
    from pygraphblas_spark.matrix import Matrix

    a = Matrix.from_lists(spark, [0, 1], [1, 0], [2, 3], 2, 2)
    b = Matrix.from_lists(spark, [0], [0], [10], 1, 1)
    k = a.kronecker(b)
    assert k.to_dict() == {(0, 1): 20, (1, 0): 30}
    # T0: kron(Aᵀ, B)
    kt = a.kronecker(b, desc=descriptor.T0)
    assert kt.to_dict() == {(1, 0): 20, (0, 1): 30}
    # mask + accum into out
    mask = Matrix.from_lists(spark, [0], [1], [True], 2, 2, typ="BOOL")
    out = Matrix.from_lists(spark, [0, 1], [1, 0], [100, 100], 2, 2)
    km = a.kronecker(b, mask=mask, accum="PLUS", out=out)
    assert km.to_dict() == {(0, 1): 120, (1, 0): 100}
