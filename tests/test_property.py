"""Property-based algebraic law tests (hypothesis) — the reference
validates its semiring algebra with a 13-type × op cross-product of
golden doctests (reference pygraphblas/tests/); here random sparse COO
matrices check the LAWS themselves against dense numpy oracles:

- mxm PLUS_TIMES == dense matmul (masked/unmasked)
- (A @ B).T == B.T @ A.T           (transpose anti-distributes)
- eadd PLUS is commutative; emult TIMES distributes over the pattern
  intersection
- reduce == dense sum; kron dims/values == np.kron

Matrices stay tiny (≤6×6, ≤14 nnz) so each Spark action is cheap;
examples are capped for suite runtime. Determinism: hypothesis derives
data from its own PRNG seed, not wall-clock."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pygraphblas_spark.matrix import Matrix

DIM = 6

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # stable corpus; no flaky CI reruns
)


@st.composite
def coo(draw, dim=DIM, max_nnz=14):
    """Random COO triple with unique (i, j) and small int64 values."""
    cells = draw(
        st.lists(
            st.tuples(
                st.integers(0, dim - 1),
                st.integers(0, dim - 1),
                st.integers(-9, 9),
            ),
            max_size=max_nnz,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    I = [c[0] for c in cells]
    J = [c[1] for c in cells]
    V = [c[2] for c in cells]
    return I, J, V


def dense(I, J, V, dim=DIM):
    m = np.zeros((dim, dim), dtype="int64")
    for i, j, v in zip(I, J, V):
        m[i, j] = v
    return m


def mat(spark, triple, dim=DIM):
    I, J, V = triple
    return Matrix.from_lists(spark, I, J, V, dim, dim, typ="INT64")


def as_dense(m: Matrix, dim=DIM):
    out = np.zeros((dim, dim), dtype="int64")
    for i, j, v in zip(*m.to_lists()):
        out[i, j] = v
    return out


@settings(**SETTINGS)
@given(a=coo(), b=coo())
def test_mxm_matches_numpy(spark, a, b):
    got = as_dense(mat(spark, a).mxm(mat(spark, b), semiring="PLUS_TIMES"))
    want = dense(*a) @ dense(*b)
    # implicit zeros: a structural miss and a stored 0 both read as 0
    assert (got == want).all()


@settings(**SETTINGS)
@given(a=coo(), b=coo())
def test_transpose_antidistributes_over_mxm(spark, a, b):
    A, B = mat(spark, a), mat(spark, b)
    lhs = as_dense(A.mxm(B).transpose())
    rhs = as_dense(B.transpose().mxm(A.transpose()))
    assert (lhs == rhs).all()


@settings(**SETTINGS)
@given(a=coo(), b=coo())
def test_eadd_plus_commutes_and_matches_numpy(spark, a, b):
    A, B = mat(spark, a), mat(spark, b)
    ab = as_dense(A.eadd(B, "PLUS"))
    ba = as_dense(B.eadd(A, "PLUS"))
    assert (ab == ba).all()
    assert (ab == dense(*a) + dense(*b)).all()


@settings(**SETTINGS)
@given(a=coo(), b=coo())
def test_emult_times_matches_numpy_on_intersection(spark, a, b):
    A, B = mat(spark, a), mat(spark, b)
    got = as_dense(A.emult(B, "TIMES"))
    assert (got == dense(*a) * dense(*b)).all()


@settings(**SETTINGS)
@given(a=coo(), b=coo())
def test_masked_mxm_is_unmasked_restricted_to_mask(spark, a, b):
    A, B = mat(spark, a), mat(spark, b)
    got = as_dense(A.mxm(B, mask=A))
    full = dense(*a) @ dense(*b)
    pattern = np.zeros((DIM, DIM), dtype=bool)
    for i, j, v in zip(*a):
        pattern[i, j] = v != 0  # value mask: stored zeros are false
    assert (got == np.where(pattern, full, 0)).all()


@settings(**SETTINGS)
@given(a=coo())
def test_reduce_and_kron_match_numpy(spark, a):
    A = mat(spark, a)
    assert A.reduce_int() == int(dense(*a).sum())
    K = A.kronecker(A, "TIMES")
    want = np.kron(dense(*a), dense(*a))
    got = np.zeros((DIM * DIM, DIM * DIM), dtype="int64")
    for i, j, v in zip(*K.to_lists()):
        got[i, j] = v
    assert (got == want).all()


# ---------------------------------------------------------------------------
# The GraphBLAS write rule, property-checked combinatorially:
#   C<M> accum= (A[T0?] PLUS_TIMES B)  x  {value,structural} mask
#   x {plain,complement} x {keep,replace} x {no-accum,PLUS-accum}
# against a pattern-aware pure-Python oracle (dict COO). This is the rule
# every reference operator funnels through (reference matrix.py:2380-2399 +
# the C write rule); operators/core.py:finalize implements it.
# ---------------------------------------------------------------------------


def _coo_dict(triple):
    I, J, V = triple
    return {(i, j): v for i, j, v in zip(I, J, V)}


def _mxm_oracle(a: dict, b: dict, transpose0=False) -> dict:
    """T[i,k] = Σ_j a[i,j]·b[j,k] — stored whenever the join matches,
    even if the sum is 0 (stored zeros are entries, like the engine)."""
    if transpose0:
        a = {(j, i): v for (i, j), v in a.items()}
    out: dict = {}
    for (i, j), av in a.items():
        for (j2, k), bv in b.items():
            if j == j2:
                out[(i, k)] = out.get((i, k), 0) + av * bv
    return out


def _write_rule_oracle(c_old, t, m, accum, structural, complement, replace):
    if accum:
        z = dict(c_old)
        for k, v in t.items():
            z[k] = z[k] + v if k in z else v
    else:
        z = dict(t)
    if m is None:
        return z

    def mask_true(k):
        hit = k in m and (structural or bool(m[k]))
        return (not hit) if complement else hit

    out = {k: v for k, v in z.items() if mask_true(k)}
    if not replace:
        for k, v in c_old.items():
            if not mask_true(k):
                out[k] = v
    return out


@settings(max_examples=16, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
@given(
    a=coo(), b=coo(), c=coo(), m=coo(),
    use_accum=st.booleans(),
    structural=st.booleans(),
    complement=st.booleans(),
    replace=st.booleans(),
    transpose0=st.booleans(),
)
def test_write_rule_matches_oracle(
    spark, a, b, c, m, use_accum, structural, complement, replace, transpose0
):
    from pygraphblas_spark.descriptor import Descriptor

    desc = Descriptor(
        transpose0=transpose0,
        mask_complement=complement,
        mask_structural=structural,
        replace=replace,
    )
    got = (
        mat(spark, a)
        .mxm(
            mat(spark, b),
            semiring="PLUS_TIMES",
            mask=mat(spark, m),
            accum="PLUS" if use_accum else None,
            out=mat(spark, c),
            desc=desc,
        )
        .to_dict()
    )
    t = _mxm_oracle(_coo_dict(a), _coo_dict(b), transpose0)
    want = _write_rule_oracle(
        _coo_dict(c), t, _coo_dict(m),
        use_accum, structural, complement, replace,
    )
    assert got == want


@st.composite
def vcoo(draw, dim=DIM, max_nnz=8):
    cells = draw(
        st.lists(
            st.tuples(st.integers(0, dim - 1), st.integers(-9, 9)),
            max_size=max_nnz,
            unique_by=lambda t: t[0],
        )
    )
    return [c[0] for c in cells], [c[1] for c in cells]


def _mxv_oracle(a: dict, v: dict, transpose0=False) -> dict:
    if transpose0:
        a = {(j, i): x for (i, j), x in a.items()}
    out: dict = {}
    for (i, k), av in a.items():
        if k in v:
            out[i] = out.get(i, 0) + av * v[k]
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
@given(
    a=coo(), v=vcoo(), w=vcoo(), m=vcoo(),
    use_accum=st.booleans(),
    structural=st.booleans(),
    complement=st.booleans(),
    replace=st.booleans(),
    transpose0=st.booleans(),
)
def test_vector_write_rule_matches_oracle(
    spark, a, v, w, m, use_accum, structural, complement, replace, transpose0
):
    # mxv funnels through the same finalize but has its own mask-pushdown
    # branch (operators/contraction.py mxv) — property-check it separately.
    from pygraphblas_spark.descriptor import Descriptor
    from pygraphblas_spark.vector import Vector

    def vec(t):
        return Vector.from_lists(spark, t[0], t[1], DIM, typ="INT64")

    desc = Descriptor(
        transpose0=transpose0,
        mask_complement=complement,
        mask_structural=structural,
        replace=replace,
    )
    got = (
        mat(spark, a)
        .mxv(
            vec(v),
            semiring="PLUS_TIMES",
            mask=vec(m),
            accum="PLUS" if use_accum else None,
            out=vec(w),
            desc=desc,
        )
        .to_dict()
    )
    t = _mxv_oracle(_coo_dict(a), dict(zip(*v)), transpose0)
    want = _write_rule_oracle(
        dict(zip(*w)), t, dict(zip(*m)),
        use_accum, structural, complement, replace,
    )
    assert got == want


def _assign_oracle(c_old, region, value, m, accum, structural, complement, replace):
    """Reference GrB_assign semantics on dicts — region cells (mask-
    gated) receive the scalar (accum-merged), others pass through;
    REPLACE clears what the mask does not admit."""
    def mask_true(k):
        hit = k in m and (structural or bool(m[k]))
        return (not hit) if complement else hit

    target = {k for k in region if m is None or mask_true(k)}
    out = dict(c_old)
    for k in target:
        out[k] = out[k] + value if (accum and k in out) else value
    if replace and m is not None:
        out = {k: v for k, v in out.items() if mask_true(k)}
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
@given(
    c=coo(), m=coo(),
    r0=st.integers(0, 3), rn=st.integers(1, 3),
    c0=st.integers(0, 3), cn=st.integers(1, 3),
    value=st.integers(-9, 9),
    use_accum=st.booleans(),
    structural=st.booleans(),
    complement=st.booleans(),
    replace=st.booleans(),
)
def test_assign_scalar_write_rule_matches_oracle(
    spark, c, m, r0, rn, c0, cn, value,
    use_accum, structural, complement, replace,
):
    from pygraphblas_spark.descriptor import Descriptor

    rows = slice(r0, min(r0 + rn, DIM - 1))
    cols = slice(c0, min(c0 + cn, DIM - 1))
    desc = Descriptor(
        mask_complement=complement,
        mask_structural=structural,
        replace=replace,
    )
    got = (
        mat(spark, c)
        .assign_scalar(
            value,
            rows=rows,
            cols=cols,
            mask=mat(spark, m),
            accum="PLUS" if use_accum else None,
            desc=desc,
        )
        .to_dict()
    )
    region = {
        (i, j)
        for i in range(rows.start, rows.stop + 1)
        for j in range(cols.start, cols.stop + 1)
    }
    want = _assign_oracle(
        _coo_dict(c), region, value, _coo_dict(m),
        use_accum, structural, complement, replace,
    )
    assert got == want


def _vxm_positional_oracle(v: dict, a: dict, which: str) -> dict:
    """w[j] = min over k (v[k] present, A[k,j] present) of the positional
    value: FIRSTI/FIRSTJ = k (the vector's index), SECONDI = k (A's row),
    SECONDJ = j (A's column)."""
    out: dict = {}
    for (k, j), _ in a.items():
        if k in v:
            val = {"FIRSTI": k, "FIRSTJ": k, "SECONDI": k, "SECONDJ": j}[which]
            out[j] = min(out.get(j, val), val)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
@given(
    v=vcoo(), a=coo(),
    which=st.sampled_from(["FIRSTI", "FIRSTJ", "SECONDI", "SECONDJ"]),
)
def test_vxm_positional_coordinates(spark, v, a, which):
    # vxm is implemented as a flipped mxv with an operand-swapped
    # semiring; the positional coordinate remap inside that swap
    # (contraction.py vxm) is exactly what this property guards.
    from pygraphblas_spark.vector import Vector

    vec = Vector.from_lists(spark, v[0], v[1], DIM, typ="INT64")
    got = vec.vxm(mat(spark, a), semiring=f"MIN_{which}").to_dict()
    want = _vxm_positional_oracle(dict(zip(*v)), _coo_dict(a), which)
    assert got == want
