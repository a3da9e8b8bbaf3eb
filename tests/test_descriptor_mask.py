"""Mask / accumulator / descriptor semantics — the GraphBLAS write rule.

Replicates the reference's descriptor tests exactly
(tests/test_descriptor.py:13-30) plus accum and structural/value mask
behaviors from the reference docs (descriptor.py:22-51).
"""

import pytest

from pygraphblas_spark import Matrix, Vector, descriptor


def ML(spark, I, J, V, nrows=None, ncols=None):
    return Matrix.from_lists(spark, I, J, V, nrows, ncols)


def VL(spark, I, V, size=None):
    return Vector.from_lists(spark, I, V, size)


def test_RCT0(spark):
    # reference tests/test_descriptor.py:13-21: BFS step with
    # replace+complement-mask+transpose — w stays a frontier.
    M = ML(spark, [0, 1, 2], [1, 2, 0], [True, True, True])
    w = VL(spark, [0], [True], 3)
    v = Vector.sparse(spark, "BOOL", 3)
    out = M.mxv(w, out=w, mask=v, desc=descriptor.RCT0)
    assert out.to_dict() == {1: True}


def test_RC(spark):
    # reference tests/test_descriptor.py:24-30
    M = ML(spark, [0, 1, 2], [1, 2, 0], [True, True, True])
    w = VL(spark, [0], [True], 3)
    v = Vector.sparse(spark, "BOOL", 3)
    out = M.mxv(w, out=w, mask=v, desc=descriptor.RC)
    assert out.to_dict() == {2: True}


def test_value_mask_vs_structural(spark):
    # value mask: only cells whose mask value is true are written;
    # structural (S): any stored cell counts, even false.
    a = ML(spark, [0, 1], [0, 1], [1, 2], 2, 2)
    b = ML(spark, [0, 1], [0, 1], [10, 20], 2, 2)
    mask = ML(spark, [0, 1], [0, 1], [True, False], 2, 2)
    r = a.eadd(b, mask=mask, desc=descriptor.R)
    assert r.to_dict() == {(0, 0): 11}
    rs = a.eadd(b, mask=mask, desc=descriptor.RS)
    assert rs.to_dict() == {(0, 0): 11, (1, 1): 22}


def test_complement_mask(spark):
    a = ML(spark, [0, 1], [0, 1], [1, 2], 2, 2)
    b = ML(spark, [0, 1], [0, 1], [10, 20], 2, 2)
    mask = ML(spark, [0], [0], [True], 2, 2)
    r = a.eadd(b, mask=mask, desc=descriptor.RC)
    assert r.to_dict() == {(1, 1): 22}


def test_mask_no_replace_keeps_old(spark):
    # without R, out-entries outside the mask survive
    old = ML(spark, [0, 1], [0, 1], [100, 200], 2, 2)
    a = ML(spark, [0, 1], [0, 1], [1, 2], 2, 2)
    b = ML(spark, [0, 1], [0, 1], [10, 20], 2, 2)
    mask = ML(spark, [0], [0], [True], 2, 2)
    r = a.eadd(b, out=old, mask=mask)
    assert r.to_dict() == {(0, 0): 11, (1, 1): 200}


def test_accum(spark):
    # accum merges new result into out with the accumulator
    old = ML(spark, [0], [0], [100], 2, 2)
    a = ML(spark, [0, 1], [0, 1], [1, 2], 2, 2)
    b = ML(spark, [0, 1], [0, 1], [10, 20], 2, 2)
    r = a.eadd(b, out=old, accum="PLUS")
    assert r.to_dict() == {(0, 0): 111, (1, 1): 22}


def test_mxv_accum_pagerank_shape(spark):
    # the PageRank idiom: r[:]=teleport then A.mxv(w, out=r, accum=PLUS,
    # semiring=PLUS_SECOND, desc=T0)  (gap/prmark.py:21-23)
    A = ML(spark, [0, 1], [1, 0], [1.0, 1.0], 2, 2)
    w = VL(spark, [0, 1], [0.3, 0.7], 2)
    r = Vector.dense(spark, "FP64", 2, fill=0.1)
    out = A.mxv(w, out=r, accum="PLUS", semiring="PLUS_SECOND", desc=descriptor.T0)
    # in-neighbor sums: node0 gets w[1]=0.7, node1 gets w[0]=0.3, +0.1 each
    d = out.to_dict()
    assert d[0] == pytest.approx(0.8)
    assert d[1] == pytest.approx(0.4)


def test_masked_mxm_triangle_idiom(spark):
    # L.mxm(L, mask=L, semiring=PLUS_PAIR): wedges closed by an existing
    # edge (Triangle-Counting.ipynb cell 4 / TriangleCentrality cell 17)
    # triangle 0-1-2 + pendant 2-3, L = lower triangle (src>dst)
    L = ML(spark, [1, 2, 2, 3], [0, 0, 1, 2], [True] * 4, 4, 4)
    C = L.mxm(L, mask=L, semiring="PLUS_PAIR")
    assert C.to_dict() == {(2, 0): 1}
    assert C.reduce_int() == 1
