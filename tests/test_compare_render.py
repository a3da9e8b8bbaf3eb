"""Element-wise comparison semantics (reference tests/test_matrix.py
test_cmp_scalar, matrix.py:2343-2378) + render sinks + Scalar."""

from itertools import product

import pytest

from pygraphblas_spark import Matrix, Scalar, Vector


def ML(spark, I, J, V, nrows=None, ncols=None):
    return Matrix.from_lists(spark, I, J, V, nrows, ncols)


def test_cmp_scalar(spark):
    I, J = tuple(map(list, zip(*product(range(3), repeat=2))))
    V = list(range(9))
    m = ML(spark, I, J, V, 3, 3)

    # op(other, 0) true → pattern-preserving boolean values
    n = m > 5
    assert n.to_dict() == {
        (i, j): (i * 3 + j > 5) for i, j in product(range(3), repeat=2)
    }
    n = m >= 5
    assert n.to_dict() == {
        (i, j): (i * 3 + j >= 5) for i, j in product(range(3), repeat=2)
    }
    # op(other, 0) false → only-true cells (select + ONE), reference
    # tests/test_matrix.py:676-681
    n = m < 5
    assert n.to_dict() == {
        (i, j): True for i, j in product(range(3), repeat=2) if i * 3 + j < 5
    }


def test_cmp_matrix(spark):
    a = ML(spark, [0, 1], [0, 1], [1, 5], 2, 2)
    b = ML(spark, [0, 1], [0, 1], [1, 3], 2, 2)
    eq = a == b
    # densified compare: all 4 cells present
    d = eq.to_dict()
    assert d[(0, 0)] is True and d[(1, 1)] is False
    assert d[(0, 1)] is True and d[(1, 0)] is True  # fill-one == fill-one
    gt = a > b
    assert gt.to_dict()[(1, 1)] is True


def test_renders(spark):
    m = ML(spark, [0, 1], [1, 0], [7, 9], 2, 2)
    s = m.to_string()
    assert s == "- 7\n9 -"
    md = m.to_markdown_table()
    assert "|7|" in md and md.count("\n") == 3
    html = m.to_html_table()
    assert html.startswith("<table>") and "<td>9</td>" in html


def test_assign_row_col(spark):
    m = Matrix.sparse(spark, "INT64", 3, 3)
    v = Vector.from_lists(spark, [0, 2], [5, 6], 3)
    m2 = m.assign_row(1, v)
    assert m2.to_dict() == {(1, 0): 5, (1, 2): 6}
    m3 = m2.assign_col(0, Vector.from_lists(spark, [1], [9], 3))
    assert m3.to_dict() == {(1, 0): 9, (1, 2): 6}
    m4 = m3.assign_row(1, v, accum="PLUS")
    assert m4.to_dict() == {(1, 0): 14, (1, 2): 12}


def test_scalar(spark):
    s = Scalar.from_value(3)
    assert s.nvals == 1 and s[0] == 3 and bool(s)
    assert s == 3 and s == Scalar.from_value(3)
    s.clear()
    assert s.nvals == 0 and not bool(s)


def test_vector_random_deterministic(spark):
    a = Vector.random(spark, "FP64", 50, 100, seed=7)
    b = Vector.random(spark, "FP64", 50, 100, seed=7)
    assert a.iseq(b)
    assert a.df.filter("id >= 100 OR id < 0").count() == 0
