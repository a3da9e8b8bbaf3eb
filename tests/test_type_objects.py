"""Reference-parity: first-class type objects, global options, and the
inspection/print sugar families.

Mirrors reference usage patterns: types as op namespaces
(reference types.py:135-345), options_set/options_get (base.py:49-130),
extractTuples-backed I/J/V properties (matrix.py:1495-1607,
vector.py:113-189), wait/memory_usage/print.
"""

import io

import numpy as np
import pytest

from pygraphblas_spark import (
    BOOL,
    FP64,
    GxB_INDEX_MAX,
    INT64,
    GBType,
    Matrix,
    Vector,
    options_get,
    options_set,
    select_op,
)
from pygraphblas_spark.algebra import BinaryOp, Monoid, Semiring, UnaryOp


# ---------------------------------------------------------------- types --


def test_type_objects_are_type_names():
    # GBType subclasses str: every string-typed engine path accepts them.
    assert FP64 == "FP64" and isinstance(FP64, str)
    assert INT64.upper() == "INT64"
    assert GxB_INDEX_MAX == 1 << 60


def test_type_bound_ops_resolve():
    assert isinstance(FP64.PLUS_TIMES, Semiring)
    assert isinstance(FP64.MIN_PLUS, Semiring)
    assert isinstance(FP64.PLUS_MONOID, Monoid)
    assert isinstance(FP64.PLUS, BinaryOp)
    assert isinstance(FP64.ABS, UnaryOp)
    assert isinstance(BOOL.LOR_LAND, Semiring)
    with pytest.raises(AttributeError):
        FP64.NO_SUCH_OP_XYZ  # noqa: B018


def test_matrix_constructors_accept_type_objects(spark):
    m = Matrix.from_lists(spark, [0, 1], [1, 0], [1.5, 2.5], 2, 2, typ=FP64)
    assert m.typ == "FP64"
    assert m.type == FP64
    assert isinstance(m.type, GBType)


def test_mxm_with_type_bound_semiring(spark):
    a = Matrix.from_lists(spark, [0, 0, 1], [0, 1, 1], [1.0, 2.0, 3.0], 2, 2)
    b = Matrix.from_lists(spark, [0, 1], [0, 0], [10.0, 100.0], 2, 2)
    c = a.mxm(b, semiring=FP64.PLUS_TIMES)
    assert c.to_dict() == {(0, 0): 210.0, (1, 0): 300.0}


def test_reference_idiom_apply_type_minv(spark):
    # reference matrix.py:1713: ~A == A.apply(A.type.MINV)
    m = Matrix.from_lists(spark, [0, 1], [0, 1], [2.0, 4.0], 2, 2)
    inv = m.apply(m.type.MINV)
    assert inv.to_dict() == {(0, 0): 0.5, (1, 1): 0.25}


def test_type_default_values_and_spark_type():
    assert FP64.default_zero == 0.0 and FP64.default_one == 1.0
    assert INT64.spark_type.typeName() == "long"


# ------------------------------------------------------------- options --


def test_options_set_get_roundtrip(spark):
    before = options_get()
    try:
        options_set(nthreads=12, chunk=1024, hyper_switch=0.25)
        opts = options_get()
        assert opts["nthreads"] == 12
        assert opts["chunk"] == 1024
        assert opts["hyper_switch"] == 0.25
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == 12
    finally:
        options_set(
            nthreads=before["nthreads"],
            chunk=before["chunk"],
            hyper_switch=before["hyper_switch"],
        )


# ------------------------------------------------------------ select_op --


def test_user_select_op(spark):
    select_op("ROW_PLUS_COL_EVEN", lambda s, d, v, k: (s + d) % 2 == 0)
    m = Matrix.from_lists(spark, [0, 0, 1, 1], [0, 1, 0, 1], [1, 2, 3, 4], 2, 2)
    out = m.select("ROW_PLUS_COL_EVEN")
    assert out.to_dict() == {(0, 0): 1, (1, 1): 4}
    # lookup form returns the registered callable
    assert callable(select_op("ROW_PLUS_COL_EVEN"))


# --------------------------------------------------------- matrix sugar --


def test_matrix_tuple_properties(spark):
    m = Matrix.from_lists(spark, [0, 1, 2], [1, 2, 0], [42, 314, 4224], 3, 3)
    assert list(m.I) == [0, 1, 2]
    assert list(m.J) == [1, 2, 0]
    assert list(m.V) == [42, 314, 4224]
    np.testing.assert_array_equal(m.npI, [0, 1, 2])
    np.testing.assert_array_equal(m.npJ, [1, 2, 0])
    np.testing.assert_array_equal(m.npV, [42, 314, 4224])
    assert m.M.to_dict() == {(0, 1): True, (1, 2): True, (2, 0): True}


def test_matrix_wait_memory_print(spark):
    m = Matrix.from_lists(spark, [0, 1], [1, 0], [1, 2], 2, 2)
    assert m.wait() is m
    assert m.df.storageLevel.useMemory  # persisted by wait()
    assert m.memory_usage > 0
    buf = io.StringIO()
    m.print(name="M", f=buf)
    text = buf.getvalue()
    assert "M <INT64 2x2>" in text and str(m) in text
    m.df.unpersist()


def test_matrix_storage_knobs_roundtrip(spark):
    m = Matrix.from_lists(spark, [0], [0], [1], 1, 1)
    m.hyper_switch = 0.5
    m.format = 1
    m.sparsity = 4
    assert m.hyper_switch == 0.5
    assert m.format == 1
    assert m.sparsity == 4
    assert m.sparsity_status in (1, 2, 4, 8)


def test_from_tsv_and_binfile_aliases(spark, tmp_path):
    tsv = tmp_path / "edges.tsv"
    tsv.write_text("0\t1\t2.5\n1\t0\t3.5\n")
    m = Matrix.from_tsv(spark, str(tsv), "FP64", 2, 2)
    assert m.to_dict() == {(0, 1): 2.5, (1, 0): 3.5}

    p = str(tmp_path / "m.parquet")
    m.to_binfile(p)
    back = Matrix.from_binfile(spark, p, 2, 2, "FP64")
    assert back.to_dict() == m.to_dict()


def test_matrix_assign_alias_with_mask(spark):
    m = Matrix.from_lists(spark, [0], [0], [1], 2, 2)
    s = Matrix.from_lists(spark, [0, 1], [1, 1], [7, 8], 2, 2)
    mask = Matrix.from_lists(spark, [1], [1], [True], 2, 2, typ="BOOL")
    out = m.assign(s, mask=mask)
    # only the masked cell (1,1) is written; existing (0,0) survives
    assert out.to_dict() == {(0, 0): 1, (1, 1): 8}


# --------------------------------------------------------- vector sugar --


def test_vector_tuple_properties(spark):
    v = Vector.from_lists(spark, [1, 3], [10.0, 30.0], 5)
    assert list(v.I) == [1, 3]
    assert list(v.V) == [10.0, 30.0]
    np.testing.assert_array_equal(v.npI, [1, 3])
    np.testing.assert_array_equal(v.npV, [10.0, 30.0])
    np.testing.assert_array_equal(v.indices, [1, 3])
    np.testing.assert_array_equal(v.vals, [10.0, 30.0])


def test_vector_invert_wait_print(spark):
    v = Vector.from_lists(spark, [0, 1], [2.0, 4.0], 2)
    inv = ~v
    assert inv.to_dict() == {0: 0.5, 1: 0.25}
    b = Vector.from_lists(spark, [0], [True], 1, typ="BOOL")
    assert (~b).to_dict() == {0: False}

    assert v.wait() is v
    assert v.memory_usage > 0
    buf = io.StringIO()
    v.print(name="v", f=buf)
    assert "v <FP64 size=2>" in buf.getvalue()
    assert str(v).startswith("0| 2.0")
    v.df.unpersist()


def test_vector_type_namespace(spark):
    v = Vector.from_lists(spark, [0], [9.0], 1)
    assert v.type == FP64
    out = v.apply(v.type.SQRT)
    assert out.to_dict() == {0: 3.0}


# ----------------------------------------------------------- scalar/viz --


def test_scalar_parity():
    from pygraphblas_spark import Scalar

    s = Scalar.from_type(FP64)
    assert s.nvals == 0 and len(s) == 0 and not s
    s[0] = 2.5
    assert s[0] == 2.5 and len(s) == 1
    d = s.dup()
    d.clear()
    assert s[0] == 2.5 and d.nvals == 0
    assert s.gb_type == FP64
    assert s.wait() is s


def test_viz_dot_sources(spark):
    from pygraphblas_spark import viz

    m = Matrix.from_lists(spark, [0, 1], [1, 2], [1.5, 2.0], 3, 3)
    dot = viz.draw(m, name="g")
    assert isinstance(dot, str)  # graphviz not installed in the sandbox
    assert "digraph" in dot and "0 -> 1" in dot and '"1.5"' in dot
    undirected = viz.graph_dot(m, directed=False)
    assert "0 -- 1" in undirected

    v = Vector.from_lists(spark, [0, 2], [1.0, 3.0], 3)
    vdot = viz.draw(v)
    assert "shape=record" in vdot and "2: 3" in vdot

    grid = viz.matrix_dot(m)
    assert "<TABLE" in grid and "<TD>2</TD>" in grid


def test_cy_matrix_json(spark):
    from pygraphblas_spark.viz import cy_matrix

    m = Matrix.from_lists(spark, [1, 0], [2, 1], [5.0, 3.0], 3, 3)
    d = cy_matrix(m)
    assert d["directed"] is True
    assert [n["data"]["id"] for n in d["elements"]["nodes"]] == ["0", "1", "2"]
    assert d["elements"]["edges"][0]["data"]["source"] == "0"


def test_select_scalar_thunk(spark):
    from pygraphblas_spark import Scalar

    m = Matrix.from_lists(spark, [0, 1], [0, 1], [1, 5], 2, 2)
    assert m.select(">", Scalar.from_value(2)).to_dict() == {(1, 1): 5}
    v = Vector.from_lists(spark, [0, 1], [1.0, 5.0], 2)
    assert v.select(">", Scalar.from_value(2.0)).to_dict() == {1: 5.0}


def test_novalue_exception(spark):
    from pygraphblas_spark import NoValue

    m = Matrix.from_lists(spark, [0], [0], [1], 2, 2)
    assert m[0, 0] == 1
    with pytest.raises(NoValue):
        m[1, 1]  # noqa: B018
    assert m.get(1, 1, 42) == 42  # get still defaults

    v = Vector.from_lists(spark, [0], [1.0], 2)
    with pytest.raises(NoValue):
        v[1]  # noqa: B018


def test_positional_binops_and_semirings(spark):
    # GxB positional multiply ops (reference binaryop.py:106): C[i,j] =
    # ⊕_k op(i, k, k, j). MIN_SECONDI = smallest inner index = min common k.
    a = Matrix.from_lists(spark, [0, 0, 1], [1, 2, 2], True, 3, 3)
    b = Matrix.from_lists(spark, [1, 2, 2], [0, 0, 1], True, 3, 3)
    c = a.mxm(b, semiring="MIN_SECONDI")
    # row 0 reaches col 0 via k=1 and k=2 → min 1; (0,1) via k=2; (1,x) via k=2
    assert c.to_dict() == {(0, 0): 1, (0, 1): 2, (1, 0): 2, (1, 1): 2}
    # FIRSTI = the row index i itself
    ci = a.mxm(b, semiring="MIN_FIRSTI")
    assert ci.to_dict() == {(0, 0): 0, (0, 1): 0, (1, 0): 1, (1, 1): 1}
    # SECONDJ1 = 1-based output column
    cj = a.mxm(b, semiring="MIN_SECONDJ1")
    assert cj.to_dict() == {(0, 0): 1, (0, 1): 2, (1, 0): 1, (1, 1): 2}


def test_bfs_parent_vxm_idiom(spark):
    # the reference BFS-parent idiom: pi = frontier.vxm(A, <SECONDI sr>)
    # gives each newly-reached vertex its (min) parent's index
    I = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
    J = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]
    A = Matrix.from_lists(spark, I, J, True, 7, 7)
    frontier = Vector.from_lists(spark, [0], [True], 7, typ="BOOL")
    parents = frontier.vxm(A, semiring="MIN_SECONDI")
    # neighbors of 0 are {1, 3}; their parent (the A-row index k) is 0
    assert parents.to_dict() == {1: 0, 3: 0}
    # second hop: parents of the next frontier, min rule
    f2 = Vector.from_lists(spark, [1, 3], [True, True], 7, typ="BOOL")
    p2 = f2.vxm(A, semiring="MIN_SECONDI")
    assert p2.to_dict() == {4: 1, 6: 1, 0: 3, 2: 3}


def test_type_operator_attribute_dispatch(spark):
    # reference matrix.py:1607 __getattr__: ops resolve on the object's
    # type and bind the object — A.plus_times(B) == A.mxm(B, PLUS_TIMES)
    a = Matrix.from_lists(spark, [0, 0, 1], [0, 1, 1], [1.0, 2.0, 3.0], 2, 2)
    b = Matrix.from_lists(spark, [0, 1], [0, 0], [10.0, 100.0], 2, 2)
    assert a.plus_times(b).to_dict() == {(0, 0): 210.0, (1, 0): 300.0}
    assert a.PLUS_TIMES(b).to_dict() == a.mxm(b, semiring="PLUS_TIMES").to_dict()
    # BinaryOp attribute = emult
    c = Matrix.from_lists(spark, [0], [0], [5.0], 2, 2)
    assert a.plus(c).to_dict() == {(0, 0): 6.0}
    # UnaryOp attribute = apply; Monoid = reduce
    assert a.minv().to_dict() == {(0, 0): 1.0, (0, 1): 0.5, (1, 1): 1.0 / 3.0}
    assert a.plus_monoid() == 6.0
    # vector: semiring attr = vxm
    v = Vector.from_lists(spark, [0, 1], [1.0, 1.0], 2)
    assert v.plus_times(a).to_dict() == {0: 1.0, 1: 5.0}
    with pytest.raises(AttributeError):
        a.not_an_op_at_all  # noqa: B018


def test_dispatch_rejects_ambiguous_positional_args(spark):
    a = Matrix.from_lists(spark, [0], [0], [1.0], 1, 1)
    with pytest.raises(TypeError):
        a.plus_times(a, a)  # positional extras are ambiguous — kwargs only
    with pytest.raises(TypeError):
        a.plus_monoid(42)
    # kwargs route through to the underlying op
    mask = Matrix.from_lists(spark, [0], [0], [True], 1, 1, typ="BOOL")
    assert a.plus_times(a, mask=mask).to_dict() == {(0, 0): 1.0}


def test_fmax_semiring_agg_direct_nan(spark):
    # MAX_* direct-aggregate shortcuts must keep fmax NaN semantics
    import math

    nan = float("nan")
    a = Matrix.from_lists(spark, [0, 0], [0, 1], [1.0, nan], 1, 2)
    b = Matrix.from_lists(spark, [0, 1], [0, 0], [5.0, 7.0], 2, 1)
    assert a.mxm(b, semiring="MAX_TIMES").to_dict() == {(0, 0): 5.0}
    assert a.mxm(b, semiring="MAX_SECOND").to_dict() == {(0, 0): 7.0}
    allnan = Matrix.from_lists(spark, [0], [0], [nan], 1, 1)
    onev = Matrix.from_lists(spark, [0], [0], [1.0], 1, 1)
    assert math.isnan(allnan.mxm(onev, semiring="MAX_FIRST").to_dict()[(0, 0)])


def test_simhash_pigeonhole_wide_hamming(spark):
    # banding must re-chunk for the requested budget: two signatures
    # differing in exactly 4 spread-out bits (Hamming 4 > the classic
    # 3-budget) must still pair under max_hamming=6
    from pygraphblas_spark.pipeline import dedup as dd

    base = "alpha beta gamma delta epsilon zeta " * 6
    near = base.replace("beta", "betaX", 2)
    df = spark.createDataFrame(
        [(1, base), (2, near)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in
            dd.simhash_signatures(df, hash_mode="sha256").collect()}
    h = bin(sigs[1] ^ sigs[2]).count("1")
    pairs = dd.simhash_near_pairs(df, max_hamming=6, hash_mode="sha256").collect()
    if h <= 6:
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, h)]
    else:
        assert pairs == []
