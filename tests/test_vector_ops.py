"""Vector operator goldens (reference tests/test_vector.py)."""

import pytest

from pygraphblas_spark import Matrix, Vector, descriptor


def VL(spark, I, V, size=None, typ=None):
    return Vector.from_lists(spark, I, V, size, typ)


def test_vector_create_and_elements(spark):
    v = Vector.sparse(spark, "INT64", 10)
    assert v.size == 10 and v.nvals == 0
    v = v.set_element(3, 3)
    assert v[3] == 3 and v.nvals == 1
    v = v.set_element(3, 5)
    assert v[3] == 5 and v.nvals == 1
    v = v.del_element(3)
    assert v.nvals == 0


def test_vector_eadd_emult(spark):
    v = VL(spark, [0, 1, 2], [1, 2, 3])
    w = VL(spark, [1, 2, 3], [10, 20, 30])
    s = v.eadd(w)
    assert s.to_dict() == {0: 1, 1: 12, 2: 23, 3: 30}
    m = v.emult(w)
    assert m.to_dict() == {1: 20, 2: 60}
    assert (v + w).iseq(s)
    assert (v * w).iseq(m)


def test_vector_scalar_ops(spark):
    v = VL(spark, [0, 1, 2], [1.0, 2.0, 3.0])
    assert (v + 1.0).to_dict() == {0: 2.0, 1: 3.0, 2: 4.0}
    assert (v / 2.0).to_dict() == {0: 0.5, 1: 1.0, 2: 1.5}
    assert abs(-v).iseq(v)


def test_vector_reduce(spark):
    v = VL(spark, [0, 1, 2], [1, 2, 3])
    assert v.reduce_int() == 6
    assert v.max() == 3
    assert v.min() == 1
    assert VL(spark, [0], [True]).reduce_bool()


def test_vector_select(spark):
    v = VL(spark, [0, 1, 2], [0, 5, 3])
    assert v.select("!=0").to_dict() == {1: 5, 2: 3}
    assert v.select(">", 3).to_dict() == {1: 5}
    assert v.select("max").to_dict() == {1: 5}
    assert v.select("min").to_dict() == {0: 0}


def test_vector_extract_assign(spark):
    v = VL(spark, [0, 1, 2, 3], [1, 2, 3, 4])
    # inclusive slice
    s = v.extract(slice(1, 2))
    assert s.to_dict() == {0: 2, 1: 3} and s.size == 2
    s2 = v.extract([3, 0])
    assert s2.to_dict() == {0: 4, 1: 1}
    a = v.assign_scalar(9)
    assert a.to_dict() == {0: 9, 1: 9, 2: 9, 3: 9}
    a2 = v.assign_scalar(9, sel=slice(1, 2))
    assert a2.to_dict() == {0: 1, 1: 9, 2: 9, 3: 4}
    a3 = v.assign(VL(spark, [1], [100]))
    assert a3.to_dict() == {0: 1, 1: 100, 2: 3, 3: 4}
    a4 = v.assign(VL(spark, [1], [100]), accum="PLUS")
    assert a4.to_dict() == {0: 1, 1: 102, 2: 3, 3: 4}


def test_vector_apply(spark):
    v = VL(spark, [0, 1], [4.0, 9.0])
    assert v.apply("SQRT").to_dict() == {0: 2.0, 1: 3.0}
    assert v.apply_second("TIMES", 2.0).to_dict() == {0: 8.0, 1: 18.0}


def test_from_1_to_n(spark):
    v = Vector.from_1_to_n(spark, 3)
    assert v.to_dict() == {0: 1, 1: 2, 2: 3}


def test_from_list(spark):
    # reference Vector.from_list (vector.py:359): id = position
    v = Vector.from_list(spark, [7, 8, 9])
    assert v.to_dict() == {0: 7, 1: 8, 2: 9}
    assert v.size == 3


def test_vector_pattern_cast(spark):
    v = VL(spark, [0, 2], [5, 7])
    assert v.pattern().to_dict() == {0: True, 2: True}
    assert v.cast("FP64").to_dict() == {0: 5.0, 2: 7.0}


def test_dense_iso(spark):
    v = Vector.dense(spark, "FP64", 4, fill=0.25)
    assert v.to_dict() == {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}
    w = Vector.iso(spark, 1.0, 3)
    assert w.to_dict() == {0: 1.0, 1: 1.0, 2: 1.0}


def test_vector_setitem_delitem_sugar(spark):
    """Mutating sugar: v[i]=x, v[:]=x, v[a:b]=x, v[mask]=x, del v[i]
    (reference vector.py:1430/1532)."""
    v = Vector.from_lists(spark, [0, 2], [1.0, 2.0], size=4)
    v[1] = 9.0
    assert v.to_dict() == {0: 1.0, 1: 9.0, 2: 2.0}
    del v[1]
    assert v.to_dict() == {0: 1.0, 2: 2.0}
    v[:] = 0.5  # PageRank teleport-reset idiom
    assert v.to_dict() == {0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}
    v[1:2] = 7.0
    assert v.to_dict() == {0: 0.5, 1: 7.0, 2: 7.0, 3: 0.5}
    mask = Vector.from_lists(spark, [3], [True], size=4)
    v[mask] = -1.0
    assert v.to_dict()[3] == -1.0


# ---- comparisons / all / sugar parity (reference vector.py:188,567-604) ----


def test_vector_comparisons(spark):
    v = VL(spark, [0, 1, 2], [0, 1, 2], 4)
    # pyop(other, 0) True branch: stored pattern kept, values booleanized
    gt1 = v > 1
    assert gt1.typ == "BOOL"
    assert gt1.to_dict() == {0: False, 1: False, 2: True}
    # pyop False branch: only passing cells survive (pattern semantics)
    gtm1 = v > -1
    assert gtm1.to_dict() == {0: True, 1: True, 2: True}
    lt1 = v < 1
    assert lt1.to_dict() == {0: True}
    # vector-vector: densify both then elementwise compare
    w = VL(spark, [0, 1, 3], [0, 5, 7], 4)
    eq = v == w
    assert eq.to_dict() == {0: True, 1: False, 2: False, 3: False}
    ne = v != w
    assert ne.to_dict() == {0: False, 1: True, 2: True, 3: True}


def test_vector_all_get_contains(spark):
    v = VL(spark, [0, 1, 2], [1, 2, 3])
    w = VL(spark, [0, 1, 2], [1, 2, 3])
    assert v.all(w, "EQ")
    assert not v.all(w, "GT")
    assert not v.all(VL(spark, [0, 1], [1, 2], 3), "EQ")  # nvals differ
    assert v.get(1) == 2
    assert v.get(9) is None  # out of stored pattern
    assert v.get(9, "d") == "d"
    assert 1 in v and 9 not in v


def test_vector_inplace_and_reflected(spark):
    v = VL(spark, [0, 1, 2], [1.0, 2.0, 3.0])
    w = VL(spark, [0, 1, 2], [10.0, 20.0, 30.0])
    vid = id(v)
    v += w
    assert id(v) == vid
    assert v.iseq(VL(spark, [0, 1, 2], [11.0, 22.0, 33.0]))
    v = VL(spark, [0, 1, 2], [1.0, 2.0, 3.0])
    v *= 2
    assert v.iseq(VL(spark, [0, 1, 2], [2.0, 4.0, 6.0]))
    v = VL(spark, [0, 1, 2], [1.0, 2.0, 3.0])
    v -= w
    assert v.iseq(VL(spark, [0, 1, 2], [-9.0, -18.0, -27.0]))
    v = VL(spark, [0, 1, 2], [10.0, 20.0, 30.0])
    v /= VL(spark, [0, 1, 2], [2.0, 4.0, 5.0])
    assert v.iseq(VL(spark, [0, 1, 2], [5.0, 5.0, 6.0]))
    v = VL(spark, [0, 1, 2], [1.0, 2.0, 3.0])
    v |= w
    assert v.iseq(w)
    v = VL(spark, [0, 1, 2], [1.0, 2.0, 3.0])
    v &= w
    assert v.iseq(w)
    assert (2.0 + VL(spark, [0, 1], [1.0, 2.0])).iseq(VL(spark, [0, 1], [3.0, 4.0]))
    assert (12.0 / VL(spark, [0, 1], [3.0, 4.0])).iseq(VL(spark, [0, 1], [4.0, 3.0]))
    # scoped default combiner applies to vectors too
    from pygraphblas_spark import binary_op

    a = VL(spark, [0, 1], [1, 7])
    b = VL(spark, [0, 1], [5, 2])
    with binary_op("MIN"):
        assert (a + b).iseq(VL(spark, [0, 1], [1, 2]))
