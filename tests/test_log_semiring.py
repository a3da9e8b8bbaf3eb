"""Log semiring — reference demo/Log-Semiring.ipynb.

The demo defines ``Log32`` (PLUS = logaddexp, TIMES = +) and computes
``A @ A`` over the log of edge probabilities: the result cell (i,j) is
the log of the total 2-step path probability. We replay the demo's exact
6×6 probability matrix and check ``exp(A ⊕.⊗ A)`` against the plain
linear-space PLUS_TIMES product."""

import math

from pygraphblas_spark.matrix import Matrix
from pygraphblas_spark.algebra import semiring, monoid, binary_op


# demo/Log-Semiring.ipynb cell 2
_PROBS = [
    (0, 1, 1 / 9.0),
    (0, 3, 1 / 3.0),
    (1, 2, 1 / 8.0),
    (3, 4, 1 / 6.0),
    (3, 5, 1 / 1.0),
    (4, 2, 1 / 4.0),
    (1, 5, 1 / 7.0),
    (5, 4, 1 / 2.0),
]


def test_log_semiring_mxm_matches_linear(spark):
    I = [i for i, _, _ in _PROBS]
    J = [j for _, j, _ in _PROBS]
    P = [p for _, _, p in _PROBS]

    A_log = Matrix.from_lists(spark, I, J, [math.log(p) for p in P], 6, 6)
    A_lin = Matrix.from_lists(spark, I, J, P, 6, 6)

    got = A_log.mxm(A_log, semiring="LOGADD_PLUS")
    want = A_lin.mxm(A_lin, semiring="PLUS_TIMES")

    gi, gj, gv = got.to_lists()
    wi, wj, wv = want.to_lists()
    assert sorted(zip(gi, gj)) == sorted(zip(wi, wj))
    gm = {(i, j): v for i, j, v in zip(gi, gj, gv)}
    wm = {(i, j): v for i, j, v in zip(wi, wj, wv)}
    for key in wm:
        assert math.isclose(math.exp(gm[key]), wm[key], rel_tol=1e-12), key


def test_log_semiring_as_context_manager(spark):
    """``with Log32_semiring: A @ A`` — demo cell 3's usage."""
    I = [i for i, _, _ in _PROBS]
    J = [j for _, j, _ in _PROBS]
    V = [math.log(p) for _, _, p in _PROBS]
    A_log = Matrix.from_lists(spark, I, J, V, 6, 6)
    with semiring("LOGADD_PLUS"):
        got = A_log @ A_log
    # the 7 distinct 2-step endpoints:
    # (0,2) (0,5) (0,4) (1,4) (3,2) (3,4) (5,2)
    assert got.nvals == 7


def test_logadd_monoid_pairwise_combine():
    m = monoid("LOGADD")
    assert m.identity == float("-inf")
    # pairwise logaddexp through the registered binop: log(e^a + e^b)
    op = binary_op("LOGADD")
    assert op is m.combine


def test_logadd_stable_matches_fast_in_domain(spark):
    """LOGADD_STABLE_PLUS (Arrow-batched max-shifted UDAF) agrees with
    the codegen LOGADD_PLUS on log-probability values, and stays finite
    on large log-space values (x > 709) where exp overflows the fast
    path to inf."""
    import math

    I = [i for i, _, _ in _PROBS]
    J = [j for _, j, _ in _PROBS]
    V = [math.log(p) for _, _, p in _PROBS]
    A = Matrix.from_lists(spark, I, J, V, 6, 6)
    fast = A.mxm(A, semiring="LOGADD_PLUS").to_lists()
    stable = A.mxm(A, semiring="LOGADD_STABLE_PLUS").to_lists()
    assert fast[0] == stable[0] and fast[1] == stable[1]
    for x, y in zip(fast[2], stable[2]):
        assert math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)

    # out-of-domain: two 2-step paths with log-weights ~ 500 each →
    # cell log-value ~1000; exp(1000) overflows the unshifted aggregate
    big = Matrix.from_lists(
        spark, [0, 0, 1, 2], [1, 2, 3, 3], [500.0, 500.5, 499.0, 500.0], 4, 4
    )
    f_i, f_j, f_v = big.mxm(big, semiring="LOGADD_PLUS").to_lists()
    f = dict(zip(zip(f_i, f_j), f_v))
    s_i, s_j, s_v = big.mxm(big, semiring="LOGADD_STABLE_PLUS").to_lists()
    s = dict(zip(zip(s_i, s_j), s_v))
    want = 999.0 + math.log(math.exp(0.0) + math.exp(1.5))  # logaddexp(999, 1000.5)
    assert math.isinf(f[(0, 3)])                    # fast path overflows
    assert math.isclose(s[(0, 3)], want, rel_tol=1e-12)  # stable is exact
