"""Graph-generator demos — reference demo/N-Cube-Graphs.ipynb and
demo/Sierpinski-Graph.ipynb, replayed through the engine's own surface
(dense + positional apply + user binary op + eadd + nonzero; kronecker +
apply_second + select + triu). The Sierpinski randomness is pinned to
deterministic values — the structure, not the RNG, is the demo."""

import math

from pyspark.sql import functions as F

from pygraphblas_spark.matrix import Matrix
from pygraphblas_spark.algebra import binary_op


def n_cube(spark, n: int) -> Matrix:
    """demo/N-Cube-Graphs.ipynb cell 3: adjacency of the n-dimensional
    hypercube — vertices i,j adjacent iff popcount(i^j) == 1."""
    one_bit_off = binary_op(
        "ONE_BIT_OFF",
        lambda i, j: F.when(F.bit_count(i.bitwiseXOR(j)) == 1, 1).otherwise(0),
    )
    size = 2**n
    A = Matrix.dense(spark, "INT64", size, size, fill=1)
    Ai = A.positioni()
    Aj = A.positionj()
    return Ai.eadd(Aj, one_bit_off).nonzero()


def test_n_cube_structure(spark):
    for n in (2, 3, 4):
        N = n_cube(spark, n)
        size = 2**n
        assert N.nrows == N.ncols == size
        # n·2^(n-1) undirected edges, stored in both orientations
        assert N.nvals == n * 2**n
        I, J, V = N.to_lists()
        assert all(v == 1 for v in V)
        assert all(bin(i ^ j).count("1") == 1 for i, j in zip(I, J))
        # symmetric
        assert sorted(zip(I, J)) == sorted(zip(J, I))


def _sierpinski_motif(spark):
    # demo/Sierpinski-Graph.ipynb cell 2's K motif (2×2, cells
    # (0,0),(0,1),(1,1)) with pinned deterministic values
    return Matrix.from_lists(
        spark, [0, 0, 1], [0, 1, 1], [0.5, 0.25, 0.75], 2, 2
    )


def test_sierpinski_kronpow(spark):
    """kronprod(K, 2) with a deterministic apply_second instead of the
    demo's random.uniform: same plan shape, values checkable by numpy."""
    import numpy as np

    K = _sierpinski_motif(spark)
    K2 = K.kronecker(K).apply_second("TIMES", 2.0)
    K4 = K2.kronecker(K2).apply_second("TIMES", 2.0)

    m = np.zeros((2, 2))
    for i, j, v in zip(*K.to_lists()):
        m[i, j] = v
    m2 = np.kron(m, m) * 2.0
    m4 = np.kron(m2, m2) * 2.0

    assert K4.nrows == K4.ncols == 16
    got = dict(zip(zip(*K4.to_lists()[:2]), K4.to_lists()[2]))
    nz = np.argwhere(m4 != 0)
    assert len(got) == len(nz)
    for i, j in nz:
        assert math.isclose(got[(i, j)], m4[i, j], rel_tol=1e-12)

    # demo cell 7: threshold-select + strict upper triangle
    thr = K4.reduce_float() / K4.nvals
    K5 = K4.select(">=", thr).triu(1)
    want = {
        (i, j): m4[i, j]
        for (i, j) in map(tuple, nz)
        if m4[i, j] >= thr and j >= i + 1
    }
    got5 = dict(zip(zip(*K5.to_lists()[:2]), K5.to_lists()[2]))
    assert got5.keys() == want.keys()
