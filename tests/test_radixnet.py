"""RadiX-Net topology generator — reference demo/dnn/radix.py, replayed
through the engine surface (cyclic permutation matrix, ``P ** k`` matmul
powers, eadd sums, kronecker with a dense layer spec), checked against a
numpy twin."""

import numpy as np

from pygraphblas_spark.matrix import Matrix


def permutation_matrix(spark, size: int) -> Matrix:
    """demo/dnn/radix.py:7 — the size-cycle shift matrix."""
    I = [size - 1] + list(range(size - 1))
    J = [0] + list(range(1, size))
    return Matrix.from_lists(spark, I, J, [1.0] * size, size, size)


def mixed_topo_radix(spark, topos):
    """demo/dnn/radix.py:15 — one sparse layer per radix digit:
    layer = Σ_{j<n} P^(j · place_value)."""
    sizes = [int(np.prod(t)) for t in topos]
    assert all(s == sizes[0] for s in sizes)
    size = sizes[0]
    P = permutation_matrix(spark, size)
    layers = []
    for t in topos:
        place_value = 1
        for n in t:
            layer = P ** 0
            for j in range(1, n):
                layer = layer + P ** (j * place_value)
            place_value *= n
            layers.append(layer)
    return layers


def _np_mixed_topo_radix(topos):
    size = int(np.prod(topos[0]))
    P = np.zeros((size, size))
    P[size - 1, 0] = 1.0
    for i in range(size - 1):
        P[i, i + 1] = 1.0
    layers = []
    for t in topos:
        place_value = 1
        for n in t:
            layer = sum(np.linalg.matrix_power(P, j * place_value) for j in range(n))
            place_value *= n
            layers.append(layer)
    return layers


def _to_np(m: Matrix, size: int):
    a = np.zeros((size, size))
    for i, j, v in zip(*m.to_lists()):
        a[i, j] = v
    return a


def test_mixed_topo_radix_matches_numpy(spark):
    topos = [[2, 2], [4]]
    got = mixed_topo_radix(spark, topos)
    want = _np_mixed_topo_radix(topos)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert np.array_equal(_to_np(g, 4), w)


def test_radixnet_kron_layers(spark):
    """demo/dnn/radix.py:37 — kron of each radix layer with the dense
    inter-layer weight block gives the sparse DNN topology."""
    topos = [[2, 2]]
    spec = [2, 2, 2]
    radix_layers = mixed_topo_radix(spark, topos)
    want_layers = _np_mixed_topo_radix(topos)
    for rl, wl, (rows, cols) in zip(
        radix_layers, want_layers, zip(spec, spec[1:])
    ):
        d = Matrix.dense(spark, "FP64", rows, cols, fill=1.0)
        k = rl.kronecker(d, "TIMES")
        want = np.kron(wl, np.ones((rows, cols)))
        assert k.nrows == 4 * rows and k.ncols == 4 * cols
        assert np.array_equal(_to_np(k, 4 * rows), want)
