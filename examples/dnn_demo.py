#!/usr/bin/env python
"""Sparse-DNN inference — parity demo for the reference's GraphChallenge
kernel (reference demo/dnn/dnn.py:14-25).

The reference loop, per layer::

    Y = Y @ w                      # PLUS_TIMES feature propagation
    with FP32.PLUS_PLUS:
        Y.mxm(b, out=Y)            # diagonal bias add as a semiring mxm
    Y.select('>0', out=Y)          # ReLU on the sparse pattern
    M = Y.select('>', 32)
    if len(M):
        Y[M] = 32                  # masked scalar clip

Everything it needs already exists on this repo's facade (mxm with a
named semiring, predicate select, masked scalar assign), so ``dnn``
below is the same formula verbatim — DataFrame-backed, so each layer is
a shuffle-pruned join-aggregate the optimizer plans, and ReLU/clip are
pushed-down filters rather than data movement.

Run standalone (synthetic deterministic network, numpy-verified):

    python examples/dnn_demo.py [--neurons 64] [--layers 4] [--batch 32]

The same synthetic generator backs tests/test_dnn.py's numpy oracle.
"""

from __future__ import annotations

import argparse

import numpy as np


def dnn(W, B, Y):
    """Reference demo/dnn/dnn.py:14-25 ``dnn`` — identical formula."""
    for w, b in zip(W, B):
        Y = Y @ w
        Y = Y.mxm(b, semiring="PLUS_PLUS")
        Y = Y.select(">0")
        M = Y.select(">", 32)
        if M.nvals:
            Y[M] = 32
    return Y


def synthetic_network(spark, neurons=64, layers=4, batch=32, fanin=8):
    """Deterministic GraphChallenge-shaped network: each layer's weight
    matrix has ``fanin`` entries per output neuron at arithmetically-
    derived positions, a diagonal bias matrix, and a sparse input batch.
    Returns (W: [Matrix], B: [Matrix], Y0: Matrix) plus the equivalent
    dense numpy arrays for oracle checks. ``spark=None`` skips the
    Matrix side (numpy-only, for oracle inspection)."""
    Matrix = None
    if spark is not None:
        from pygraphblas_spark.matrix import Matrix

    Ws, Bs = [], []
    W_np, B_np = [], []
    for layer in range(layers):
        ii, jj, vv = [], [], []
        for j in range(neurons):
            for f in range(fanin):
                i = (j * 37 + f * 17 + layer * 7) % neurons
                # positive-skewed sign mix: ReLU still drops cells while
                # activations grow enough to engage the clip-at-32 branch
                v = (((i * 13 + j * 29 + layer) % 101) - 30) / 50.0
                ii.append(i)
                jj.append(j)
                vv.append(v)
        if Matrix is not None:
            Ws.append(
                Matrix.from_lists(spark, ii, jj, vv, neurons, neurons, "FP64")
            )
        wm = np.zeros((neurons, neurons))
        # from_lists dedups by LAST write per (i, j) — mirror that
        for i, j, v in zip(ii, jj, vv):
            wm[i, j] = v
        W_np.append(wm)
        bias = [
            -(((j * 11 + layer * 3) % 7)) / 10.0 for j in range(neurons)
        ]
        if Matrix is not None:
            Bs.append(
                Matrix.from_lists(
                    spark,
                    list(range(neurons)),
                    list(range(neurons)),
                    bias,
                    neurons,
                    neurons,
                    "FP64",
                )
            )
        bm = np.zeros(neurons)
        bm[:] = bias
        B_np.append(bm)
    yi, yj, yv = [], [], []
    for r in range(batch):
        for f in range(fanin):
            j = (r * 31 + f * 11) % neurons
            yi.append(r)
            yj.append(j)
            yv.append(((r * 7 + j) % 40) / 10.0 + 0.1)
    Y0 = (
        Matrix.from_lists(spark, yi, yj, yv, batch, neurons, "FP64")
        if Matrix is not None
        else None
    )
    y_np = np.zeros((batch, neurons))
    for i, j, v in zip(yi, yj, yv):
        y_np[i, j] = v
    return Ws, Bs, Y0, W_np, B_np, y_np


def dnn_numpy(W_np, B_np, y_np):
    """Dense oracle for the sparse kernel: the semiring formula keeps
    the bias add and ReLU on the SPARSE pattern (a zero cell gets no
    bias and stays absent), so the oracle masks accordingly."""
    Y = y_np.copy()
    for wm, bm in zip(W_np, B_np):
        Y = Y @ wm
        present = Y != 0.0  # sparse pattern after the PLUS_TIMES mxm
        Y = np.where(present, Y + bm[None, :], 0.0)
        Y = np.where(Y > 0, Y, 0.0)  # ReLU drops non-positives
        Y = np.minimum(Y, 32.0)  # masked clip
    return Y


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--neurons", type=int, default=64)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from pygraphblas_spark.session import get_spark

    spark = get_spark("dnn-demo", cores="8")
    Ws, Bs, Y0, W_np, B_np, y_np = synthetic_network(
        spark, args.neurons, args.layers, args.batch
    )
    Y = dnn(Ws, Bs, Y0)
    got = Y.to_numpy()
    want = dnn_numpy(W_np, B_np, y_np)
    ok = np.allclose(got, want, atol=1e-9)
    print(
        f"layers={args.layers} neurons={args.neurons} batch={args.batch} "
        f"nvals={Y.nvals} numpy-match={ok}"
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
