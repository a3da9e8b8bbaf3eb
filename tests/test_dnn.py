"""Sparse-DNN inference parity (reference demo/dnn/dnn.py:14-25):
the Y@W + PLUS_PLUS bias + ReLU-select + masked-clip loop, run through
the Matrix facade, against a dense numpy oracle."""

import importlib.util
import pathlib

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "dnn_demo", pathlib.Path(__file__).parent.parent / "examples" / "dnn_demo.py"
)
dnn_demo = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dnn_demo)


def test_dnn_matches_numpy(spark):
    Ws, Bs, Y0, W_np, B_np, y_np = dnn_demo.synthetic_network(
        spark, neurons=48, layers=3, batch=16
    )
    got = dnn_demo.dnn(Ws, Bs, Y0).to_numpy()
    want = dnn_demo.dnn_numpy(W_np, B_np, y_np)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-9)
    assert (want > 0).any()  # the network actually fires
    assert want.max() == 32.0  # the clip branch (Y[M]=32) engaged
    # a second shape: wider fan-in, fewer layers
    Ws2, Bs2, Y02, W_np2, B_np2, y_np2 = dnn_demo.synthetic_network(
        spark, neurons=32, layers=2, batch=8, fanin=16
    )
    want2 = dnn_demo.dnn_numpy(W_np2, B_np2, y_np2)
    got2 = dnn_demo.dnn(Ws2, Bs2, Y02).to_numpy()
    assert np.allclose(got2, want2, atol=1e-9)
