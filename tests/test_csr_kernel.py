"""CSR-kernel SpMV path: equality with the join path and the oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.algorithms import pagerank
from pygraphblas_spark.kernels.csr import pagerank_csr, spmv_csr
from tests.oracles import pagerank_oracle

PR_I = [1, 2, 3, 4, 5, 3, 4, 4, 5, 6, 6, 7, 7, 8, 8, 9, 10]
PR_J = [2, 1, 1, 1, 1, 0, 3, 5, 4, 1, 4, 1, 4, 1, 4, 4, 4]


def edges_df(spark, I, J, vals=None):
    if vals is None:
        vals = [1.0] * len(I)
    return spark.createDataFrame(
        list(zip(map(int, I), map(int, J), map(float, vals))),
        "src long, dst long, val double",
    )


def test_spmv_csr_matches_join(spark):
    e = edges_df(spark, PR_I, PR_J)
    v = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(11)], "id long, val double"
    )
    got = {r["id"]: r["val"] for r in spmv_csr(e, v, num_blocks=4).collect()}
    # join-path PLUS_SECOND: y[dst] = Σ v[src]
    want = {
        r["dst"]: r["s"]
        for r in e.join(v, e["src"] == v["id"])
        .groupBy("dst")
        .agg(F.sum(v["val"]).alias("s"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_spmv_csr_times(spark):
    e = edges_df(spark, [0, 1], [1, 0], [2.0, 3.0])
    v = spark.createDataFrame([(0, 10.0), (1, 20.0)], "id long, val double")
    got = {r["id"]: r["val"] for r in spmv_csr(e, v, mul="times").collect()}
    assert got == {1: 20.0, 0: 60.0}


def test_pagerank_csr_matches_oracle_and_join(spark):
    e = edges_df(spark, PR_I, PR_J)
    got_csr = {
        r["id"]: r["rank"]
        for r in pagerank_csr(e, n=11, tol=1e-8, num_blocks=4).collect()
    }
    want = pagerank_oracle(PR_I, PR_J, 11, tol=1e-8)
    arr = np.array([got_csr[i] for i in range(11)])
    assert np.allclose(arr, want, atol=1e-6)
    got_join = {
        r["id"]: r["rank"] for r in pagerank(e, n=11, tol=1e-8).collect()
    }
    for i in range(11):
        assert got_csr[i] == pytest.approx(got_join[i], abs=1e-9)
