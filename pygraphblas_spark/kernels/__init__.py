"""Arrow-vectorized kernels — the Python fast path.

Used only where DataFrame built-ins can't express the computation shape:
the per-partition CSR SpMV gather-scatter (the reference's Python⇄C array
boundary, SURVEY.md §1.3, becomes our Spark⇄numpy Arrow boundary)."""

from pygraphblas_spark.kernels.csr import spmv_csr
from pygraphblas_spark.kernels.csr_dense import (
    DENSE_KERNEL_MAX_ROWS,
    cc_dense_kernel,
    lpa_dense_kernel,
    pagerank_dense_kernel,
)

__all__ = [
    "spmv_csr",
    "pagerank_dense_kernel",
    "cc_dense_kernel",
    "lpa_dense_kernel",
    "DENSE_KERNEL_MAX_ROWS",
]
