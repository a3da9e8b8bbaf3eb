"""Operator kernels over COO DataFrames.

Everything here is a pure function ``DataFrame -> DataFrame`` building a
Catalyst logical plan; no actions, no collect. The ``Matrix``/``Vector``
facades call these.
"""

from pygraphblas_spark.operators.core import (
    apply_mask,
    ewise_add,
    ewise_mult,
    finalize,
)
from pygraphblas_spark.operators.contraction import mxm, mxv, vxm

__all__ = ["apply_mask", "ewise_add", "ewise_mult", "finalize", "mxm", "mxv", "vxm"]
