"""pygraphblas_spark — a from-scratch PySpark-native link-graph analytics
engine with the computational capabilities of Graphegon/pygraphblas.

The reference (``/root/reference``) wraps SuiteSparse:GraphBLAS — a sparse
semiring linear-algebra engine — behind ``Matrix``/``Vector`` objects whose
every operator takes ``(mask, accum, desc)`` modifiers. This package
re-expresses the same capability surface on Spark DataFrames:

- a ``Matrix`` is a COO edge DataFrame ``(src: long, dst: long, val: T)``
  plus shape metadata (reference: ``pygraphblas/matrix.py:54``);
- a ``Vector`` is ``(id: long, val: T)`` (reference: ``pygraphblas/vector.py:37``);
- semiring contraction (``mxm``/``mxv``/``vxm``) is a join + group-agg with
  mask pushdown (reference: ``pygraphblas/matrix.py:2401-2737``);
- element-wise ``eadd``/``emult`` are full-outer / inner joins
  (reference: ``pygraphblas/matrix.py:1103-1415``);
- apply / select / reduce / extract / assign map to projection / filter /
  aggregation / slicing-joins.

Everything is declared with the DataFrame API so Catalyst/AQE choose the
physical plan; Arrow-vectorized kernels are used only where DataFrame ops
cannot express the semantics (custom monoids, CSR SpMV fast path).
"""

from pygraphblas_spark.session import get_spark, options_get, options_set
from pygraphblas_spark.algebra import (
    Accum,
    BinaryOp,
    Monoid,
    Semiring,
    UnaryOp,
    binary_op,
    monoid,
    select_op,
    semiring,
    unary_op,
)
from pygraphblas_spark.matrix import Matrix
from pygraphblas_spark.vector import Vector
from pygraphblas_spark.scalar import Scalar
from pygraphblas_spark import descriptor
from pygraphblas_spark.descriptor import Descriptor, T0, T1, C, S, R, RC, RS, RSC, T0T1
from pygraphblas_spark.gbtypes import (
    BOOL,
    FC32,
    FC64,
    FP32,
    FP64,
    GxB_INDEX_MAX,
    INT8,
    INT16,
    INT32,
    INT64,
    UINT8,
    UINT16,
    UINT32,
    UINT64,
    GBType,
)
from pygraphblas_spark import gbtypes as types  # reference `pygraphblas.types`
from pygraphblas_spark.exceptions import GraphBLASException, NoValue

# Engine identification, mirroring the reference's GxB version tuples
# (reference __init__.py GxB_IMPLEMENTATION / GxB_SPEC): ours identifies
# the Spark-native implementation against the GraphBLAS 2.0 spec surface.
GxB_IMPLEMENTATION = (0, 1, 0)
GxB_SPEC = (2, 0, 0)

__all__ = [
    "get_spark",
    "options_set",
    "options_get",
    "Accum",
    "Matrix",
    "Vector",
    "Scalar",
    "UnaryOp",
    "BinaryOp",
    "Monoid",
    "Semiring",
    "unary_op",
    "binary_op",
    "monoid",
    "semiring",
    "select_op",
    "descriptor",
    "types",
    "Descriptor",
    "T0",
    "T1",
    "C",
    "S",
    "R",
    "RC",
    "RS",
    "RSC",
    "T0T1",
    "GBType",
    "BOOL",
    "INT8",
    "UINT8",
    "INT16",
    "UINT16",
    "INT32",
    "UINT32",
    "INT64",
    "UINT64",
    "FP32",
    "FP64",
    "FC32",
    "FC64",
    "GraphBLASException",
    "NoValue",
    "GxB_INDEX_MAX",
    "GxB_IMPLEMENTATION",
    "GxB_SPEC",
]

__version__ = "0.1.0"
