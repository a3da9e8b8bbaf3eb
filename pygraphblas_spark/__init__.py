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

from pygraphblas_spark.session import get_spark
from pygraphblas_spark.algebra import (
    Accum,
    BinaryOp,
    Monoid,
    Semiring,
    UnaryOp,
    binary_op,
    monoid,
    semiring,
    unary_op,
)
from pygraphblas_spark.matrix import Matrix
from pygraphblas_spark.vector import Vector
from pygraphblas_spark.scalar import Scalar
from pygraphblas_spark.descriptor import Descriptor, T0, T1, C, S, R, RC, RS, RSC, T0T1

__all__ = [
    "get_spark",
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
]

__version__ = "0.1.0"
