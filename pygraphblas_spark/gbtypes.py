"""Scalar type system: GraphBLAS types → Spark SQL types + promotion.

Mirrors the reference's 13 fixed-width types (``pygraphblas/types.py:179-337``)
and its promotion order (``types.py:468-500``): FP64 > FP32 > INT64 >
UINT64 > INT32 > UINT32 > INT16 > UINT16 > INT8 > UINT8 > BOOL, with BOOL
promoting to the other operand's type (``types.py:491-494``).

Spark has no unsigned ints: unsigned types widen to the next signed width
(UINT64 → LongType with a documented overflow caveat — vertex ids are
``GrB_Index`` = uint64 in the reference but never exceed 2^60, which fits
signed 64-bit). Complex types (FC32/FC64) are out of scope for the
link-graph target.
"""

from __future__ import annotations

from pyspark.sql import types as T

# name -> (Spark type, promotion rank, default zero, default one)
GB_TYPES: dict[str, tuple[T.DataType, int, object, object]] = {
    "BOOL": (T.BooleanType(), 0, False, True),
    "UINT8": (T.ShortType(), 1, 0, 1),
    "INT8": (T.ByteType(), 2, 0, 1),
    "UINT16": (T.IntegerType(), 3, 0, 1),
    "INT16": (T.ShortType(), 4, 0, 1),
    "UINT32": (T.LongType(), 5, 0, 1),
    "INT32": (T.IntegerType(), 6, 0, 1),
    "UINT64": (T.LongType(), 7, 0, 1),
    "INT64": (T.LongType(), 8, 0, 1),
    "FP32": (T.FloatType(), 9, 0.0, 1.0),
    "FP64": (T.DoubleType(), 10, 0.0, 1.0),
}


def spark_type(name: str) -> T.DataType:
    return GB_TYPES[name.upper()][0]


def promote(a: str, b: str) -> str:
    """Result type of a binary op over mixed types (types.py:484-500).

    BOOL promotes to the other type; otherwise the higher promotion rank
    wins (the reference's fixed order).
    """
    a, b = a.upper(), b.upper()
    if a == b:
        return a
    if a == "BOOL":
        return b
    if b == "BOOL":
        return a
    return a if GB_TYPES[a][1] >= GB_TYPES[b][1] else b


def default_zero(name: str):
    return GB_TYPES[name.upper()][2]


def default_one(name: str):
    return GB_TYPES[name.upper()][3]


def from_python_value(v) -> str:
    """Infer a GraphBLAS type from a Python value (types.py:348-357)."""
    if isinstance(v, bool):
        return "BOOL"
    if isinstance(v, int):
        return "INT64"
    if isinstance(v, float):
        return "FP64"
    raise TypeError(f"cannot infer GraphBLAS type for {type(v)}")
