"""Scalar type system: GraphBLAS types → Spark SQL types + promotion.

Mirrors the reference's 13 fixed-width types (``pygraphblas/types.py:179-337``)
and its promotion order (``types.py:468-500``): FP64 > FP32 > INT64 >
UINT64 > INT32 > UINT32 > INT16 > UINT16 > INT8 > UINT8 > BOOL, with BOOL
promoting to the other operand's type (``types.py:491-494``).

Spark has no unsigned ints: unsigned types widen to the next signed width
(UINT64 → LongType with a documented overflow caveat — vertex ids are
``GrB_Index`` = uint64 in the reference but never exceed 2^60, which fits
signed 64-bit). Complex types (FC32/FC64, reference types.py:326-345)
have no Spark scalar either: they are stored as ``struct<re, im>`` value
columns with a dedicated op family (algebra ``*_FC`` ops) — still pure
JVM column expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
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
    "FC32": (
        T.StructType(
            [T.StructField("re", T.FloatType()), T.StructField("im", T.FloatType())]
        ),
        11,
        complex(0),
        complex(1),
    ),
    "FC64": (
        T.StructType(
            [T.StructField("re", T.DoubleType()), T.StructField("im", T.DoubleType())]
        ),
        12,
        complex(0),
        complex(1),
    ),
}


def is_complex(name: str) -> bool:
    return name.upper() in ("FC32", "FC64")


def _fc_field(name: str) -> str:
    return "float" if name.upper() == "FC32" else "double"


def to_storage(v, name: str):
    """Python value → row value for createDataFrame (complex → (re, im))."""
    if is_complex(name):
        v = complex(v)
        return (float(v.real), float(v.imag))
    return v


def from_storage(v, name: str):
    """Row value → Python value for to_lists/collect (struct → complex)."""
    if is_complex(name) and v is not None:
        return complex(v["re"], v["im"])
    return v


def lit_expr(v, name: str) -> Column:
    """Literal column of a gb type — complex builds the struct directly
    (``F.lit(complex)`` has no Spark literal form)."""
    if is_complex(name):
        v = complex(v)
        ft = _fc_field(name)
        return F.struct(
            F.lit(float(v.real)).cast(ft).alias("re"),
            F.lit(float(v.imag)).cast(ft).alias("im"),
        )
    return F.lit(v).cast(spark_type(name))


def cast_expr(col: Column, from_typ: str, to_typ: str) -> Column:
    """Cast a value column between gb types, including the real → complex
    widening (x → x + 0i) that plain ``Column.cast`` cannot express."""
    if is_complex(to_typ):
        ft = _fc_field(to_typ)
        if is_complex(from_typ):
            return F.struct(
                col.getField("re").cast(ft).alias("re"),
                col.getField("im").cast(ft).alias("im"),
            )
        return F.struct(
            col.cast(ft).alias("re"), F.lit(0.0).cast(ft).alias("im")
        )
    if is_complex(from_typ):
        raise TypeError(f"cannot cast complex {from_typ} to real {to_typ}")
    return col.cast(spark_type(to_typ))


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
    if is_complex(a) != is_complex(b):
        # real × complex promotes to complex, keeping the wider width —
        # FP64 × FC32 must not narrow the real part to float32
        real = a if not is_complex(a) else b
        fc = b if is_complex(b) else a
        if fc == "FC32" and real in ("FP64", "INT64", "UINT64", "INT32", "UINT32"):
            return "FC64"
        return fc
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
    if isinstance(v, complex):
        return "FC64"
    raise TypeError(f"cannot infer GraphBLAS type for {type(v)}")
