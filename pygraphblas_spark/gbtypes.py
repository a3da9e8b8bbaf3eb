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


# --------------------------------------------------------------------------
# First-class type objects  (reference types.py:135-345: Type classes with
# op attributes bound per type — FP64.PLUS_TIMES, FP64.PLUS_MONOID,
# FP64.ABS — usable anywhere the engine accepts an op or a type name).
#
# GBType subclasses str so the whole string-keyed engine accepts the
# objects transparently: Matrix.sparse(spark, FP64, ...) == "FP64".
# Op attributes resolve lazily against the algebra registries through the
# typed_* dispatchers, which also route complex types to the *_FC family.
# --------------------------------------------------------------------------


class GBType(str):
    """A GraphBLAS scalar type usable as a type name *and* an op namespace.

    >>> FP64.PLUS_TIMES      # typed Semiring (reference FP64.PLUS_TIMES)
    >>> FP64.PLUS_MONOID     # typed Monoid
    >>> FP64.PLUS            # typed BinaryOp (context manager: default combiner)
    >>> FP64.ABS             # typed UnaryOp
    """

    __slots__ = ()

    @property
    def spark_type(self):
        return spark_type(self)

    @property
    def default_zero(self):
        return default_zero(self)

    @property
    def default_one(self):
        return default_one(self)

    def __repr__(self) -> str:
        return f"<GBType {str.__str__(self)}>"

    def __getattr__(self, name: str):
        # Only ALL-CAPS op names resolve; everything else (dunders, pickle
        # protocol probes) falls through to a normal AttributeError.
        if name.startswith("_") or not name.isupper():
            raise AttributeError(name)
        from pygraphblas_spark import algebra

        if name.endswith("_MONOID"):
            try:
                return algebra.typed_monoid(name[: -len("_MONOID")], self)
            except (KeyError, NotImplementedError):
                raise AttributeError(f"{self} has no monoid {name!r}")
        for resolver in (algebra.typed_binary_op, algebra.typed_unary_op):
            try:
                return resolver(name, self)
            except (KeyError, NotImplementedError):
                pass
        if "_" in name:
            try:
                return algebra.typed_semiring(name, self)
            except (KeyError, NotImplementedError):
                pass
        raise AttributeError(f"{self} has no op {name!r}")


BOOL = GBType("BOOL")
INT8 = GBType("INT8")
UINT8 = GBType("UINT8")
INT16 = GBType("INT16")
UINT16 = GBType("UINT16")
INT32 = GBType("INT32")
UINT32 = GBType("UINT32")
INT64 = GBType("INT64")
UINT64 = GBType("UINT64")
FP32 = GBType("FP32")
FP64 = GBType("FP64")
FC32 = GBType("FC32")
FC64 = GBType("FC64")

ALL_TYPES = (
    BOOL, INT8, UINT8, INT16, UINT16, INT32, UINT32,
    INT64, UINT64, FP32, FP64, FC32, FC64,
)

# GrB_Index is uint64 but SuiteSparse caps indices at 2^60
# (reference __init__.py GxB_INDEX_MAX); we keep the same cap so row/col
# ids always fit Spark's signed LongType.
GxB_INDEX_MAX = 1 << 60
