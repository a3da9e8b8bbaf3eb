"""Vector: a sparse 1-D array as a DataFrame ``(id, val)``.

Facade mirroring the reference ``Vector`` (``pygraphblas/vector.py:37``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pygraphblas_spark import gbtypes
from pygraphblas_spark.algebra import (
    SELECT_OPS,
    SELECT_SYMBOLS,
    BinaryOp,
    Monoid,
    Semiring,
    UnaryOp,
    binary_op,
    monoid,
    semiring,
    unary_op,
)
from pygraphblas_spark.descriptor import Descriptor, NULL, resolve
from pygraphblas_spark.operators import contraction, core

VAL = core.VAL
KEYS = ["id"]


def _coerce_binop(op, typ: str = None):
    if typ is not None and isinstance(op, str):
        from pygraphblas_spark.algebra import typed_binary_op

        return typed_binary_op(op, typ)
    return binary_op(op) if isinstance(op, str) else op


def _widened_dfs(a: "Vector", b: "Vector", ptyp: str):
    """Cast both value columns to ``ptyp`` when it is complex (real →
    complex widening x → x+0i; struct columns don't unify implicitly)."""
    if not gbtypes.is_complex(ptyp):
        return a.df, b.df
    da = (
        a.df
        if a.typ == ptyp
        else a.df.withColumn(VAL, gbtypes.cast_expr(F.col(VAL), a.typ, ptyp))
    )
    db = (
        b.df
        if b.typ == ptyp
        else b.df.withColumn(VAL, gbtypes.cast_expr(F.col(VAL), b.typ, ptyp))
    )
    return da, db


def _coerce_monoid(m):
    return monoid(m) if isinstance(m, str) else m


class Vector:
    """Sparse vector over a DataFrame ``(id: long, val: T)``."""

    def __init__(self, df: DataFrame, size: int, typ: str = "FP64"):
        self.df = df
        self.size = int(size)
        self.typ = typ.upper()

    # -- construction (reference vector.py:251-481) --

    @classmethod
    def sparse(cls, spark: SparkSession, typ: str, size: int) -> "Vector":
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(VAL, gbtypes.spark_type(typ)),
            ]
        )
        return cls(spark.createDataFrame([], schema), size, typ)

    @classmethod
    def dense(cls, spark: SparkSession, typ: str, size: int, fill=None) -> "Vector":
        """Distributed fill via spark.range (reference vector.py:450)."""
        fill = gbtypes.default_zero(typ) if fill is None else fill
        df = spark.range(size).select(
            F.col("id"), F.lit(fill).cast(gbtypes.spark_type(typ)).alias(VAL)
        )
        return cls(df, size, typ)

    @classmethod
    def iso(cls, spark: SparkSession, value, size: int) -> "Vector":
        return cls.dense(spark, gbtypes.from_python_value(value), size, fill=value)

    @classmethod
    def from_lists(
        cls,
        spark: SparkSession,
        I: Sequence[int],
        V: Union[Sequence, bool, int, float] = True,
        size: Optional[int] = None,
        typ: Optional[str] = None,
    ) -> "Vector":
        """Last-write-wins on duplicate ids, like the reference's
        per-element construction loop (vector.py:331)."""
        if isinstance(V, (bool, int, float, complex)):
            V = [V] * len(I)
        typ = typ or gbtypes.from_python_value(V[0] if V else True)
        size = size if size is not None else (max(I) + 1 if I else 0)
        rows = [
            (int(i), gbtypes.to_storage(v, typ), p)
            for p, (i, v) in enumerate(zip(I, V))
        ]
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(VAL, gbtypes.spark_type(typ)),
                T.StructField("__pos", T.LongType()),
            ]
        )
        df = (
            spark.createDataFrame(rows, schema)
            .groupBy("id")
            .agg(F.max_by(VAL, "__pos").alias(VAL))
        )
        return cls(df, size, typ)

    @classmethod
    def from_list(cls, spark: SparkSession, values: Sequence) -> "Vector":
        """Dense vector from a Python list, id = position (reference
        ``Vector.from_list``, vector.py:359)."""
        return cls.from_lists(spark, list(range(len(values))), list(values))

    @classmethod
    def random(
        cls,
        spark: SparkSession,
        typ: str,
        nvals: int,
        size: int,
        seed: int = 42,
    ) -> "Vector":
        """Deterministic hash-based random vector (reference
        vector.py:289) — same distributed generator discipline as
        Matrix.random."""
        h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))
        df = spark.range(nvals).select(
            (h("i") % size).alias("id"),
            (
                (h("v") % 1000000).cast("double") / 1000000.0
                if typ.upper() in ("FP32", "FP64")
                else (h("v") % 100)
            )
            .cast(gbtypes.spark_type(typ))
            .alias(VAL),
        )
        df = df.groupBy("id").agg(F.first(VAL).alias(VAL))
        return cls(df, size, typ)

    @classmethod
    def from_1_to_n(cls, spark: SparkSession, n: int) -> "Vector":
        """[1..n] (reference vector.py:370)."""
        df = spark.range(n).select(F.col("id"), (F.col("id") + 1).alias(VAL))
        return cls(df, n, "INT64")

    # -- properties --

    @property
    def nvals(self) -> int:
        return self.df.count()

    @property
    def S(self) -> "Vector":
        return self.pattern()

    @property
    def type(self):
        """First-class type object (reference Vector.type) — an op
        namespace: ``v.apply(v.type.MINV)`` works as in the reference."""
        return gbtypes.GBType(self.typ)

    gb_type = type

    def __getattr__(self, name: str):
        """Type-operator attribute dispatch (reference vector.py analog of
        matrix.py:1607): ``v.PLUS_TIMES(A)`` → vxm, ``v.PLUS(w)`` → emult,
        ``v.MINV()`` → apply, ``v.PLUS_MONOID()`` → reduce."""
        typ = self.__dict__.get("typ")  # no recursion before __init__
        if name.startswith("_") or typ is None:
            raise AttributeError(name)
        from pygraphblas_spark import algebra

        try:
            op = getattr(gbtypes.GBType(typ), name.upper())
        except AttributeError:
            raise AttributeError(
                f"Vector has no attribute or type operator {name!r}"
            )
        # kwargs only for modifiers — positional extras would be ambiguous
        # against the bound op slot (see Matrix.__getattr__)
        if isinstance(op, algebra.Semiring):
            return lambda other, **kw: self.vxm(other, semiring=op, **kw)
        if isinstance(op, algebra.BinaryOp):
            return lambda other, **kw: self.emult(other, op, **kw)
        if isinstance(op, algebra.Monoid):
            return lambda: self.reduce(op)
        return lambda **kw: self.apply(op, **kw)

    @property
    def memory_usage(self) -> int:
        """Estimated bytes held (reference vector.py:542)."""
        try:
            return int(
                self.df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return self.nvals * 16

    def wait(self) -> "Vector":
        """Materialization barrier (reference vector.py:1591): persist and
        force the lazy plan so later ops reuse the computed result."""
        self.df = self.df.persist()
        self.df.count()
        return self

    # SuiteSparse storage knobs (reference vector.py:403-451) — advisory
    # round-trip only; physical layout is Tungsten-managed.
    @property
    def hyper_switch(self) -> float:
        return getattr(self, "_hyper_switch", 0.0625)

    @hyper_switch.setter
    def hyper_switch(self, v: float) -> None:
        self._hyper_switch = float(v)

    @property
    def sparsity(self) -> int:
        return getattr(self, "_sparsity", 15)

    @sparsity.setter
    def sparsity(self, v: int) -> None:
        self._sparsity = int(v)

    @property
    def sparsity_status(self) -> int:
        return 2  # "sparse"

    # Tuple-extraction family (reference vector.py:113-189): actions that
    # collect via Arrow — small-vector inspection API.
    @property
    def indices(self):
        """numpy array of present indexes (reference vector.py:113)."""
        return self.to_arrays()[0]

    @property
    def I(self):  # noqa: E743 — reference name
        return iter(self.indices)

    @property
    def npI(self):
        return self.indices

    @property
    def vals(self):
        """numpy array of stored values (reference vector.py:151)."""
        return self.to_arrays()[1]

    @property
    def V(self):
        return iter(self.vals)

    @property
    def npV(self):
        return self.vals

    def dup(self) -> "Vector":
        return Vector(self.df, self.size, self.typ)

    def clear(self) -> "Vector":
        return Vector(self.df.limit(0), self.size, self.typ)

    def resize(self, size: int) -> "Vector":
        df = self.df
        if size < self.size:
            df = df.filter(F.col("id") < size)
        return Vector(df, size, self.typ)

    def pattern(self, typ: str = "BOOL") -> "Vector":
        one = gbtypes.default_one(typ)
        return Vector(
            self.df.select("id", F.lit(one).cast(gbtypes.spark_type(typ)).alias(VAL)),
            self.size,
            typ,
        )

    def cast(self, typ: str) -> "Vector":
        return Vector(
            self.df.withColumn(VAL, F.col(VAL).cast(gbtypes.spark_type(typ))),
            self.size,
            typ,
        )

    # -- apply (reference vector.py:1262-1352) --

    def apply(self, op: Union[UnaryOp, str], **kw) -> "Vector":
        from pygraphblas_spark.algebra import typed_unary_op

        op = typed_unary_op(op, self.typ)
        new = self.df.select("id", op(F.col(VAL)).alias(VAL))
        res = self._finalized(new, kw.get("out"), kw.get("mask"), kw.get("accum"), kw.get("desc", NULL))
        out_typ = getattr(op, "out_typ", None)
        if out_typ is not None:
            res.typ = out_typ  # e.g. complex ABS/CREAL project to FP64
        return res

    def apply_first(self, scalar, op, **kw) -> "Vector":
        op = _coerce_binop(op)
        new = self.df.select("id", op(F.lit(scalar), F.col(VAL)).alias(VAL))
        return self._finalized(new, kw.get("out"), kw.get("mask"), kw.get("accum"), kw.get("desc", NULL))

    def apply_second(self, op, scalar, **kw) -> "Vector":
        op = _coerce_binop(op)
        new = self.df.select("id", op(F.col(VAL), F.lit(scalar)).alias(VAL))
        return self._finalized(new, kw.get("out"), kw.get("mask"), kw.get("accum"), kw.get("desc", NULL))

    def abs(self) -> "Vector":
        return self.apply("ABS")

    __abs__ = abs

    # -- element-wise (reference vector.py:604-832) --

    def eadd(
        self,
        other: "Vector",
        add_op: Union[BinaryOp, str] = "PLUS",
        out: Optional["Vector"] = None,
        mask: Optional["Vector"] = None,
        accum=None,
        desc: Descriptor = NULL,
    ) -> "Vector":
        ptyp = gbtypes.promote(self.typ, other.typ)
        a, b = _widened_dfs(self, other, ptyp)
        new = core.ewise_add(a, b, KEYS, _coerce_binop(add_op, ptyp))
        res = self._finalized(new, out, mask, accum, desc)
        res.typ = ptyp
        return res

    union = eadd

    def emult(
        self,
        other: "Vector",
        mult_op: Union[BinaryOp, str] = "TIMES",
        out: Optional["Vector"] = None,
        mask: Optional["Vector"] = None,
        accum=None,
        desc: Descriptor = NULL,
    ) -> "Vector":
        ptyp = gbtypes.promote(self.typ, other.typ)
        a, b = _widened_dfs(self, other, ptyp)
        new = core.ewise_mult(a, b, KEYS, _coerce_binop(mult_op, ptyp))
        res = self._finalized(new, out, mask, accum, desc)
        res.typ = ptyp
        return res

    intersection = emult

    # -- contraction (reference vector.py:835-977) --

    def vxm(
        self,
        matrix,
        semiring: Union[Semiring, str, None] = None,
        out: Optional["Vector"] = None,
        mask: Optional["Vector"] = None,
        accum=None,
        desc: Descriptor = NULL,
        broadcast_vector: bool = False,
    ) -> "Vector":
        """v ⊗.⊕ A (reference vector.py:835)."""
        desc = resolve(desc)
        if semiring is None:
            sr = self._default_semiring(matrix)
        elif isinstance(semiring, str):
            from pygraphblas_spark.algebra import semiring as _lookup

            sr = _lookup(semiring)
        else:
            sr = semiring
        from pygraphblas_spark.matrix import _promote_inputs

        v_df, m_df = _promote_inputs(self, matrix)
        new = contraction.vxm(
            v_df,
            m_df,
            sr,
            mask=mask.df if mask is not None else None,
            accum=_coerce_binop(accum) if accum else None,
            desc=desc,
            out=out.df if out is not None else None,
            broadcast_vector=broadcast_vector,
        )
        size = matrix.nrows if desc.transpose1 else matrix.ncols
        return Vector(new, size, gbtypes.promote(self.typ, matrix.typ))

    def __matmul__(self, matrix):
        return self.vxm(matrix)

    def _default_semiring(self, other):
        from pygraphblas_spark.algebra import current_semiring

        ctx = current_semiring.get()
        if ctx is not None:
            return ctx
        t = gbtypes.promote(self.typ, other.typ)
        return semiring("LOR_LAND" if t == "BOOL" else "PLUS_TIMES")

    # -- select (reference vector.py:1354-1428) --

    def select(self, op: str, thunk=None) -> "Vector":
        key = op.upper() if op.upper() in SELECT_OPS else SELECT_SYMBOLS.get(op)
        if op in ("min", "max"):
            aggv = self.df.agg(
                (F.min(VAL) if op == "min" else F.max(VAL)).alias("__m")
            )
            df = (
                self.df.join(F.broadcast(aggv))
                .filter(F.col(VAL) == F.col("__m"))
                .drop("__m")
            )
            return Vector(df, self.size, self.typ)
        if key is None:
            raise KeyError(f"unknown select op {op!r}")
        from pygraphblas_spark.scalar import Scalar

        if isinstance(thunk, Scalar):  # reference passes Scalar thunks
            thunk = thunk[0]
        pred = SELECT_OPS[key](
            F.col("id"), F.col("id"), F.col(VAL), F.lit(thunk if thunk is not None else 0)
        )
        return Vector(self.df.filter(pred), self.size, self.typ)

    def nonzero(self) -> "Vector":
        return Vector(self.df.filter(F.col(VAL) != 0), self.size, self.typ)

    # -- reduce (reference vector.py:1101-1260) --

    def reduce(self, mon: Union[Monoid, str] = "PLUS"):
        from pygraphblas_spark.algebra import typed_monoid

        mon = typed_monoid(mon, self.typ)
        row = self.df.agg(mon(F.col(VAL)).alias("__r")).first()
        return gbtypes.from_storage(row["__r"], self.typ)

    def reduce_bool(self) -> bool:
        return bool(self.reduce("LOR"))

    def reduce_int(self) -> int:
        r = self.reduce("PLUS")
        return int(r) if r is not None else 0

    def reduce_float(self) -> float:
        r = self.reduce("PLUS")
        return float(r) if r is not None else 0.0

    def max(self):
        return self.reduce("MAX")

    def min(self):
        return self.reduce("MIN")

    # -- extract / assign (reference vector.py:1430-1549) --

    def extract(self, sel) -> "Vector":
        if isinstance(sel, slice):
            from pygraphblas_spark.matrix import _slice_parts, _stride_filter_pos

            start, stop, step, count = _slice_parts(sel, self.size)
            keep, pos = _stride_filter_pos("id", start, stop, step)
            df = self.df.filter(keep).select(pos.alias("id"), F.col(VAL))
            return Vector(df, count, self.typ)
        idx = list(sel)
        spark = self.df.sparkSession
        map_df = F.broadcast(
            spark.createDataFrame(
                [(int(v), p) for p, v in enumerate(idx)], "id long, __pos long"
            )
        )
        df = (
            self.df.join(map_df, on="id", how="inner")
            .select(F.col("__pos").alias("id"), F.col(VAL))
        )
        return Vector(df, len(idx), self.typ)

    def extract_element(self, i: int):
        row = self.df.filter(F.col("id") == i).first()
        return None if row is None else row[VAL]

    def assign_scalar(
        self,
        value,
        sel=None,
        mask: Optional["Vector"] = None,
        accum=None,
        desc: Descriptor = NULL,
    ) -> "Vector":
        """v[:] = x — PageRank's teleport reset (reference vector.py:1494).
        Same write-rule handling as Matrix.assign_scalar: complemented /
        ranged masks enumerate the selection lazily, REPLACE clears
        out-of-mask cells, a scoped ``with Accum(...)`` is honored."""
        from pygraphblas_spark.algebra import current_accum
        from pygraphblas_spark.matrix import _slice_parts

        desc = resolve(desc)
        if accum is None:
            accum = current_accum.get()
        spark = self.df.sparkSession
        typ_col = F.lit(value).cast(gbtypes.spark_type(self.typ))
        if mask is not None and not desc.mask_complement and sel is None:
            target = core._truthy_mask(mask.df, desc.mask_structural).select(
                "id", typ_col.alias(VAL)
            )
        else:
            start, stop, step, _ = _slice_parts(
                sel if not isinstance(sel, int) else slice(sel, sel), self.size
            )
            target = spark.range(
                start, stop + (1 if step > 0 else -1), step
            ).select(F.col("id"), typ_col.alias(VAL))
            if mask is not None:
                target = core.apply_mask(
                    target, mask.df, KEYS, desc.mask_complement,
                    desc.mask_structural,
                )
        if accum is not None:
            merged = core.ewise_add(self.df, target, KEYS, _coerce_binop(accum))
        else:
            old_rest = self.df.join(target.select("id"), on="id", how="left_anti")
            merged = target.unionByName(old_rest)
        if desc.replace and mask is not None:
            merged = core.apply_mask(
                merged, mask.df, KEYS, desc.mask_complement, desc.mask_structural
            )
        return Vector(merged, self.size, self.typ)

    def assign(
        self,
        other: "Vector",
        accum=None,
        mask: Optional["Vector"] = None,
        desc: Descriptor = NULL,
    ) -> "Vector":
        """Vector upsert (reference vector.py:1454). With ``mask``, only
        positions where the mask is truthy receive ``other``'s values
        (GrB_assign no-replace semantics: unmasked and other-absent
        positions keep their old entries)."""
        src = other.df.select("id", F.col(VAL).cast(gbtypes.spark_type(self.typ)))
        if mask is not None:
            m = core._truthy_mask(mask.df, desc.mask_structural).select("id")
            src = src.join(m, "id", "left_semi")
        if accum is not None:
            merged = core.ewise_add(self.df, src, KEYS, _coerce_binop(accum))
        else:
            old_rest = self.df.join(src.select("id"), on="id", how="left_anti")
            merged = src.unionByName(old_rest)
        return Vector(merged, self.size, self.typ)

    def set_element(self, i: int, v) -> "Vector":
        spark = self.df.sparkSession
        one = spark.createDataFrame(
            [(int(i), v)],
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField(VAL, gbtypes.spark_type(self.typ)),
                ]
            ),
        )
        rest = self.df.filter(F.col("id") != i)
        return Vector(rest.unionByName(one), self.size, self.typ)

    def del_element(self, i: int) -> "Vector":
        return Vector(self.df.filter(F.col("id") != i), self.size, self.typ)

    def __getitem__(self, index):
        if isinstance(index, int):
            v = self.extract_element(index)
            if v is None:
                # reference v[i] raises on absence (base.py NoValue)
                from pygraphblas_spark.exceptions import NoValue

                raise NoValue(f"no element at {index}")
            return v
        return self.extract(index)

    def __setitem__(self, index, value) -> None:
        """Mutating assign sugar (reference vector.py:1430): v[i]=x,
        v[:]=x / v[a:b]=x (scalar fill), v[mask]=x, v[:]=Vector. The
        facade rebinds ``self.df`` (DataFrames are immutable)."""
        if isinstance(index, Vector):
            # masked assign: v[m] = scalar OR v[m] = Vector (reference
            # vector.py:1430 dispatches on the value type)
            out = (
                self.assign(value, mask=index)
                if isinstance(value, Vector)
                else self.assign_scalar(value, mask=index)
            )
        elif isinstance(index, int):
            if isinstance(value, Vector):
                raise TypeError(
                    "cannot assign a Vector to a single element; use "
                    "v[:] = u or v[mask] = u (reference vector.py raises here)"
                )
            out = self.set_element(index, value)
        elif isinstance(index, slice):
            if isinstance(value, Vector):
                out = self.assign(value)
            else:
                out = self.assign_scalar(
                    value, sel=None if index == slice(None) else index
                )
        else:
            raise TypeError(f"bad assign index {index!r}")
        self.df = out.df

    def __delitem__(self, index) -> None:
        """Single-element delete (reference vector.py:1532)."""
        if not isinstance(index, int):
            raise TypeError(f"bad delete index {index!r}")
        self.df = self.del_element(index).df

    # -- equality & sugar --

    def iseq(self, other: "Vector") -> bool:
        if self.size != other.size:
            return False
        return core.coo_equal(self.df, other.df, KEYS)

    def isne(self, other: "Vector") -> bool:
        return not self.iseq(other)

    def all(self, other: "Vector", op) -> bool:
        """Do all stored elements compare True with ``op``? (reference
        vector.py:188: size, nvals, pattern must match and every
        emult-compared value hold.)"""
        if self.size != other.size:
            return False
        if self.nvals != other.nvals:
            return False
        c = self.emult(other, op)
        if c.nvals != self.nvals:
            return False
        return c.df.filter(~F.col(VAL).cast("boolean")).limit(1).count() == 0

    def get(self, i: int, default=None):
        """Element or ``default`` when absent (reference vector.py get)."""
        v = self.extract_element(i)
        return default if v is None else v

    def __contains__(self, i) -> bool:
        return self.extract_element(int(i)) is not None

    def _full(self) -> "Vector":
        """Densify: absent cells become the type zero (reference
        vector.py:551-565 — assignScalar + eadd FIRST)."""
        spark = self.df.sparkSession
        dense = spark.range(self.size).select(
            "id",
            F.lit(gbtypes.default_zero(self.typ))
            .cast(gbtypes.spark_type(self.typ))
            .alias(VAL),
        )
        return self.eadd(Vector(dense, self.size, self.typ), "FIRST")

    def _compare(self, other, pyop, strop: str) -> "Vector":
        """Comparison semantics per reference ``Vector._compare``
        (vector.py:567-584): scalar compare keeps the stored pattern when
        ``pyop(other, 0)`` holds (values become booleans), else only the
        cells where the predicate is true; vector compare densifies both
        sides first."""
        ops = {"==": "EQ", "!=": "NE", ">": "GT", "<": "LT", ">=": "GE", "<=": "LE"}
        if isinstance(other, (bool, int, float)):
            if pyop(other, 0):
                op = _coerce_binop(ops[strop])
                df = self.df.select("id", op(F.col(VAL), F.lit(other)).alias(VAL))
                return Vector(df, self.size, "BOOL")
            return self.select(strop, other).pattern("BOOL")
        if isinstance(other, Vector):
            a, b = self._full(), other._full()
            res = a.emult(b, ops[strop])
            res.typ = "BOOL"
            return res
        raise TypeError("Unknown vector comparison type.")

    def __gt__(self, other):
        import operator

        return self._compare(other, operator.gt, ">")

    def __lt__(self, other):
        import operator

        return self._compare(other, operator.lt, "<")

    def __ge__(self, other):
        import operator

        return self._compare(other, operator.ge, ">=")

    def __le__(self, other):
        import operator

        return self._compare(other, operator.le, "<=")

    def __eq__(self, other):
        import operator

        if other is None:
            return False
        return self._compare(other, operator.eq, "==")

    def __ne__(self, other):
        import operator

        return self._compare(other, operator.ne, "!=")

    __hash__ = object.__hash__  # __eq__ is element-wise, not identity

    # operator sugar (reference vector.py operator table; default
    # combiner overridable via `with binary_op(...)` scope)
    def __add__(self, other):
        return self._scalar_or_ewise(other, "PLUS", "eadd")

    def __radd__(self, other):
        return self.apply_first(other, self._sugar_op("PLUS"))

    def __iadd__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "PLUS", "eadd"))

    def __sub__(self, other):
        return self._scalar_or_ewise(other, "MINUS", "eadd")

    def __rsub__(self, other):
        return self.apply_first(other, self._sugar_op("MINUS"))

    def __isub__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "MINUS", "eadd"))

    def __mul__(self, other):
        return self._scalar_or_ewise(other, "TIMES", "emult")

    def __rmul__(self, other):
        return self.apply_first(other, self._sugar_op("TIMES"))

    def __imul__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "TIMES", "emult"))

    def __truediv__(self, other):
        return self._scalar_or_ewise(other, "DIV", "emult")

    def __rtruediv__(self, other):
        return self.apply_first(other, self._sugar_op("DIV"))

    def __itruediv__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "DIV", "emult"))

    def __or__(self, other):
        return self.eadd(other, self._sugar_op("SECOND"))

    def __ior__(self, other):
        return self._inplace(self.eadd(other, self._sugar_op("SECOND")))

    def __and__(self, other):
        return self.emult(other, self._sugar_op("SECOND"))

    def __iand__(self, other):
        return self._inplace(self.emult(other, self._sugar_op("SECOND")))

    def __imatmul__(self, other):
        # v @= A (reference matrix.py:69: in-place vxm)
        return self._inplace(self.__matmul__(other))

    def __neg__(self):
        return self.apply("AINV")

    def __invert__(self):
        # Reference ~v applies MINV (vector.py:1051); BOOL gets logical not,
        # mirroring Matrix.__invert__.
        return self.apply("LNOT" if self.typ == "BOOL" else "MINV")

    @staticmethod
    def _sugar_op(default: str):
        from pygraphblas_spark.algebra import current_binop

        return current_binop.get() or default

    def _inplace(self, result: "Vector") -> "Vector":
        """In-place operator facade (see Matrix._inplace)."""
        self.df, self.typ = result.df, result.typ
        self.size = result.size
        return self

    def _scalar_or_ewise(self, other, opname, ewise):
        op = self._sugar_op(opname)
        if isinstance(other, Vector):
            return getattr(self, ewise)(other, op)
        return self.apply_second(op, other)

    # -- sinks --

    def to_lists(self) -> list[list]:
        rows = self.df.orderBy("id").collect()
        return [
            [r["id"] for r in rows],
            [gbtypes.from_storage(r[VAL], self.typ) for r in rows],
        ]

    def to_arrays(self):
        pdf = self.df.orderBy("id").toPandas()
        return pdf["id"].to_numpy(), pdf[VAL].to_numpy()

    def to_numpy(self):
        """Dense numpy with absent cells as the type zero."""
        import numpy as np

        i, v = self.to_arrays()
        dtype = "float64" if self.typ in ("FP32", "FP64") else "int64"
        out = np.zeros(self.size, dtype=dtype)
        if len(i):
            out[i] = v
        return out

    def to_dict(self) -> dict:
        return {r["id"]: r[VAL] for r in self.df.collect()}

    def __iter__(self):
        for r in self.df.toLocalIterator():
            yield (r["id"], r[VAL])

    def __len__(self):
        return self.nvals

    def to_string(self, empty: str = "") -> str:
        """Small-vector debug render (reference vector.py:1595)."""
        d = self.to_dict()
        return "\n".join(
            f"{i}| {d[i] if i in d else empty}" for i in range(self.size)
        )

    def __str__(self) -> str:
        return self.to_string()

    def print(self, level: int = 2, name: str = "v", f=None) -> None:
        """Diagnostic print (reference vector.py:1619)."""
        import sys

        f = f or sys.stdout
        print(f"{name} <{self.typ} size={self.size}>", file=f)
        if level > 1:
            print(self.to_string(), file=f)

    def __repr__(self):
        return f"<Vector {self.typ} size={self.size}>"

    def _finalized(self, new_df, out, mask, accum, desc) -> "Vector":
        desc = desc or NULL
        merged = core.finalize(
            out.df if out is not None else None,
            new_df,
            KEYS,
            mask.df if mask is not None else None,
            _coerce_binop(accum) if accum else None,
            desc,
        )
        return Vector(merged, self.size, self.typ)
