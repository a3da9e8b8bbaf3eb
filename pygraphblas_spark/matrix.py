"""Matrix: a sparse 2-D array as a COO DataFrame ``(src, dst, val)``.

Facade mirroring the reference ``Matrix`` class (``pygraphblas/matrix.py:54``)
— same method names and semantics, Spark-native execution. Immutable: every
operation returns a new ``Matrix`` wrapping a new logical plan; ``out=`` /
``accum=`` / ``mask=`` / ``desc=`` are honored by merging per the GraphBLAS
write rule (see ``operators/core.finalize``).

Sparsity semantics: absent rows are absent cells (interpreted as the
semiring identity, never stored) — reference ``README.md:146-170``.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
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
)
from pygraphblas_spark.descriptor import Descriptor, NULL, resolve
from pygraphblas_spark.operators import contraction, core

VAL = core.VAL
EDGE_SCHEMA_KEYS = ["src", "dst"]


def _coerce_binop(op, typ: str = None) -> BinaryOp:
    if typ is not None and isinstance(op, str):
        from pygraphblas_spark.algebra import typed_binary_op

        return typed_binary_op(op, typ)
    return binary_op(op) if isinstance(op, str) else op


def _widened_pair(a: "Matrix", b: "Matrix"):
    """(a.df, b.df) with value columns cast to the promoted type when it
    is complex — the real → complex widening (x → x+0i) that Spark's
    implicit coalesce unification cannot do on struct columns. Real
    promotions keep relying on Spark's implicit numeric unification."""
    ptyp = gbtypes.promote(a.typ, b.typ)
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


def _coerce_monoid(m) -> Monoid:
    return monoid(m) if isinstance(m, str) else m


def _coerce_semiring(s) -> Semiring:
    return semiring(s) if isinstance(s, str) else s


def _promote_inputs(a, b):
    """Mixed-type contraction inputs are cast to the promoted type before
    the join (reference types.promote, types.py:484-500) — e.g. a BOOL
    pattern matrix times an FP64 vector multiplies as FP64."""
    ptyp = gbtypes.promote(a.typ, b.typ)
    a_df = (
        a.df
        if a.typ == ptyp
        else a.df.withColumn(VAL, gbtypes.cast_expr(F.col(VAL), a.typ, ptyp))
    )
    b_df = (
        b.df
        if b.typ == ptyp
        else b.df.withColumn(VAL, gbtypes.cast_expr(F.col(VAL), b.typ, ptyp))
    )
    return a_df, b_df


class Matrix:
    """Sparse matrix over an edge DataFrame with shape metadata.

    ``df`` columns: ``src: long, dst: long, val: <typ>``.
    """

    def __init__(self, df: DataFrame, nrows: int, ncols: int, typ: str = "FP64"):
        self.df = df
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.typ = typ.upper()

    # ------------------------------------------------------------------
    # Construction (reference matrix.py:120-651)
    # ------------------------------------------------------------------

    @classmethod
    def sparse(
        cls, spark: SparkSession, typ: str, nrows: int, ncols: int
    ) -> "Matrix":
        """Empty matrix (reference ``Matrix.sparse`` matrix.py:120)."""
        schema = T.StructType(
            [
                T.StructField("src", T.LongType()),
                T.StructField("dst", T.LongType()),
                T.StructField(VAL, gbtypes.spark_type(typ)),
            ]
        )
        return cls(spark.createDataFrame([], schema), nrows, ncols, typ)

    @classmethod
    def dense(
        cls, spark: SparkSession, typ: str, nrows: int, ncols: int, fill=None
    ) -> "Matrix":
        """All-cells-present matrix (reference matrix.py:183): range × range
        cross join — no driver-side materialization."""
        fill = gbtypes.default_zero(typ) if fill is None else fill
        df = (
            spark.range(nrows)
            .select(F.col("id").alias("src"))
            .crossJoin(spark.range(ncols).select(F.col("id").alias("dst")))
            .select("src", "dst", gbtypes.lit_expr(fill, typ).alias(VAL))
        )
        return cls(df, nrows, ncols, typ)

    @classmethod
    def iso(cls, spark: SparkSession, value, nrows: int, ncols: int) -> "Matrix":
        """Constant-valued dense matrix (reference matrix.py:234); the
        constant folds into a ``lit`` column — Spark's analog of iso
        storage is free."""
        typ = gbtypes.from_python_value(value)
        return cls.dense(spark, typ, nrows, ncols, fill=value)

    @classmethod
    def from_lists(
        cls,
        spark: SparkSession,
        I: Sequence[int],
        J: Sequence[int],
        V: Union[Sequence, bool, int, float] = True,
        nrows: Optional[int] = None,
        ncols: Optional[int] = None,
        typ: Optional[str] = None,
    ) -> "Matrix":
        """Build from index/value lists (reference matrix.py:269).

        Duplicate (i, j) keeps the LAST value — the reference sets elements
        in a loop (matrix.py:329-331), so later writes win; we replicate
        with a positional last-write dedup.
        """
        if isinstance(V, (bool, int, float, complex)):
            V = [V] * len(I)
        typ = typ or gbtypes.from_python_value(V[0] if V else True)
        nrows = nrows if nrows is not None else (max(I) + 1 if I else 0)
        ncols = ncols if ncols is not None else (max(J) + 1 if J else 0)
        rows = [
            (int(i), int(j), gbtypes.to_storage(v, typ), pos)
            for pos, (i, j, v) in enumerate(zip(I, J, V))
        ]
        schema = T.StructType(
            [
                T.StructField("src", T.LongType()),
                T.StructField("dst", T.LongType()),
                T.StructField(VAL, gbtypes.spark_type(typ)),
                T.StructField("__pos", T.LongType()),
            ]
        )
        df = (
            spark.createDataFrame(rows, schema)
            .groupBy("src", "dst")
            .agg(F.max_by(VAL, "__pos").alias(VAL))
        )
        return cls(df, nrows, ncols, typ)

    @classmethod
    def from_edge_df(
        cls, df: DataFrame, nrows: int, ncols: int, typ: str = "FP64"
    ) -> "Matrix":
        """Wrap an existing edge DataFrame (our native ingestion path —
        e.g. from sources.codegraph edge extraction)."""
        return cls(df.select("src", "dst", VAL), nrows, ncols, typ)

    @classmethod
    def from_diag(cls, v: "Vector", k: int = 0) -> "Matrix":
        """Diagonal matrix from a vector (reference matrix.py:334)."""
        df = v.df.select(
            F.col("id").alias("src"), (F.col("id") + k).alias("dst"), F.col(VAL)
        )
        n = v.size + abs(k)
        return cls(df, n, n, v.typ)

    @classmethod
    def identity(
        cls, spark: SparkSession, typ: str, nrows: int, value=None
    ) -> "Matrix":
        """I_n (reference matrix.py:574)."""
        value = gbtypes.default_one(typ) if value is None else value
        df = spark.range(nrows).select(
            F.col("id").alias("src"),
            F.col("id").alias("dst"),
            F.lit(value).cast(gbtypes.spark_type(typ)).alias(VAL),
        )
        return cls(df, nrows, nrows, typ)

    @classmethod
    def random(
        cls,
        spark: SparkSession,
        typ: str,
        nvals: int,
        nrows: int,
        ncols: int,
        seed: int = 42,
        make_symmetric: bool = False,
        no_diagonal: bool = False,
    ) -> "Matrix":
        """Deterministic pseudo-random matrix (reference matrix.py:500).

        Hash-based generation from ``spark.range`` — fully distributed,
        reproducible for any cluster size (no RNG state per partition).
        """
        h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))
        df = spark.range(nvals).select(
            (h("src") % nrows).alias("src"),
            (h("dst") % ncols).alias("dst"),
            (
                (h("val") % 1000000).cast("double") / 1000000.0
                if typ in ("FP32", "FP64")
                else (h("val") % 100)
            )
            .cast(gbtypes.spark_type(typ))
            .alias(VAL),
        )
        if no_diagonal:
            df = df.filter(F.col("src") != F.col("dst"))
        df = df.groupBy("src", "dst").agg(F.first(VAL).alias(VAL))
        if make_symmetric:
            rev = df.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), VAL
            )
            df = (
                df.unionByName(rev)
                .groupBy("src", "dst")
                .agg(F.first(VAL).alias(VAL))
            )
        return cls(df, nrows, ncols, typ)

    @classmethod
    def from_csv(
        cls,
        spark: SparkSession,
        path: str,
        typ: str = "FP64",
        nrows: Optional[int] = None,
        ncols: Optional[int] = None,
        sep: str = ",",
        header: bool = False,
    ) -> "Matrix":
        """Edge-list CSV/TSV reader (reference from_tsv/from_csv
        matrix.py:412-489). Shape inferred with one pass if not given."""
        df = (
            spark.read.option("sep", sep)
            .option("header", str(header).lower())
            .option("comment", "%")
            .csv(path)
        )
        c = df.columns
        df = df.select(
            F.col(c[0]).cast("long").alias("src"),
            F.col(c[1]).cast("long").alias("dst"),
            (
                F.col(c[2]).cast(gbtypes.spark_type(typ))
                if len(c) > 2
                else F.lit(gbtypes.default_one(typ)).cast(gbtypes.spark_type(typ))
            ).alias(VAL),
        )
        if nrows is None or ncols is None:
            mx = df.agg(F.max("src"), F.max("dst")).first()
            nrows = nrows or (mx[0] or -1) + 1
            ncols = ncols or (mx[1] or -1) + 1
        return cls(df, nrows, ncols, typ)

    @classmethod
    def from_mm(cls, spark: SparkSession, path: str, typ: str = "FP64") -> "Matrix":
        """Matrix Market reader (reference matrix.py:378): skip %-comments,
        first data line is the header triple, indices are 1-based."""
        raw = spark.read.text(path).filter(~F.col("value").startswith("%"))
        first = raw.limit(1).collect()[0][0].split()
        nrows, ncols = int(first[0]), int(first[1])
        parts = F.split(F.trim(F.col("value")), r"\s+")
        df = (
            raw.withColumn("__rn", F.monotonically_increasing_id())
            .filter(F.col("__rn") > 0)
            .select(
                (parts.getItem(0).cast("long") - 1).alias("src"),
                (parts.getItem(1).cast("long") - 1).alias("dst"),
                F.coalesce(
                    parts.getItem(2).cast(gbtypes.spark_type(typ)),
                    F.lit(gbtypes.default_one(typ)).cast(gbtypes.spark_type(typ)),
                ).alias(VAL),
            )
        )
        return cls(df, nrows, ncols, typ)

    @classmethod
    def ssget(
        cls,
        spark: SparkSession,
        name_or_id,
        collection_dir: str | None = None,
        binary_cache_dir: str | None = None,
        typ: str = "FP64",
    ):
        """SuiteSparse Matrix Collection loader (reference matrix.py:596-623).

        The reference resolves ``name_or_id`` through ssgetpy and
        downloads from sparse.tamu.edu; this engine never touches the
        network — point ``collection_dir`` (or ``$SSGET_DIR``) at a
        pre-populated local tree of extracted matrices, either ssgetpy's
        layout ``<dir>/<Group>/<Name>/<Name>.mtx``, ``<dir>/<Name>/*.mtx``,
        or flat ``<dir>/<Name>.mtx``. Like the reference, yields
        ``(filename, Matrix)`` for every ``.mtx`` found, and
        ``binary_cache_dir`` mirrors the reference's ``.grb`` fast path
        with a parquet dump + dims sidecar (binread/binwrite).
        """
        import glob as _glob
        import json

        base = collection_dir or os.environ.get("SSGET_DIR")
        if base is None:
            raise FileNotFoundError(
                "ssget: no local SuiteSparse collection configured. This "
                "engine does not download (reference ssget fetches from "
                "sparse.tamu.edu); pass collection_dir= or set $SSGET_DIR "
                "to a directory of extracted .mtx matrices."
            )
        name = str(name_or_id)
        hits: list[str] = []
        for pat in (
            os.path.join(base, name, "*.mtx"),  # Group/Name or Name dir
            os.path.join(base, "*", name, "*.mtx"),  # bare Name under groups
            os.path.join(base, f"{name}.mtx"),  # flat file
        ):
            hits.extend(_glob.glob(pat))
        if not hits:
            raise FileNotFoundError(
                f"ssget: {name_or_id!r} not found under {base} (searched "
                "Group/Name/*.mtx, */Name/*.mtx, Name.mtx; numeric ids "
                "must exist as a directory name — there is no downloaded "
                "index to translate them)"
            )
        for m in sorted(set(hits)):
            fname = os.path.basename(m)
            cache = (
                os.path.join(binary_cache_dir, fname + ".parquet")
                if binary_cache_dir
                else None
            )
            meta = cache + ".meta.json" if cache else None
            if cache and os.path.exists(meta):
                with open(meta) as fh:
                    d = json.load(fh)
                M = cls.binread(spark, cache, d["nrows"], d["ncols"], d["typ"])
            else:
                M = cls.from_mm(spark, m, typ=typ)
                if cache:
                    M.binwrite(cache)
                    with open(meta, "w") as fh:
                        json.dump(
                            {"nrows": M.nrows, "ncols": M.ncols, "typ": M.typ}, fh
                        )
            yield fname, M

    # -- checkpoints (reference binread/binwrite matrix.py:490,935: the
    # SuiteSparse binary dump; ours is parquet, which is also the
    # iteration checkpoint format) --

    def binwrite(self, path: str) -> None:
        self.df.write.mode("overwrite").parquet(path)

    @classmethod
    def binread(
        cls, spark: SparkSession, path: str, nrows: int, ncols: int, typ="FP64"
    ) -> "Matrix":
        return cls(spark.read.parquet(path), nrows, ncols, typ)

    @classmethod
    def from_tsv(
        cls,
        spark: SparkSession,
        path: str,
        typ: str = "FP64",
        nrows: Optional[int] = None,
        ncols: Optional[int] = None,
        **kw,
    ) -> "Matrix":
        """Tab-separated edge list (reference from_tsv matrix.py:412)."""
        return cls.from_csv(spark, path, typ, nrows, ncols, sep="\t", **kw)

    # Reference binfile names (matrix.py:490 from_binfile / :935 to_binfile);
    # the serialized form here is parquet, the engine's binary checkpoint.
    to_binfile = binwrite
    from_binfile = binread

    # ------------------------------------------------------------------
    # Shape / cardinality properties (reference matrix.py:652-776)
    # ------------------------------------------------------------------

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def nvals(self) -> int:
        """Stored-entry count — an action (reference matrix.py:670)."""
        return self.df.count()

    @property
    def square(self) -> bool:
        return self.nrows == self.ncols

    @property
    def T(self) -> "Matrix":
        return self.transpose()

    @property
    def S(self) -> "Matrix":
        """Structural pattern, type-BOOL one (reference .S matrix.py:733)."""
        return self.pattern()

    @property
    def M(self) -> "Matrix":
        """Structural "mask" pattern, alias of `S` (reference matrix.py:733)."""
        return self.pattern()

    @property
    def type(self):
        """The first-class type object (reference Matrix.type): an op
        namespace, so reference idioms like ``A.apply(A.type.MINV)`` and
        ``A.mxm(B, A.type.PLUS_TIMES)`` work unchanged."""
        return gbtypes.GBType(self.typ)

    gb_type = type

    def __getattr__(self, name: str):
        """Type-operator attribute dispatch (reference matrix.py:1607):
        ``A.PLUS_TIMES(B)`` / ``A.plus_times(B)`` is semiring matmul,
        ``A.PLUS(B)`` element-wise emult, ``A.MINV()`` apply,
        ``A.PLUS_MONOID()`` reduce — the op resolved against A's type."""
        typ = self.__dict__.get("typ")  # no recursion before __init__
        if name.startswith("_") or typ is None:
            raise AttributeError(name)
        from pygraphblas_spark import algebra

        try:
            op = getattr(gbtypes.GBType(typ), name.upper())
        except AttributeError:
            raise AttributeError(
                f"Matrix has no attribute or type operator {name!r}"
            )
        if isinstance(op, algebra.Semiring):
            # kwargs only for the modifiers (out/mask/accum/desc):
            # positional extras would be ambiguous against the bound
            # semiring slot, so reject them loudly
            def contract(other, **kw):
                from pygraphblas_spark.vector import Vector

                if isinstance(other, Vector):
                    return self.mxv(other, semiring=op, **kw)
                return self.mxm(other, semiring=op, **kw)

            return contract
        if isinstance(op, algebra.BinaryOp):
            return lambda other, **kw: self.emult(other, op, **kw)
        if isinstance(op, algebra.Monoid):
            return lambda: self.reduce(op)  # extras raise TypeError loudly
        return lambda **kw: self.apply(op, **kw)

    @property
    def memory_usage(self) -> int:
        """Estimated bytes held by this matrix (reference matrix.py:706
        GxB_Matrix_memoryUsage). Uses Catalyst plan statistics — exact for
        persisted/scanned data, a size estimate for derived plans."""
        try:
            return int(
                self.df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return self.nvals * 24  # (long, long, 8-byte value) per entry

    def wait(self) -> "Matrix":
        """Materialization barrier (reference matrix.py:3348 GrB_Matrix_wait):
        SuiteSparse flushes pending tuples; the Spark analog is persisting
        and forcing the lazy plan so later ops reuse the computed result
        instead of re-running lineage."""
        self.df = self.df.persist()
        self.df.count()
        return self

    # SuiteSparse storage-layout knobs (reference matrix.py:777-890).
    # Tungsten manages physical layout, so these are recorded advisory
    # values that round-trip for API compatibility and change nothing.
    @property
    def hyper_switch(self) -> float:
        return getattr(self, "_hyper_switch", 0.0625)

    @hyper_switch.setter
    def hyper_switch(self, v: float) -> None:
        self._hyper_switch = float(v)

    @property
    def format(self) -> int:
        return getattr(self, "_format", 0)  # GxB_BY_ROW

    @format.setter
    def format(self, v: int) -> None:
        self._format = int(v)

    @property
    def sparsity(self) -> int:
        return getattr(self, "_sparsity", 15)  # GxB_AUTO_SPARSITY

    @sparsity.setter
    def sparsity(self, v: int) -> None:
        self._sparsity = int(v)

    @property
    def sparsity_status(self) -> int:
        return 2  # "sparse" — COO rows in a DataFrame

    def dup(self) -> "Matrix":
        """Copy (reference matrix.py:754) — DataFrames are immutable, so
        this is a metadata copy."""
        return Matrix(self.df, self.nrows, self.ncols, self.typ)

    def clear(self) -> "Matrix":
        return Matrix(self.df.limit(0), self.nrows, self.ncols, self.typ)

    def resize(self, nrows: int, ncols: int) -> "Matrix":
        """Grow/shrink; out-of-range entries dropped (reference matrix.py:978)."""
        df = self.df
        if nrows < self.nrows or ncols < self.ncols:
            df = df.filter((F.col("src") < nrows) & (F.col("dst") < ncols))
        return Matrix(df, nrows, ncols, self.typ)

    # ------------------------------------------------------------------
    # Projections: transpose / pattern / cast / apply (reference §2.4)
    # ------------------------------------------------------------------

    def transpose(self, desc: Descriptor = NULL) -> "Matrix":
        """Column swap — zero-cost relabel (reference matrix.py:1003)."""
        desc = resolve(desc)
        if desc.transpose0:
            # transposing the transpose: identity (reference cast trick)
            return self.dup()
        df = self.df.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col(VAL)
        )
        return Matrix(df, self.ncols, self.nrows, self.typ)

    def pattern(self, typ: str = "BOOL") -> "Matrix":
        """Structure with type-one values (reference matrix.py:887)."""
        one = gbtypes.default_one(typ)
        df = self.df.select(
            "src", "dst", F.lit(one).cast(gbtypes.spark_type(typ)).alias(VAL)
        )
        return Matrix(df, self.nrows, self.ncols, typ)

    def cast(self, typ: str) -> "Matrix":
        """Type conversion (reference matrix.py:1063)."""
        df = self.df.withColumn(VAL, F.col(VAL).cast(gbtypes.spark_type(typ)))
        return Matrix(df, self.nrows, self.ncols, typ)

    def apply(
        self,
        op: Union[UnaryOp, str],
        out: Optional["Matrix"] = None,
        mask: Optional["Matrix"] = None,
        accum: Optional[BinaryOp] = None,
        desc: Descriptor = NULL,
    ) -> "Matrix":
        """Unary op on every stored value (reference matrix.py:1934) —
        pure projection, no shuffle."""
        from pygraphblas_spark.algebra import typed_unary_op

        op = typed_unary_op(op, self.typ)
        if op.positional:
            val = op(F.col(VAL), F.col("src"), F.col("dst"))
        else:
            val = op(F.col(VAL))
        new = self.df.select("src", "dst", val.alias(VAL))
        res = self._finalized(new, out, mask, accum, desc)
        out_typ = getattr(op, "out_typ", None)
        if out_typ is not None:
            res.typ = out_typ  # e.g. complex ABS/CREAL project to FP64
        return res

    def apply_first(self, scalar, op: Union[BinaryOp, str], **kw) -> "Matrix":
        """Binary op with scalar bound on the left (reference matrix.py:1965)."""
        op = _coerce_binop(op, self.typ)
        lit = (
            gbtypes.lit_expr(scalar, self.typ)
            if gbtypes.is_complex(self.typ)
            else F.lit(scalar)
        )
        new = self.df.select("src", "dst", op(lit, F.col(VAL)).alias(VAL))
        return self._finalized(new, kw.get("out"), kw.get("mask"), kw.get("accum"), kw.get("desc", NULL))

    def apply_second(self, op: Union[BinaryOp, str], scalar, **kw) -> "Matrix":
        """Binary op with scalar bound on the right (reference matrix.py:2007)."""
        op = _coerce_binop(op, self.typ)
        lit = (
            gbtypes.lit_expr(scalar, self.typ)
            if gbtypes.is_complex(self.typ)
            else F.lit(scalar)
        )
        new = self.df.select("src", "dst", op(F.col(VAL), lit).alias(VAL))
        return self._finalized(new, kw.get("out"), kw.get("mask"), kw.get("accum"), kw.get("desc", NULL))

    # ------------------------------------------------------------------
    # Element-wise (reference §2.3)
    # ------------------------------------------------------------------

    def eadd(
        self,
        other: "Matrix",
        add_op: Union[BinaryOp, str] = "PLUS",
        out: Optional["Matrix"] = None,
        mask: Optional["Matrix"] = None,
        accum: Optional[BinaryOp] = None,
        desc: Descriptor = NULL,
    ) -> "Matrix":
        """Set-union element-wise op (reference matrix.py:1103)."""
        desc = resolve(desc)
        ptyp = gbtypes.promote(self.typ, other.typ)
        a, b = _widened_pair(self, other)
        if desc.transpose0:
            a = contraction._oriented(a, True)
        if desc.transpose1:
            b = contraction._oriented(b, True)
        new = core.ewise_add(
            a, b, EDGE_SCHEMA_KEYS, _coerce_binop(add_op, ptyp)
        )
        res = self._finalized(new, out, mask, accum, desc)
        res.typ = ptyp
        return res

    union = eadd  # reference alias matrix.py:1264

    def emult(
        self,
        other: "Matrix",
        mult_op: Union[BinaryOp, str] = "TIMES",
        out: Optional["Matrix"] = None,
        mask: Optional["Matrix"] = None,
        accum: Optional[BinaryOp] = None,
        desc: Descriptor = NULL,
    ) -> "Matrix":
        """Set-intersection element-wise op (reference matrix.py:1266)."""
        desc = resolve(desc)
        ptyp = gbtypes.promote(self.typ, other.typ)
        a, b = _widened_pair(self, other)
        if desc.transpose0:
            a = contraction._oriented(a, True)
        if desc.transpose1:
            b = contraction._oriented(b, True)
        new = core.ewise_mult(
            a, b, EDGE_SCHEMA_KEYS, _coerce_binop(mult_op, ptyp)
        )
        res = self._finalized(new, out, mask, accum, desc)
        res.typ = ptyp
        return res

    intersection = emult  # reference alias matrix.py:1415

    # ------------------------------------------------------------------
    # Contraction (reference §2.2)
    # ------------------------------------------------------------------

    def mxm(
        self,
        other: "Matrix",
        semiring: Union[Semiring, str, None] = None,
        cast: Optional[str] = None,
        out: Optional["Matrix"] = None,
        mask: Optional["Matrix"] = None,
        accum: Optional[BinaryOp] = None,
        desc: Descriptor = NULL,
    ) -> "Matrix":
        """Semiring matrix multiply (reference matrix.py:2401)."""
        desc = resolve(desc)
        sr = self._default_semiring(other, semiring)
        a_df, b_df = _promote_inputs(self, other)
        new = contraction.mxm(
            a_df,
            b_df,
            sr,
            mask=mask.df if mask is not None else None,
            accum=_coerce_binop(accum) if accum else None,
            desc=desc,
            out=out.df if out is not None else None,
        )
        nrows = self.ncols if desc.transpose0 else self.nrows
        ncols = other.nrows if desc.transpose1 else other.ncols
        typ = cast or gbtypes.promote(self.typ, other.typ)
        return Matrix(new, nrows, ncols, typ)

    def mxv(
        self,
        vector: "Vector",
        semiring: Union[Semiring, str, None] = None,
        out: Optional["Vector"] = None,
        mask: Optional["Vector"] = None,
        accum: Optional[BinaryOp] = None,
        desc: Descriptor = NULL,
        broadcast_vector: bool = False,
    ) -> "Vector":
        """SpMV (reference matrix.py:2586); PageRank's inner step."""
        from pygraphblas_spark.vector import Vector

        desc = resolve(desc)
        sr = self._default_semiring(vector, semiring)
        a_df, v_df = _promote_inputs(self, vector)
        new = contraction.mxv(
            a_df,
            v_df,
            sr,
            mask=mask.df if mask is not None else None,
            accum=_coerce_binop(accum) if accum else None,
            desc=desc,
            out=out.df if out is not None else None,
            broadcast_vector=broadcast_vector,
        )
        size = self.ncols if desc.transpose0 else self.nrows
        return Vector(new, size, gbtypes.promote(self.typ, vector.typ))

    def __matmul__(self, other):
        from pygraphblas_spark.vector import Vector

        if isinstance(other, Vector):
            return self.mxv(other)
        return self.mxm(other)

    def kronecker(
        self,
        other: "Matrix",
        op: Union[BinaryOp, str] = "TIMES",
        out: Optional["Matrix"] = None,
        mask: Optional["Matrix"] = None,
        accum=None,
        desc: Descriptor = NULL,
    ) -> "Matrix":
        """Kronecker product with the standard modifiers
        (reference matrix.py:2739 ``kronecker(op, mask, accum, desc)``)."""
        desc = resolve(desc)
        left = self.transpose() if desc.transpose0 else self
        right = other.transpose() if desc.transpose1 else other
        op = _coerce_binop(op)
        a = left.df.select(
            F.col("src").alias("__ai"), F.col("dst").alias("__aj"), F.col(VAL).alias("__a")
        )
        b = right.df.select(
            F.col("src").alias("__bi"), F.col("dst").alias("__bj"), F.col(VAL).alias("__b")
        )
        df = a.crossJoin(b).select(
            (F.col("__ai") * right.nrows + F.col("__bi")).alias("src"),
            (F.col("__aj") * right.ncols + F.col("__bj")).alias("dst"),
            op(F.col("__a"), F.col("__b")).alias(VAL),
        )
        new = core.finalize(
            out.df if out is not None else None,
            df,
            EDGE_SCHEMA_KEYS,
            mask.df if mask is not None else None,
            _coerce_binop(accum) if accum else None,
            desc,
        )
        return Matrix(
            new,
            left.nrows * right.nrows,
            left.ncols * right.ncols,
            gbtypes.promote(self.typ, other.typ),
        )

    def kronpow(self, exponent: int) -> "Matrix":
        """Repeated self-Kronecker — deterministic scale-free (RMAT-like)
        graph generator (reference matrix.py:1732, Sierpinski demo)."""
        if exponent == 0:
            return Matrix.identity(self.df.sparkSession, self.typ, self.nrows)
        m = self
        for _ in range(exponent - 1):
            m = m.kronecker(self, "TIMES")
        return m

    def __pow__(self, exponent: int) -> "Matrix":
        """Repeated mxm (reference matrix.py:1722)."""
        if exponent == 0:
            return Matrix.identity(self.df.sparkSession, self.typ, self.nrows)
        m = self
        for _ in range(exponent - 1):
            m = m.mxm(self)
        return m

    # ------------------------------------------------------------------
    # Selection (reference §2.5)
    # ------------------------------------------------------------------

    def select(self, op: str, thunk=None) -> "Matrix":
        """Predicate select (reference matrix.py:2042). ``op`` is a
        registered SelectOp name, an operator symbol ('>', '!=0', ...),
        or 'min'/'max' (keep only cells equal to the global extremum —
        reference matrix.py:2112-2118)."""
        key = op.upper() if op.upper() in SELECT_OPS else SELECT_SYMBOLS.get(op)
        if op in ("min", "max"):
            aggv = self.df.agg(
                (F.min(VAL) if op == "min" else F.max(VAL)).alias("__m")
            )
            df = self.df.join(F.broadcast(aggv)).filter(
                F.col(VAL) == F.col("__m")
            ).drop("__m")
            return Matrix(df, self.nrows, self.ncols, self.typ)
        if key is None:
            raise KeyError(f"unknown select op {op!r}")
        from pygraphblas_spark.scalar import Scalar

        if isinstance(thunk, Scalar):  # reference passes Scalar thunks
            thunk = thunk[0]
        pred = SELECT_OPS[key](
            F.col("src"), F.col("dst"), F.col(VAL), F.lit(thunk if thunk is not None else 0)
        )
        return Matrix(self.df.filter(pred), self.nrows, self.ncols, self.typ)

    def tril(self, offset: int = 0) -> "Matrix":
        """Lower triangle (reference matrix.py:2142) — the triangle-count
        workhorse; pure index predicate, pushed to the scan."""
        return Matrix(
            self.df.filter(F.col("dst") <= F.col("src") + offset),
            self.nrows,
            self.ncols,
            self.typ,
        )

    def triu(self, offset: int = 0) -> "Matrix":
        return Matrix(
            self.df.filter(F.col("dst") >= F.col("src") + offset),
            self.nrows,
            self.ncols,
            self.typ,
        )

    def diag(self, offset: int = 0) -> "Matrix":
        return Matrix(
            self.df.filter(F.col("dst") == F.col("src") + offset),
            self.nrows,
            self.ncols,
            self.typ,
        )

    def offdiag(self, offset: int = 0) -> "Matrix":
        return Matrix(
            self.df.filter(F.col("dst") != F.col("src") + offset),
            self.nrows,
            self.ncols,
            self.typ,
        )

    def nonzero(self) -> "Matrix":
        return Matrix(
            self.df.filter(F.col(VAL) != 0), self.nrows, self.ncols, self.typ
        )

    def vector_diag(self, k: int = 0):
        """k-diagonal as a Vector (reference matrix.py:2232)."""
        from pygraphblas_spark.vector import Vector

        df = self.df.filter(F.col("dst") == F.col("src") + k).select(
            F.col("src").alias("id"), F.col(VAL)
        )
        return Vector(df, min(self.nrows, self.ncols), self.typ)

    # ------------------------------------------------------------------
    # Reductions (reference §2.6)
    # ------------------------------------------------------------------

    def reduce(self, mon: Union[Monoid, str] = "PLUS"):
        """Full reduce to a Python scalar — an action (reference
        matrix.py:1828). Spark gives partial (map-side) + final agg."""
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

    def reduce_vector(
        self,
        mon: Union[Monoid, str] = "PLUS",
        out=None,
        mask=None,
        accum=None,
        desc: Descriptor = NULL,
    ):
        """Row-wise reduce to a Vector (reference matrix.py:1861); with
        desc=T0 reduces column-wise. Computes out-degree/in-degree vectors
        for PageRank (gap/prmark.py:54)."""
        from pygraphblas_spark.vector import Vector

        desc = resolve(desc)
        mon = _coerce_monoid(mon)
        key = "dst" if desc.transpose0 else "src"
        new = self.df.groupBy(F.col(key).alias("id")).agg(mon(F.col(VAL)).alias(VAL))
        merged = core.finalize(
            out.df if out is not None else None,
            new,
            ["id"],
            mask.df if mask is not None else None,
            _coerce_binop(accum) if accum else None,
            desc,
        )
        size = self.ncols if desc.transpose0 else self.nrows
        return Vector(merged, size, self.typ)

    def out_degree(self):
        """Row degree vector (reference matrix.py:3548, PLUS_PAIR trick →
        here a simple count agg)."""
        from pygraphblas_spark.vector import Vector

        df = self.df.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias(VAL)
        )
        return Vector(df, self.nrows, "INT64")

    def _ranked_degrees(self, num_buckets: int = 32):
        """Degree table with a DISTRIBUTED dense global rank ``i`` (1..n,
        ascending degree): range-partition into ``num_buckets`` ordered
        buckets, row_number within each bucket, offset by the exclusive
        prefix-sum of bucket counts (a window over only ``num_buckets``
        rows — same pattern as sources/codegraph.py build_vertices). No
        single-partition pass over the degree table; ties get an
        arbitrary but contiguous rank block, so Σ i·d is invariant.

        Returns (ranked_df, persisted_df): caller must unpersist the
        second (the range boundaries are sampled, so the bucketed frame
        is persisted to keep rank and counts consistent)."""
        from pyspark.sql import Window

        deg = self.df.groupBy("src").agg(
            F.count(F.lit(1)).cast("double").alias("d")
        )
        part = (
            deg.repartitionByRange(num_buckets, "d")
            .withColumn("part", F.spark_partition_id())
            .persist()
        )
        wp = Window.partitionBy("part").orderBy("d")
        counts = part.groupBy("part").agg(F.count(F.lit(1)).alias("cnt"))
        prefix = Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.select(
            "part", F.coalesce(F.sum("cnt").over(prefix), F.lit(0)).alias("off")
        )
        ranked = (
            part.withColumn("rn", F.row_number().over(wp))
            .join(F.broadcast(offsets), "part")
            .select("d", (F.col("off") + F.col("rn")).alias("i"))
        )
        return ranked, part

    def gini(self, num_buckets: int = 32) -> float:
        """Degree-distribution Gini coefficient (reference matrix.py:3560).
        Distributed rank (no global-window single-task sort — see
        ``_ranked_degrees``); only one scalar aggregate hits the driver."""
        ranked, part = self._ranked_degrees(num_buckets)
        try:
            n, s, si = ranked.agg(
                F.count("d"), F.sum("d"), F.sum(F.col("i") * F.col("d"))
            ).first()
        finally:
            part.unpersist()
        return float((2.0 * si) / (n * s) - (n + 1.0) / n)

    # ------------------------------------------------------------------
    # Extract / assign (reference §2.7)
    # ------------------------------------------------------------------

    def extract_matrix(
        self,
        rows: Union[slice, Sequence[int], int, None] = None,
        cols: Union[slice, Sequence[int], int, None] = None,
    ) -> "Matrix":
        """Submatrix by ranges/lists with index remap (reference
        matrix.py:2807). Slice bounds become scan-pushable predicates;
        explicit lists become a broadcast position-map join."""
        df = self.df
        spark = df.sparkSession

        def one_dim(df, colname, sel, dim):
            if sel is None or (isinstance(sel, slice) and sel == slice(None)):
                return df, dim, F.col(colname)
            if isinstance(sel, slice):
                start, stop, step, count = _slice_parts(sel, dim)
                keep, pos = _stride_filter_pos(colname, start, stop, step)
                return df.filter(keep), count, pos
            # explicit index list: remap to positions
            idx = list(sel)
            map_df = F.broadcast(
                spark.createDataFrame(
                    [(int(v), p) for p, v in enumerate(idx)],
                    f"{colname} long, __pos_{colname} long",
                )
            )
            df = df.join(map_df, on=colname, how="inner")
            return df, len(idx), F.col(f"__pos_{colname}")

        df, nr, src_expr = one_dim(df, "src", rows, self.nrows)
        df, nc, dst_expr = one_dim(df, "dst", cols, self.ncols)
        df = df.select(src_expr.alias("src"), dst_expr.alias("dst"), F.col(VAL))
        return Matrix(df, nr, nc, self.typ)

    def extract_row(self, i: int):
        """Row i as a Vector (reference matrix.py:2943)."""
        from pygraphblas_spark.vector import Vector

        df = self.df.filter(F.col("src") == i).select(
            F.col("dst").alias("id"), F.col(VAL)
        )
        return Vector(df, self.ncols, self.typ)

    def extract_col(self, j: int):
        from pygraphblas_spark.vector import Vector

        df = self.df.filter(F.col("dst") == j).select(
            F.col("src").alias("id"), F.col(VAL)
        )
        return Vector(df, self.nrows, self.typ)

    def extract_element(self, i: int, j: int):
        row = self.df.filter((F.col("src") == i) & (F.col("dst") == j)).first()
        return None if row is None else row[VAL]

    def __getitem__(self, index):
        """Index dispatch (reference matrix.py:2967): A[i] row, A[i,j]
        element, A[i,:] / A[:,j] / A[m:n,p:q] slices, A[list,list]."""
        if isinstance(index, int):
            return self.extract_row(index)
        if isinstance(index, slice):
            return self.extract_matrix(index, None)
        if isinstance(index, tuple) and len(index) == 2:
            i, j = index
            if isinstance(i, int) and isinstance(j, int):
                v = self.extract_element(i, j)
                if v is None:
                    # reference A[i, j] raises on absence (base.py NoValue);
                    # extract_element keeps the None-returning contract
                    from pygraphblas_spark.exceptions import NoValue

                    raise NoValue(f"no element at ({i}, {j})")
                return v
            if isinstance(i, int):
                return self.extract_row(i) if j == slice(None) else self.extract_matrix([i], j)
            if isinstance(j, int):
                return self.extract_col(j) if i == slice(None) else self.extract_matrix(i, [j])
            return self.extract_matrix(i, j)
        raise TypeError(f"bad index {index!r}")

    def assign_scalar(
        self,
        value,
        rows=None,
        cols=None,
        mask: Optional["Matrix"] = None,
        accum=None,
        desc: Descriptor = NULL,
    ) -> "Matrix":
        """Masked/ranged scalar assign (reference matrix.py:3106): the
        cells of the (rows × cols) region the mask admits get ``value``
        (accum-merged when an accumulator is active); everything else
        passes through, unless REPLACE clears the out-of-mask cells.

        Fast path: an un-complemented mask with a full-range region needs
        no materialized rectangle — the target is the mask's own support.
        A complemented mask (or an explicit region + mask) enumerates the
        region lazily; like the reference's GrB_assign over GrB_ALL, the
        region's size is what you pay, so complement-assigns over
        astronomically-dimensioned matrices should bound the region."""
        from pygraphblas_spark.algebra import current_accum

        desc = resolve(desc)
        if accum is None:
            accum = current_accum.get()
        spark = self.df.sparkSession
        typ_col = F.lit(value).cast(gbtypes.spark_type(self.typ))

        full_region = rows is None and cols is None
        if mask is not None and not desc.mask_complement and full_region:
            target = core._truthy_mask(mask.df, desc.mask_structural).select(
                "src", "dst", typ_col.alias(VAL)
            )
        else:
            r0, r1, rs, _ = _slice_parts(rows, self.nrows)
            c0, c1, cs, _ = _slice_parts(cols, self.ncols)
            target = (
                spark.range(r0, r1 + (1 if rs > 0 else -1), rs)
                .select(F.col("id").alias("src"))
                .crossJoin(
                    spark.range(c0, c1 + (1 if cs > 0 else -1), cs).select(
                        F.col("id").alias("dst")
                    )
                )
                .select("src", "dst", typ_col.alias(VAL))
            )
            if mask is not None:
                target = core.apply_mask(
                    target,
                    mask.df,
                    EDGE_SCHEMA_KEYS,
                    desc.mask_complement,
                    desc.mask_structural,
                )
        if accum is not None:
            # accum merge on target collisions; lone old cells pass through
            merged = core.ewise_add(
                self.df, target, EDGE_SCHEMA_KEYS, _coerce_binop(accum)
            )
        else:
            # plain assign: new value wins in the target, old elsewhere
            old_rest = self.df.join(
                target.select("src", "dst"), on=EDGE_SCHEMA_KEYS, how="left_anti"
            )
            merged = target.unionByName(old_rest)
        if desc.replace and mask is not None:
            # REPLACE: cells the mask does not admit are cleared
            merged = core.apply_mask(
                merged,
                mask.df,
                EDGE_SCHEMA_KEYS,
                desc.mask_complement,
                desc.mask_structural,
            )
        return Matrix(merged, self.nrows, self.ncols, self.typ)

    def assign_matrix(
        self, other: "Matrix", rows=None, cols=None, accum=None, mask=None
    ) -> "Matrix":
        """Submatrix upsert (reference matrix.py:3056 ``assign``; the
        reference aliases ``assign = assign_matrix``). A structural
        ``mask`` Matrix restricts which target cells are written."""
        r0, _, rs, _ = _slice_parts(rows, self.nrows)
        c0, _, cs, _ = _slice_parts(cols, self.ncols)
        # position p of `other` lands at start + p*step — covers plain
        # ranges (step 1), strides, and GxB_BACKWARDS (negative step)
        shifted = other.df.select(
            (F.col("src") * rs + r0).alias("src"),
            (F.col("dst") * cs + c0).alias("dst"),
            F.col(VAL).cast(gbtypes.spark_type(self.typ)),
        )
        if mask is not None:
            shifted = shifted.join(
                mask.df.select("src", "dst"), on=EDGE_SCHEMA_KEYS, how="left_semi"
            )
        if accum is not None:
            merged = core.ewise_add(
                self.df, shifted, EDGE_SCHEMA_KEYS, _coerce_binop(accum)
            )
        else:
            old_rest = self.df.join(
                shifted.select("src", "dst"), on=EDGE_SCHEMA_KEYS, how="left_anti"
            )
            merged = shifted.unionByName(old_rest)
        return Matrix(merged, self.nrows, self.ncols, self.typ)

    assign = assign_matrix  # reference matrix.py:3103

    def set_element(self, i: int, j: int, v) -> "Matrix":
        spark = self.df.sparkSession
        one = spark.createDataFrame(
            [(int(i), int(j), v)],
            T.StructType(
                [
                    T.StructField("src", T.LongType()),
                    T.StructField("dst", T.LongType()),
                    T.StructField(VAL, gbtypes.spark_type(self.typ)),
                ]
            ),
        )
        rest = self.df.filter(~((F.col("src") == i) & (F.col("dst") == j)))
        return Matrix(rest.unionByName(one), self.nrows, self.ncols, self.typ)

    def del_element(self, i: int, j: int) -> "Matrix":
        return Matrix(
            self.df.filter(~((F.col("src") == i) & (F.col("dst") == j))),
            self.nrows,
            self.ncols,
            self.typ,
        )

    def __setitem__(self, index, value) -> None:
        """Mutating assign sugar (reference matrix.py:3241): A[i,j]=v,
        A[i,:]=Vector, A[:,j]=Vector, A[Mask]=scalar, A[:, :]=scalar.
        DataFrames are immutable — the facade rebinds ``self.df`` to the
        assigned frame (same observable semantics as the reference)."""
        from pygraphblas_spark.vector import Vector

        if isinstance(index, Matrix):  # masked scalar assign
            out = self.assign_scalar(value, mask=index)
        elif isinstance(index, tuple) and len(index) == 2:
            i, j = index
            if isinstance(i, int) and isinstance(j, int):
                out = self.set_element(i, j, value)
            elif isinstance(i, int) and isinstance(value, Vector):
                out = self.assign_row(i, value)
            elif isinstance(j, int) and isinstance(value, Vector):
                out = self.assign_col(j, value)
            elif isinstance(value, Matrix):
                out = self.assign_matrix(value, rows=i, cols=j)
            else:
                out = self.assign_scalar(value, rows=i, cols=j)
        else:
            raise TypeError(f"bad assign index {index!r}")
        self.df = out.df

    def __delitem__(self, index) -> None:
        """Single-element delete (reference matrix.py:3310)."""
        if not (
            isinstance(index, tuple)
            and len(index) == 2
            and all(isinstance(x, int) for x in index)
        ):
            raise TypeError(f"bad delete index {index!r}")
        self.df = self.del_element(*index).df

    # ------------------------------------------------------------------
    # Comparison / equality (reference matrix.py:2323-2457)
    # ------------------------------------------------------------------

    def _full(self) -> "Matrix":
        """Densify: stored values + type-one everywhere else (reference
        ``_full`` matrix.py:2323-2341). Requires concrete (small) dims —
        used only by matrix-vs-matrix comparison."""
        dense = Matrix.dense(
            self.df.sparkSession,
            self.typ,
            self.nrows,
            self.ncols,
            fill=gbtypes.default_one(self.typ),
        )
        return self.eadd(dense, "FIRST")

    def _compare(self, other, pyop, strop: str) -> "Matrix":
        """Comparison semantics per reference ``_compare``
        (matrix.py:2343-2360): scalar compare keeps the stored pattern
        when ``pyop(other, 0)`` holds (values become booleans), else only
        the cells where the predicate is true (select + ONE); matrix
        compare densifies both sides first."""
        if isinstance(other, (bool, int, float)):
            if pyop(other, 0):
                op = _coerce_binop(
                    {"==": "EQ", "!=": "NE", ">": "GT", "<": "LT", ">=": "GE", "<=": "LE"}[strop]
                )
                df = self.df.select(
                    "src", "dst", op(F.col(VAL), F.lit(other)).alias(VAL)
                )
                return Matrix(df, self.nrows, self.ncols, "BOOL")
            sel = self.select(strop, other)
            return sel.pattern("BOOL")
        if isinstance(other, Matrix):
            a, b = self._full(), other._full()
            op = _coerce_binop(
                {"==": "EQ", "!=": "NE", ">": "GT", "<": "LT", ">=": "GE", "<=": "LE"}[strop]
            )
            res = a.emult(b, op)
            res.typ = "BOOL"
            return res
        raise TypeError("Unknown matrix comparison type.")

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

    def all(self, other: "Matrix", op) -> bool:
        """Do all stored elements compare True with ``op``? (reference
        matrix.py:1417-1433: shape, nvals, pattern must match and every
        emult-compared value hold.)"""
        if self.shape != other.shape:
            return False
        if self.nvals != other.nvals:
            return False
        c = self.emult(other, _coerce_binop(op))
        if c.nvals != self.nvals:
            return False
        return c.df.filter(~F.col(VAL).cast("boolean")).limit(1).count() == 0

    def iseq(self, other: "Matrix") -> bool:
        """Shape + pattern + values equality (reference matrix.py:1436;
        there expressed as ``all(other, EQ)`` — here a single NaN-safe
        full-outer pass)."""
        if self.shape != other.shape:
            return False
        return core.coo_equal(self.df, other.df, EDGE_SCHEMA_KEYS)

    def isne(self, other: "Matrix") -> bool:
        return not self.iseq(other)

    def get(self, i: int, j: int, default=None):
        """Element or ``default`` when absent (reference matrix.py:3330)."""
        v = self.extract_element(i, j)
        return default if v is None else v

    def __contains__(self, index) -> bool:
        """(i, j) membership (reference matrix.py:3323)."""
        i, j = index
        return self.extract_element(i, j) is not None

    # operator sugar (reference matrix.py:64-90, 1625-1711). The default
    # combiner is overridable via `with binary_op(...)` scope, exactly
    # like the reference's current_binop.get(<type default>).
    def __add__(self, other):
        return self._scalar_or_ewise(other, "PLUS", ewise="eadd")

    def __radd__(self, other):
        # scalar + A (reference matrix.py:1648-1652)
        return self.apply_first(other, self._sugar_op("PLUS"))

    def __iadd__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "PLUS", ewise="eadd"))

    def __sub__(self, other):
        return self._scalar_or_ewise(other, "MINUS", ewise="eadd")

    def __rsub__(self, other):
        return self.apply_first(other, self._sugar_op("MINUS"))

    def __isub__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "MINUS", ewise="eadd"))

    def __mul__(self, other):
        return self._scalar_or_ewise(other, "TIMES", ewise="emult")

    def __rmul__(self, other):
        return self.apply_first(other, self._sugar_op("TIMES"))

    def __imul__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "TIMES", ewise="emult"))

    def __truediv__(self, other):
        return self._scalar_or_ewise(other, "DIV", ewise="emult")

    def __rtruediv__(self, other):
        return self.apply_first(other, self._sugar_op("DIV"))

    def __itruediv__(self, other):
        return self._inplace(self._scalar_or_ewise(other, "DIV", ewise="emult"))

    def __or__(self, other):
        return self.eadd(other, self._sugar_op("SECOND"))

    def __ior__(self, other):
        return self._inplace(self.eadd(other, self._sugar_op("SECOND")))

    def __and__(self, other):
        return self.emult(other, self._sugar_op("SECOND"))

    def __iand__(self, other):
        return self._inplace(self.emult(other, self._sugar_op("SECOND")))

    def __imatmul__(self, other):
        # A @= B (reference matrix.py:68: in-place mxm)
        return self._inplace(self.__matmul__(other))

    @staticmethod
    def _sugar_op(default: str):
        from pygraphblas_spark.algebra import current_binop

        return current_binop.get() or default

    def _inplace(self, result: "Matrix") -> "Matrix":
        """In-place operator facade: the reference mutates via out=self
        (matrix.py:1625-1711); DataFrames are immutable so the facade
        rebinds this object's frame/type and returns self. NB: the
        reference's __isub__/__imul__/__itruediv__ flip operand order
        (`other.eadd(self, ...)`) — an upstream quirk its own tests never
        exercise; we keep self-first order, consistent with the
        non-inplace forms."""
        self.df, self.typ = result.df, result.typ
        self.nrows, self.ncols = result.nrows, result.ncols
        return self

    def __invert__(self):
        # Reference ~M is logical-not on BOOL, multiplicative inverse 1/x
        # on numeric types (tests/test_matrix.py:651-654: ~[0,1,2] FP64 →
        # [inf, 1.0, 0.5]).
        return self.apply("LNOT" if self.typ == "BOOL" else "MINV")

    def __neg__(self):
        return self.apply("AINV")

    def abs(self) -> "Matrix":
        return self.apply("ABS")

    __abs__ = abs

    def _scalar_or_ewise(self, other, opname, ewise):
        op = self._sugar_op(opname)
        if isinstance(other, Matrix):
            return getattr(self, ewise)(other, op)
        return self.apply_second(op, other)

    # ------------------------------------------------------------------
    # Sinks (reference matrix.py:944-1492, 3355-3536)
    # ------------------------------------------------------------------

    def to_lists(self) -> list[list]:
        """[I, J, V] sorted — an action (reference matrix.py:944)."""
        rows = self.df.orderBy("src", "dst").collect()
        return [
            [r["src"] for r in rows],
            [r["dst"] for r in rows],
            [gbtypes.from_storage(r[VAL], self.typ) for r in rows],
        ]

    def to_arrays(self):
        """numpy (I, J, V) via Arrow (reference to_arrays matrix.py:1475 /
        npI/npJ/npV matrix.py:1522)."""
        pdf = self.df.orderBy("src", "dst").toPandas()
        return pdf["src"].to_numpy(), pdf["dst"].to_numpy(), pdf[VAL].to_numpy()

    # Tuple-extraction family (reference matrix.py:1495-1607): each access
    # is an action that collects via Arrow — small-graph inspection API,
    # same contract as the reference's extractTuples-backed properties.
    @property
    def rows(self):
        """numpy array of row indexes present (reference matrix.py:1495)."""
        return self.to_arrays()[0]

    @property
    def I(self):  # noqa: E743 — reference name
        """Iterator over `rows` (reference matrix.py:1512)."""
        return iter(self.rows)

    @property
    def npI(self):
        return self.rows

    @property
    def cols(self):
        """numpy array of column indexes present (reference matrix.py:1532)."""
        return self.to_arrays()[1]

    @property
    def J(self):
        return iter(self.cols)

    @property
    def npJ(self):
        return self.cols

    @property
    def vals(self):
        """numpy array of stored values (reference matrix.py:1570)."""
        return self.to_arrays()[2]

    @property
    def V(self):
        return iter(self.vals)

    @property
    def npV(self):
        return self.vals

    def to_scipy_sparse(self):
        """scipy COO (reference matrix.py:3516) — small graphs only."""
        import scipy.sparse as sp

        i, j, v = self.to_arrays()
        return sp.coo_matrix((v, (i, j)), shape=self.shape)

    @classmethod
    def from_scipy_sparse(
        cls, spark: SparkSession, m, typ: Optional[str] = None
    ) -> "Matrix":
        """Round-trip twin of ``to_scipy_sparse`` (reference
        matrix.py:3495); type inferred from the dtype kind."""
        ss = m.tocoo()
        nrows, ncols = ss.shape
        if typ is None:
            kind = ss.data.dtype.kind
            typ = "BOOL" if kind == "b" else ("INT64" if kind in "iu" else "FP64")
        return cls.from_lists(
            spark,
            [int(x) for x in ss.row],
            [int(x) for x in ss.col],
            [x.item() for x in ss.data],
            nrows,
            ncols,
            typ,
        )

    def to_numpy(self):
        import numpy as np

        i, j, v = self.to_arrays()
        dtype = "float64" if self.typ in ("FP32", "FP64") else "int64"
        out = np.zeros(self.shape, dtype=dtype)
        if len(i):
            out[i, j] = v
        return out

    def to_dict(self) -> dict:
        return {(r["src"], r["dst"]): r[VAL] for r in self.df.collect()}

    def to_string(self, empty: str = "-") -> str:
        """Small-matrix debug render (reference matrix.py:3458)."""
        d = self.to_dict()
        lines = []
        for i in range(self.nrows):
            lines.append(
                " ".join(
                    str(d[(i, j)]) if (i, j) in d else empty
                    for j in range(self.ncols)
                )
            )
        return "\n".join(lines)

    def __str__(self) -> str:
        return self.to_string()

    def print(self, level: int = 2, name: str = "A", f=None) -> None:
        """Diagnostic print (reference matrix.py:3443 GxB_Matrix_fprint)."""
        import sys

        f = f or sys.stdout
        print(f"{name} <{self.typ} {self.nrows}x{self.ncols}>", file=f)
        if level > 1:
            print(self.to_string(), file=f)

    def to_markdown_table(self, title: str = "A") -> str:
        """Markdown render (reference matrix.py:3355)."""
        d = self.to_dict()
        head = f"|{title}|" + "|".join(str(j) for j in range(self.ncols)) + "|"
        sep = "|---" * (self.ncols + 1) + "|"
        rows = [
            f"|{i}|" + "|".join(
                str(d[(i, j)]) if (i, j) in d else " " for j in range(self.ncols)
            ) + "|"
            for i in range(self.nrows)
        ]
        return "\n".join([head, sep] + rows)

    def to_html_table(self, title: str = "A") -> str:
        """HTML render (reference matrix.py:3381)."""
        d = self.to_dict()
        cells = "".join(
            "<tr><th>{}</th>{}</tr>".format(
                i,
                "".join(
                    f"<td>{d[(i, j)]}</td>" if (i, j) in d else "<td></td>"
                    for j in range(self.ncols)
                ),
            )
            for i in range(self.nrows)
        )
        header = "<tr><th>{}</th>{}</tr>".format(
            title, "".join(f"<th>{j}</th>" for j in range(self.ncols))
        )
        return f"<table>{header}{cells}</table>"

    def assign_row(self, i: int, v: "Vector", accum=None) -> "Matrix":
        """Row upsert from a Vector (reference matrix.py:3031)."""
        row = v.df.select(
            F.lit(int(i)).cast("long").alias("src"),
            F.col("id").alias("dst"),
            F.col(VAL).cast(gbtypes.spark_type(self.typ)),
        )
        if accum is not None:
            merged = core.ewise_add(self.df, row, EDGE_SCHEMA_KEYS, _coerce_binop(accum))
        else:
            rest = self.df.join(row.select("src", "dst"), EDGE_SCHEMA_KEYS, "left_anti")
            merged = row.unionByName(rest)
        return Matrix(merged, self.nrows, self.ncols, self.typ)

    def assign_col(self, j: int, v: "Vector", accum=None) -> "Matrix":
        """Column upsert from a Vector (reference matrix.py:3005)."""
        col = v.df.select(
            F.col("id").alias("src"),
            F.lit(int(j)).cast("long").alias("dst"),
            F.col(VAL).cast(gbtypes.spark_type(self.typ)),
        )
        if accum is not None:
            merged = core.ewise_add(self.df, col, EDGE_SCHEMA_KEYS, _coerce_binop(accum))
        else:
            rest = self.df.join(col.select("src", "dst"), EDGE_SCHEMA_KEYS, "left_anti")
            merged = col.unionByName(rest)
        return Matrix(merged, self.nrows, self.ncols, self.typ)

    def __iter__(self):
        for r in self.df.toLocalIterator():
            yield (r["src"], r["dst"], r[VAL])

    def __len__(self):
        return self.nvals

    def __repr__(self):
        return f"<Matrix {self.typ} {self.nrows}x{self.ncols}>"

    # ------------------------------------------------------------------
    # Internals
    # ------------------------------------------------------------------

    def _finalized(self, new_df, out, mask, accum, desc) -> "Matrix":
        desc = desc or NULL
        merged = core.finalize(
            out.df if out is not None else None,
            new_df,
            EDGE_SCHEMA_KEYS,
            mask.df if mask is not None else None,
            _coerce_binop(accum) if accum else None,
            desc,
        )
        return Matrix(merged, self.nrows, self.ncols, self.typ)

    def _default_semiring(self, other, sr):
        """Resolve semiring: explicit → contextvar (`with semiring(...):`)
        → type default (reference matrix.py:2553-2568; defaults
        types.py:149-158, BOOL→LOR_LAND types.py:190-200)."""
        if sr is not None:
            if isinstance(sr, str):
                t = gbtypes.promote(self.typ, other.typ)
                if gbtypes.is_complex(t):
                    from pygraphblas_spark.algebra import typed_semiring

                    return typed_semiring(sr, t)
            return _coerce_semiring(sr)
        from pygraphblas_spark.algebra import current_semiring

        ctx = current_semiring.get()
        if ctx is not None:
            return ctx
        t = gbtypes.promote(self.typ, other.typ)
        if gbtypes.is_complex(t):
            from pygraphblas_spark.algebra import typed_semiring

            return typed_semiring("PLUS_TIMES", t)
        return semiring("LOR_LAND" if t == "BOOL" else "PLUS_TIMES")


def _slice_parts(sel, dim: int) -> tuple[int, int, int, int]:
    """(start, stop, step, count) with GraphBLAS-inclusive stop; negative
    step = GxB_BACKWARDS (reference _build_range base.py:216-250: GxB_RANGE
    / GxB_STRIDE / GxB_BACKWARDS)."""
    if sel is None:
        sel = slice(None)
    if isinstance(sel, int):
        return sel, sel, 1, 1
    step = 1 if sel.step is None else sel.step
    if step == 0:
        raise ValueError("slice step cannot be 0")
    if step > 0:
        start = sel.start or 0
        stop = dim - 1 if sel.stop is None else sel.stop
        count = 0 if start > stop else (stop - start) // step + 1
    else:
        start = dim - 1 if sel.start is None else sel.start
        stop = 0 if sel.stop is None else sel.stop
        count = 0 if start < stop else (start - stop) // (-step) + 1
    return start, stop, step, count


def _stride_filter_pos(colname: str, start: int, stop: int, step: int):
    """(boolean filter Column, 0-based position Column) selecting the
    stride start, start+step, ... — pure column expressions so the scan
    predicate stays pushdown-able."""
    c = F.col(colname)
    # `div` = exact integral division (float `/` loses precision above
    # 2^53 and indices run to GxB_INDEX_MAX = 2^60)
    if step > 0:
        keep = c.between(start, stop) & (((c - start) % step) == 0)
        pos = F.expr(f"({colname} - {start}) div {step}")
    else:
        keep = c.between(stop, start) & (((start - c) % (-step)) == 0)
        pos = F.expr(f"({start} - {colname}) div {-step}")
    return keep, pos.cast("long")
