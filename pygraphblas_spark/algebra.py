"""First-class algebra objects: UnaryOp, BinaryOp, Monoid, Semiring, SelectOp.

The reference parameterizes every operator with these (reference:
``pygraphblas/unaryop.py:21``, ``binaryop.py:28``, ``monoid.py:37``,
``semiring.py:29``, ``selectop.py:31``); SuiteSparse instantiates ~1700
semirings by cross-product over types. We keep the *algebra* first-class but
type-generic: each op holds Spark ``Column`` expression builders, and a
Monoid additionally holds the aggregate expression + identity, so a Semiring
``(⊕-monoid, ⊗-binop)`` compiles a contraction directly into
``join → groupBy → agg`` that stays inside whole-stage codegen.

Custom (user-defined) ops: the reference jits Python via numba
(``binaryop.py:137-191``); here a user registers a Column-expression
function (JVM fast path) or a pandas aggregate (Arrow path) — see
``monoid()`` / ``semiring()`` factories.
"""

from __future__ import annotations

import contextvars
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# Context-manager operator defaults, mirroring the reference's contextvars
# (semiring.py:24,58-64; binaryop.py:24-25,52-58; monoid.py:53-59):
# `with semiring("MIN_PLUS"): A @ B` uses MIN_PLUS without passing it.
current_semiring: contextvars.ContextVar = contextvars.ContextVar(
    "current_semiring", default=None
)
current_accum: contextvars.ContextVar = contextvars.ContextVar(
    "current_accum", default=None
)
current_binop: contextvars.ContextVar = contextvars.ContextVar(
    "current_binop", default=None
)


# --------------------------------------------------------------------------
# Unary ops  (reference inventory: pygraphblas/unaryop.py:55-62)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class UnaryOp:
    """A named element-wise function of one value column.

    ``fn(val)`` may also use the index columns for positional ops
    (POSITIONI/POSITIONJ are index-valued in the reference); those take
    ``fn(val, src, dst)`` via ``positional=True``.
    """

    name: str
    fn: Callable[..., Column]
    positional: bool = False

    def __call__(self, val: Column, src: Column = None, dst: Column = None) -> Column:
        if self.positional:
            return self.fn(val, src, dst)
        return self.fn(val)


_UNARY: dict[str, UnaryOp] = {}


def unary_op(name: str, fn: Callable[..., Column] = None, positional: bool = False) -> UnaryOp:
    """Register (or build) a named UnaryOp. With ``fn=None``, look up."""
    if fn is None:
        return _UNARY[name.upper()]
    op = UnaryOp(name.upper(), fn, positional)
    _UNARY[op.name] = op
    return op


# The full reference unary inventory (unaryop.py:55-62) — all map to
# built-in pyspark.sql.functions (JVM-side, codegen'd).
def _c_div(a: Column, b: Column) -> Column:
    """IEEE-754 division like the reference's C kernels: x/0 = ±inf,
    0/0 = NaN (Spark's `/` yields NULL on zero divisors instead)."""
    return F.when(b != 0, a / b).otherwise(
        F.when(a > 0, F.lit(float("inf")))
        .when(a < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


unary_op("IDENTITY", lambda c: c)
unary_op("ONE", lambda c: F.lit(1))
unary_op("AINV", lambda c: -c)
unary_op("MINV", lambda c: _c_div(F.lit(1.0), c))
unary_op("LNOT", lambda c: ~c.cast("boolean"))
unary_op("ABS", F.abs)
unary_op("SQRT", F.sqrt)
unary_op("LOG", F.log)
unary_op("EXP", F.exp)
unary_op("LOG2", F.log2)
unary_op("LOG10", F.log10)
unary_op("LOG1P", F.log1p)
unary_op("EXPM1", F.expm1)
unary_op("SIN", F.sin)
unary_op("COS", F.cos)
unary_op("TAN", F.tan)
unary_op("ASIN", F.asin)
unary_op("ACOS", F.acos)
unary_op("ATAN", F.atan)
unary_op("SINH", F.sinh)
unary_op("COSH", F.cosh)
unary_op("TANH", F.tanh)
unary_op("ASINH", F.asinh)
unary_op("ACOSH", F.acosh)
unary_op("ATANH", F.atanh)
unary_op("SIGNUM", F.signum)
unary_op("CEIL", F.ceil)
unary_op("FLOOR", F.floor)
unary_op("ROUND", F.round)
unary_op("TRUNC", lambda c: c.cast("long").cast("double"))
unary_op("ISINF", lambda c: c == F.lit(float("inf")))
unary_op("ISNAN", F.isnan)
unary_op("ISFINITE", lambda c: ~(F.isnan(c) | (F.abs(c) == F.lit(float("inf")))))
unary_op("POSITIONI", lambda v, s, d: s, positional=True)
unary_op("POSITIONI1", lambda v, s, d: s + 1, positional=True)
unary_op("POSITIONJ", lambda v, s, d: d, positional=True)
unary_op("POSITIONJ1", lambda v, s, d: d + 1, positional=True)

# Special functions (reference unaryop.py:55-62 LGAMMA/TGAMMA/ERF/ERFC):
# no Spark builtin → Arrow-batched pandas kernel (scipy.special when
# available — vectorized C — else stdlib math per element). These are the
# one sanctioned slow path in the op inventory; everything else is
# whole-stage codegen.
def _pandas_unary_factory(name: str):
    def build(c: Column) -> Column:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        try:
            from scipy import special as sp

            fn = {
                "LGAMMA": sp.gammaln,
                "TGAMMA": sp.gamma,
                "ERF": sp.erf,
                "ERFC": sp.erfc,
            }[name]

            def kernel(s):
                return pd.Series(fn(s.astype("float64").to_numpy()))

        except ImportError:  # no scipy in this container: stdlib math path
            import math

            fn = {
                "LGAMMA": math.lgamma,
                "TGAMMA": math.gamma,
                "ERF": math.erf,
                "ERFC": math.erfc,
            }[name]

            def kernel(s):
                return s.astype("float64").map(fn)

        # real annotation objects (not strings): this module's postponed
        # annotations would otherwise reach pandas_udf as unresolvable
        # 'pd.Series' literals (pd is function-local here)
        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, "double")(c.cast("double"))

    return build


for _name in ("LGAMMA", "TGAMMA", "ERF", "ERFC"):
    unary_op(_name, _pandas_unary_factory(_name))


# frexp decomposition (reference unaryop.py FREXPX/FREXPE): x = m·2^e with
# 0.5 <= |m| < 1. log2-derived exponent with a one-step fixup for values
# where float log2 rounds across a power-of-two boundary.
def _frexp_e(c: Column) -> Column:
    e0 = (F.floor(F.log2(F.abs(c))) + 1).cast("int")
    m0 = c / F.pow(F.lit(2.0), e0)
    return (
        F.when(c == 0, F.lit(0))
        .when(F.abs(m0) >= 1, e0 + 1)
        .when(F.abs(m0) < 0.5, e0 - 1)
        .otherwise(e0)
    )


unary_op("FREXPE", lambda c: _frexp_e(c).cast("double"))
unary_op(
    "FREXPX",
    lambda c: F.when(c == 0, F.lit(0.0)).otherwise(
        c / F.pow(F.lit(2.0), _frexp_e(c))
    ),
)


# --------------------------------------------------------------------------
# Binary ops  (reference inventory: pygraphblas/binaryop.py:104-110)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class BinaryOp:
    """A named element-wise function of two value columns.

    ``positional=True`` ops (FIRSTI/SECONDJ/...) receive
    ``fn(a, b, a_src, a_dst, b_src, b_dst)``.
    """

    name: str
    fn: Callable[..., Column]
    positional: bool = False

    def __call__(self, a: Column, b: Column, *pos) -> Column:
        if self.positional:
            return self.fn(a, b, *pos)
        return self.fn(a, b)

    def __enter__(self) -> "BinaryOp":
        # `with binary_op("MIN"): A + B` makes MIN the default combiner
        # for operator sugar (reference binaryop.py:52-58 + the
        # current_binop.get(...) dispatch in matrix.py:1626-1711)
        object.__setattr__(self, "_cv_token", current_binop.set(self))
        return self

    def __exit__(self, *exc) -> None:
        current_binop.reset(object.__getattribute__(self, "_cv_token"))


class Accum:
    """Scoped accumulator (reference binaryop.py:80-101): inside
    ``with Accum(binary_op("PLUS")):`` any operation whose ``accum`` arg
    is unspecified merges into its output with the given op (consulted
    by operators.core.finalize)."""

    __slots__ = ("binaryop", "_token")

    def __init__(self, binaryop: "BinaryOp | str"):
        self.binaryop = (
            binary_op(binaryop) if isinstance(binaryop, str) else binaryop
        )

    def __enter__(self) -> "Accum":
        self._token = current_accum.set(self.binaryop)
        return self

    def __exit__(self, *exc) -> None:
        current_accum.reset(self._token)


_BINARY: dict[str, BinaryOp] = {}


def binary_op(name: str, fn: Callable[..., Column] = None, positional: bool = False) -> BinaryOp:
    if fn is None:
        return _BINARY[name.upper()]
    op = BinaryOp(name.upper(), fn, positional)
    _BINARY[op.name] = op
    return op


binary_op("FIRST", lambda a, b: a)
binary_op("SECOND", lambda a, b: b)
binary_op("PAIR", lambda a, b: F.lit(1))
_BINARY["ONEB"] = _BINARY["PAIR"]  # GrB_ONEB is PAIR's spec name
binary_op("ANY", lambda a, b: a)  # ANY may return either; we pin FIRST for determinism

# Positional binops (reference binaryop.py:106 GxB_FIRSTI/SECONDJ/...):
# index-valued multiply ops — fn(a, b, a_src, a_dst, b_src, b_dst). In
# C[i,j] = ⊕_k A[i,k] ⊗ B[k,j] the positions are (i, k, k, j); semirings
# like MIN_SECONDI (argmin row) and ANY_SECONDI (BFS parent) auto-derive.
binary_op("FIRSTI", lambda a, b, ai, aj, bi, bj: ai, positional=True)
binary_op("FIRSTI1", lambda a, b, ai, aj, bi, bj: ai + 1, positional=True)
binary_op("FIRSTJ", lambda a, b, ai, aj, bi, bj: aj, positional=True)
binary_op("FIRSTJ1", lambda a, b, ai, aj, bi, bj: aj + 1, positional=True)
binary_op("SECONDI", lambda a, b, ai, aj, bi, bj: bi, positional=True)
binary_op("SECONDI1", lambda a, b, ai, aj, bi, bj: bi + 1, positional=True)
binary_op("SECONDJ", lambda a, b, ai, aj, bi, bj: bj, positional=True)
binary_op("SECONDJ1", lambda a, b, ai, aj, bi, bj: bj + 1, positional=True)
binary_op("MIN", F.least)


def _fmax(a: Column, b: Column) -> Column:
    # C fmax semantics (SuiteSparse GrB_MAX_FP*): a NaN operand is ignored,
    # fmax(NaN, NaN) = NaN. Spark's greatest() sorts NaN above everything,
    # so it would propagate NaN instead. least() already matches fmin.
    # The double cast keeps isnan() legal on BOOL/integral columns (always
    # false there — the extra branch folds away for non-float types).
    return (
        F.when(F.isnan(a.cast("double")), b)
        .when(F.isnan(b.cast("double")), a)
        .otherwise(F.greatest(a, b))
    )


binary_op("MAX", _fmax)
binary_op("PLUS", lambda a, b: a + b)
binary_op("MINUS", lambda a, b: a - b)
binary_op("RMINUS", lambda a, b: b - a)
binary_op("TIMES", lambda a, b: a * b)
binary_op("DIV", _c_div)
binary_op("RDIV", lambda a, b: _c_div(b, a))
binary_op("POW", lambda a, b: F.pow(a, b))
binary_op("EQ", lambda a, b: a == b)
binary_op("NE", lambda a, b: a != b)
binary_op("GT", lambda a, b: a > b)
binary_op("LT", lambda a, b: a < b)
binary_op("GE", lambda a, b: a >= b)
binary_op("LE", lambda a, b: a <= b)
binary_op("ISEQ", lambda a, b: (a == b).cast("int"))
binary_op("ISNE", lambda a, b: (a != b).cast("int"))
binary_op("ISGT", lambda a, b: (a > b).cast("int"))
binary_op("ISLT", lambda a, b: (a < b).cast("int"))
binary_op("ISGE", lambda a, b: (a >= b).cast("int"))
binary_op("ISLE", lambda a, b: (a <= b).cast("int"))
binary_op("LOR", lambda a, b: a.cast("boolean") | b.cast("boolean"))
binary_op("LAND", lambda a, b: a.cast("boolean") & b.cast("boolean"))
binary_op("LXOR", lambda a, b: a.cast("boolean") != b.cast("boolean"))
binary_op("BOR", lambda a, b: a.bitwiseOR(b))
binary_op("BAND", lambda a, b: a.bitwiseAND(b))
binary_op("BXOR", lambda a, b: a.bitwiseXOR(b))
binary_op("BXNOR", lambda a, b: F.bitwise_not(a.bitwiseXOR(b)))


# bit-field ops (reference binaryop.py:104-110 BGET/BSET/BCLR/BSHIFT,
# SuiteSparse bitget/bitset/bitclr/bitshift semantics: 1-based bit
# position k; out-of-range k → 0 for BGET, x unchanged for BSET/BCLR;
# BSHIFT shifts left for positive k, arithmetic-right for negative).
def _shl(a: Column, k: Column) -> Column:
    return F.call_function("shiftleft", a, k.cast("int"))


def _shr(a: Column, k: Column) -> Column:
    return F.call_function("shiftright", a, k.cast("int"))


_ONE_L = lambda: F.lit(1).cast("long")  # noqa: E731

binary_op(
    "BGET",
    lambda a, b: F.when(
        (b >= 1) & (b <= 64), _shr(a, b - 1).bitwiseAND(_ONE_L())
    ).otherwise(F.lit(0).cast("long")),
)
binary_op(
    "BSET",
    lambda a, b: F.when(
        (b >= 1) & (b <= 64), a.bitwiseOR(_shl(_ONE_L(), b - 1))
    ).otherwise(a),
)
binary_op(
    "BCLR",
    lambda a, b: F.when(
        (b >= 1) & (b <= 64), a.bitwiseAND(F.bitwise_not(_shl(_ONE_L(), b - 1)))
    ).otherwise(a),
)
binary_op(
    "BSHIFT",
    lambda a, b: F.when(b >= 0, _shl(a, b)).otherwise(_shr(a, -b)),
)
binary_op("ATAN2", F.atan2)
binary_op("HYPOT", F.hypot)
binary_op("FMOD", lambda a, b: a % b)
# C remainder() rounds a/b half-to-even (rint), not half-away (round):
# double-cast bround in HALF_EVEN mode matches at every exact-.5 multiple
binary_op(
    "REMAINDER",
    lambda a, b: a - F.bround((a / b).cast("double"), 0) * b,
)
binary_op("COPYSIGN", lambda a, b: F.abs(a) * F.when(b < 0, F.lit(-1.0)).otherwise(F.lit(1.0)))
binary_op("LDEXP", lambda a, b: a * F.pow(F.lit(2.0), b))
# (FIRSTI/FIRSTJ/SECONDI/SECONDJ + their *1 variants are registered once,
# with the rest of the positional family, above)


# --------------------------------------------------------------------------
# Monoids  (reference: pygraphblas/monoid.py:37; add-monoids MIN MAX PLUS
# TIMES ANY + boolean LOR LAND LXOR EQ + bitwise)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Monoid:
    """Associative+commutative reducer: aggregate expression + identity +
    element-combine binop (used by eadd/accum merges)."""

    name: str
    agg: Callable[[Column], Column]  # Column -> aggregate Column
    identity: object
    combine: BinaryOp  # pairwise version, for full_outer merges

    def __call__(self, c: Column) -> Column:
        return self.agg(c)


_MONOID: dict[str, Monoid] = {}


def monoid(
    name: str,
    agg: Callable[[Column], Column] = None,
    identity: object = None,
    combine: BinaryOp | str = None,
) -> Monoid:
    if agg is None:
        return _MONOID[name.upper()]
    if isinstance(combine, str):
        combine = binary_op(combine)
    m = Monoid(name.upper(), agg, identity, combine)
    _MONOID[m.name] = m
    return m


monoid("PLUS", F.sum, 0, "PLUS")
monoid("TIMES", F.product, 1, "TIMES")
monoid("MIN", F.min, float("inf"), "MIN")
def _fmax_agg(c: Column) -> Column:
    # fmax semantics for the reduction: NaN ignored unless every element
    # is NaN (F.min is already fmin — Spark sorts NaN last). See _fmax.
    return F.coalesce(F.max(F.when(~F.isnan(c.cast("double")), c)), F.max(c))


monoid("MAX", _fmax_agg, float("-inf"), "MAX")
monoid("ANY", F.first, None, "ANY")  # deterministic-enough: first within group
monoid("LOR", lambda c: F.max(c.cast("boolean").cast("int")).cast("boolean"), False, "LOR")
monoid("LAND", lambda c: F.min(c.cast("boolean").cast("int")).cast("boolean"), True, "LAND")
monoid("LXOR", lambda c: (F.sum(c.cast("boolean").cast("int")) % 2 == 1), False, "LXOR")
monoid("EQ", lambda c: (F.count(F.when(~c.cast("boolean"), 1)) % 2 == 0), True, "EQ")
monoid("BOR", lambda c: F.expr("bit_or(__x__)"), 0, "BOR")  # replaced below with builder
monoid("BAND", lambda c: F.expr("bit_and(__x__)"), -1, "BAND")

# bit_or/bit_and need the column object — register proper builders.
_MONOID["BOR"] = Monoid("BOR", lambda c: F.bit_or(c), 0, binary_op("BOR"))
_MONOID["BAND"] = Monoid("BAND", lambda c: F.bit_and(c), -1, binary_op("BAND"))
_MONOID["BXOR"] = Monoid("BXOR", lambda c: F.bit_xor(c), 0, binary_op("BXOR"))


# --------------------------------------------------------------------------
# Semirings  (reference: pygraphblas/semiring.py:29, ~1700 instances; we
# expose the named ones the algorithms use + a generic factory, see
# SURVEY.md §2.2)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Semiring:
    """(⊕ add-monoid, ⊗ multiply-binop). Usable as a context manager to
    set the default semiring for `@` (reference tests/test_matrix.py:265-290).

    ``agg_direct`` short-circuits the compiled ``agg(mul(a,b))`` with a
    cheaper equivalent aggregate when one exists — e.g. PLUS_PAIR is
    ``count(*)`` (no value columns touched at all), PLUS_SECOND is
    ``sum(b)`` (left values pruned from the join output → narrower shuffle).
    """

    name: str
    add: Monoid
    mul: BinaryOp
    agg_direct: Optional[Callable[[Column, Column], Column]] = None

    def agg_expr(self, a: Column, b: Column, pos: tuple = ()) -> Column:
        if self.mul.positional:
            # index-valued multiply (FIRSTI/SECONDJ/... — pos supplies
            # (a_src, a_dst, b_src, b_dst)); no agg_direct shortcut exists
            # for positional ops
            return self.add(self.mul(a, b, *pos))
        if self.agg_direct is not None:
            return self.agg_direct(a, b)
        return self.add(self.mul(a, b))

    def __enter__(self) -> "Semiring":
        object.__setattr__(self, "_cv_token", current_semiring.set(self))
        return self

    def __exit__(self, *exc) -> None:
        current_semiring.reset(object.__getattribute__(self, "_cv_token"))


_SEMIRING: dict[str, Semiring] = {}


def semiring(
    name: str,
    add: Monoid | str = None,
    mul: BinaryOp | str = None,
    agg_direct: Callable[[Column, Column], Column] = None,
) -> Semiring:
    """Look up a semiring by name ('PLUS_TIMES'), or register one.

    Lookup auto-derives from the registered monoid/binop tables when not
    pre-registered — mirroring the reference's regex-generated cross
    product (semiring.py:87-121) without instantiating all 1700.
    """
    key = name.upper()
    if add is None:
        if key in _SEMIRING:
            return _SEMIRING[key]
        add_name, _, mul_name = key.partition("_")
        s = Semiring(key, monoid(add_name), binary_op(mul_name))
        _SEMIRING[key] = s
        return s
    if isinstance(add, str):
        add = monoid(add)
    if isinstance(mul, str):
        mul = binary_op(mul)
    s = Semiring(key, add, mul, agg_direct)
    _SEMIRING[key] = s
    return s


# The named semirings the reference's shipped algorithms use (SURVEY.md
# §2.2 table), each with its cheapest direct aggregate:
semiring("PLUS_TIMES", "PLUS", "TIMES", lambda a, b: F.sum(a * b))
semiring("PLUS_SECOND", "PLUS", "SECOND", lambda a, b: F.sum(b))
semiring("PLUS_FIRST", "PLUS", "FIRST", lambda a, b: F.sum(a))
semiring("PLUS_PAIR", "PLUS", "PAIR", lambda a, b: F.count(F.lit(1)))
semiring("MIN_PLUS", "MIN", "PLUS", lambda a, b: F.min(a + b))
semiring("MIN_SECOND", "MIN", "SECOND", lambda a, b: F.min(b))
semiring("MIN_FIRST", "MIN", "FIRST", lambda a, b: F.min(a))
# MAX direct aggregates go through _fmax_agg, not F.max — the shortcut
# must keep the monoid's C-fmax NaN semantics or the same ⊕=MAX
# contraction would be NaN-propagating only when the name is pre-listed
semiring("MAX_SECOND", "MAX", "SECOND", lambda a, b: _fmax_agg(b))
semiring("MAX_FIRST", "MAX", "FIRST", lambda a, b: _fmax_agg(a))
semiring("MAX_PLUS", "MAX", "PLUS", lambda a, b: _fmax_agg(a + b))
semiring("MAX_TIMES", "MAX", "TIMES", lambda a, b: _fmax_agg(a * b))
semiring(
    "LOR_LAND",
    "LOR",
    "LAND",
    lambda a, b: F.max((a.cast("boolean") & b.cast("boolean")).cast("int")).cast("boolean"),
)
semiring(
    "PLUS_LAND",
    "PLUS",
    "LAND",
    lambda a, b: F.sum((a.cast("boolean") & b.cast("boolean")).cast("long")),
)
semiring("ANY_PAIR", "ANY", "PAIR", lambda a, b: F.first(F.lit(1)))
semiring("ANY_SECOND", "ANY", "SECOND", lambda a, b: F.first(b))

# Log semiring (reference demo/Log-Semiring.ipynb: Log32 with
# PLUS = x + log1p(exp(y - x)), TIMES = x + y over log-space values —
# i.e. ⊕ = logaddexp, ⊗ = +, so matrix products multiply probabilities
# without underflow). The pairwise combine is the numerically-stable
# two-argument form.
def _logaddexp(a: Column, b: Column) -> Column:
    return F.greatest(a, b) + F.log1p(F.exp(-F.abs(a - b)))


def _logsumexp_agg(c: Column) -> Column:
    """Grouped ⊕ for LOGADD: the direct ``log(Σ exp(x))``.

    **Domain restriction — log-probabilities (x ≤ 0) only.** Unlike the
    pairwise ``_logaddexp`` above (max-shifted, stable for any x), a SQL
    aggregate cannot nest the max-shift ``max(x) + log(Σ exp(x - max(x)))``
    inside one grouped pass (``max(x)`` is itself an aggregate — nested
    aggregates are rejected), so values above ~709 overflow ``exp`` to
    ``inf``. That matches the semiring's purpose — the reference demo's
    Log32 domain is log-probabilities, where exp(x) ≤ 1 — but
    general-purpose use of LOGADD / LOGADD_PLUS on large positive
    log-space values is out of contract. (A stable grouped variant would
    need two aggregation passes or a collect_list fold — O(group) memory,
    no map-side partials — and is deliberately not the default.)
    """
    return F.log(F.sum(F.exp(c)))


monoid("LOGADD", _logsumexp_agg, float("-inf"), binary_op("LOGADD", _logaddexp))
semiring("LOGADD_PLUS", "LOGADD", "PLUS", lambda a, b: _logsumexp_agg(a + b))


def _logsumexp_stable_agg(c: Column) -> Column:
    """Grouped ⊕ for LOGADD_STABLE: max-shifted ``m + log(Σ exp(x−m))``,
    exact for ANY double log-space values (no overflow at x > ~709).

    A SQL aggregate cannot nest the group max, so this runs as an
    Arrow-batched grouped-agg pandas UDF — vectorized numpy per group,
    but NO map-side partial aggregation, so each group's values shuffle
    to one reducer. Opt-in (``LOGADD_STABLE`` / ``LOGADD_STABLE_PLUS``)
    for callers outside the log-probability domain; the default LOGADD
    stays the single-pass codegen aggregate."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _lse(v):
        a = v.to_numpy(dtype="float64")
        m = np.max(a)  # NaN propagates, matching log(sum(exp(x)))
        if not np.isfinite(m):  # all -inf -> -inf; +inf/NaN propagate
            return float(m)
        return float(m + np.log(np.sum(np.exp(a - m))))

    # explicit functionType: the module's postponed annotations would
    # stringify pd.Series hints and break pandas_udf's hint resolver
    return pandas_udf(_lse, "double", PandasUDFType.GROUPED_AGG)(c)


monoid(
    "LOGADD_STABLE",
    _logsumexp_stable_agg,
    float("-inf"),
    binary_op("LOGADD_STABLE", _logaddexp),
)
semiring(
    "LOGADD_STABLE_PLUS",
    "LOGADD_STABLE",
    "PLUS",
    lambda a, b: _logsumexp_stable_agg(a + b),
)


# --------------------------------------------------------------------------
# Select ops  (reference: pygraphblas/selectop.py:57-74)
# --------------------------------------------------------------------------

# Each select op is (src, dst, val, thunk) -> boolean Column.
SELECT_OPS: dict[str, Callable] = {
    "TRIL": lambda s, d, v, k: d <= s + k,
    "TRIU": lambda s, d, v, k: d >= s + k,
    "DIAG": lambda s, d, v, k: d == s + k,
    "OFFDIAG": lambda s, d, v, k: d != s + k,
    "NONZERO": lambda s, d, v, k: v != 0,
    "EQ_ZERO": lambda s, d, v, k: v == 0,
    "GT_ZERO": lambda s, d, v, k: v > 0,
    "GE_ZERO": lambda s, d, v, k: v >= 0,
    "LT_ZERO": lambda s, d, v, k: v < 0,
    "LE_ZERO": lambda s, d, v, k: v <= 0,
    "NE_THUNK": lambda s, d, v, k: v != k,
    "EQ_THUNK": lambda s, d, v, k: v == k,
    "GT_THUNK": lambda s, d, v, k: v > k,
    "GE_THUNK": lambda s, d, v, k: v >= k,
    "LT_THUNK": lambda s, d, v, k: v < k,
    "LE_THUNK": lambda s, d, v, k: v <= k,
}

def select_op(name: str, fn: Callable = None) -> Callable:
    """Look up or register a select op (reference selectop.py:31
    ``select_op`` user-defined select operators).

    ``fn`` is ``(src, dst, val, thunk) -> boolean Column`` — the same
    signature the built-in table uses, so user ops compose with
    ``Matrix.select(name, thunk)`` / ``Vector.select`` unchanged.
    """
    key = name.upper()
    if fn is None:
        return SELECT_OPS[key]
    SELECT_OPS[key] = fn
    return fn


# Operator-symbol sugar used by Matrix.select / Vector.select, mirroring
# the reference's string dispatch (matrix.py:2042-2140).
SELECT_SYMBOLS = {
    ">": "GT_THUNK",
    "<": "LT_THUNK",
    ">=": "GE_THUNK",
    "<=": "LE_THUNK",
    "!=": "NE_THUNK",
    "==": "EQ_THUNK",
    ">0": "GT_ZERO",
    "<0": "LT_ZERO",
    ">=0": "GE_ZERO",
    "<=0": "LE_ZERO",
    "!=0": "NONZERO",
    "==0": "EQ_ZERO",
}


# --------------------------------------------------------------------------
# Complex (FC32/FC64) op family  (reference types.py:326-345; SuiteSparse
# GxB complex ops). Values are struct<re, im> columns (gbtypes), so every
# op here is still a pure JVM column expression — no UDFs. Ops register
# under "<NAME>_FC" and the typed_* resolvers below dispatch plain names
# ("PLUS", "TIMES", ...) to them when the operand type is complex.
# --------------------------------------------------------------------------


def _re(c: Column) -> Column:
    return c.getField("re")


def _im(c: Column) -> Column:
    return c.getField("im")


def _fc(re: Column, im: Column) -> Column:
    return F.struct(re.alias("re"), im.alias("im"))


_FC_BINARY: dict[str, BinaryOp] = {}


def _fc_binop(plain: str, fn) -> BinaryOp:
    op = binary_op(plain + "_FC", fn)
    _FC_BINARY[plain] = op
    return op


def _fc_div(a: Column, b: Column) -> Column:
    d = _re(b) * _re(b) + _im(b) * _im(b)
    return _fc(
        (_re(a) * _re(b) + _im(a) * _im(b)) / d,
        (_im(a) * _re(b) - _re(a) * _im(b)) / d,
    )


_fc_binop("PLUS", lambda a, b: _fc(_re(a) + _re(b), _im(a) + _im(b)))
_fc_binop("MINUS", lambda a, b: _fc(_re(a) - _re(b), _im(a) - _im(b)))
_fc_binop("RMINUS", lambda a, b: _fc(_re(b) - _re(a), _im(b) - _im(a)))
_fc_binop(
    "TIMES",
    lambda a, b: _fc(
        _re(a) * _re(b) - _im(a) * _im(b), _re(a) * _im(b) + _im(a) * _re(b)
    ),
)
_fc_binop("DIV", _fc_div)
_fc_binop("RDIV", lambda a, b: _fc_div(b, a))
_fc_binop("FIRST", lambda a, b: a)
_fc_binop("SECOND", lambda a, b: b)
_fc_binop("ANY", lambda a, b: a)
# PAIR = 1+0i; built from the operand so the struct keeps the operand's
# field width (a double literal inside an FC32 matrix would change the
# value schema mid-plan)
_fc_binop("PAIR", lambda a, b: _fc(_re(a) * 0 + 1, _im(a) * 0))

_FC_UNARY: dict[str, UnaryOp] = {}


def _fc_unop(plain: str, fn, out_typ: str | None = None) -> UnaryOp:
    op = unary_op(plain + "_FC", fn)
    if out_typ is not None:
        # frozen dataclass: annotate the result type out-of-band; apply()
        # consults getattr(op, "out_typ", None) to retype the output
        object.__setattr__(op, "out_typ", out_typ)
    _FC_UNARY[plain] = op
    return op


_fc_unop("IDENTITY", lambda c: c)
_fc_unop("AINV", lambda c: _fc(-_re(c), -_im(c)))
_fc_unop(
    "MINV",
    lambda c: _fc(
        _re(c) / (_re(c) * _re(c) + _im(c) * _im(c)),
        -_im(c) / (_re(c) * _re(c) + _im(c) * _im(c)),
    ),
)
_fc_unop("ONE", lambda c: _fc(_re(c) * 0 + 1, _im(c) * 0))
_fc_unop("CONJ", lambda c: _fc(_re(c), -_im(c)))
# real-valued projections (reference GxB_CREAL/CIMAG/CARG/ABS → FP)
_fc_unop("CREAL", _re, out_typ="FP64")
_fc_unop("CIMAG", _im, out_typ="FP64")
_fc_unop("CARG", lambda c: F.atan2(_im(c), _re(c)), out_typ="FP64")
_fc_unop(
    "ABS", lambda c: F.sqrt(_re(c) * _re(c) + _im(c) * _im(c)), out_typ="FP64"
)
# plain-name aliases for the inherently-complex ops (the reference
# exposes CONJ/CREAL/CIMAG/CARG only for FC types)
for _n in ("CONJ", "CREAL", "CIMAG", "CARG"):
    _UNARY[_n] = _FC_UNARY[_n]

_FC_MONOID: dict[str, Monoid] = {}
_FC_MONOID["PLUS"] = monoid(
    "PLUS_FC",
    lambda c: F.struct(F.sum(_re(c)).alias("re"), F.sum(_im(c)).alias("im")),
    complex(0),
    _FC_BINARY["PLUS"],
)
_FC_MONOID["ANY"] = monoid("ANY_FC", F.first, None, _FC_BINARY["ANY"])

_FC_SEMIRING: dict[str, Semiring] = {}
for _add, _mul in (
    ("PLUS", "TIMES"),
    ("PLUS", "FIRST"),
    ("PLUS", "SECOND"),
    ("PLUS", "PAIR"),
    ("ANY", "FIRST"),
    ("ANY", "SECOND"),
    ("ANY", "PAIR"),
):
    _FC_SEMIRING[f"{_add}_{_mul}"] = semiring(
        f"{_add}_{_mul}_FC", _FC_MONOID[_add], _FC_BINARY[_mul]
    )


def typed_binary_op(op, typ: str) -> BinaryOp:
    """Resolve a binary op for a value type: complex operands dispatch
    plain names to the ``*_FC`` family (the reference types each op per
    scalar type; our registry is name-keyed, so FC dispatch happens at
    resolution time). Unsupported names raise with the FC inventory."""
    if not isinstance(op, str):
        return op
    key = op.upper()
    if typ.upper() in ("FC32", "FC64"):
        if key.endswith("_FC"):
            key = key[:-3]
        if key not in _FC_BINARY:
            raise NotImplementedError(
                f"binary op {op!r} is not defined for complex {typ}; "
                f"available: {sorted(_FC_BINARY)}"
            )
        return _FC_BINARY[key]
    return binary_op(op)


def typed_unary_op(op, typ: str) -> UnaryOp:
    if not isinstance(op, str):
        return op
    key = op.upper()
    if typ.upper() in ("FC32", "FC64"):
        if key.endswith("_FC"):
            key = key[:-3]
        if key not in _FC_UNARY:
            raise NotImplementedError(
                f"unary op {op!r} is not defined for complex {typ}; "
                f"available: {sorted(_FC_UNARY)}"
            )
        return _FC_UNARY[key]
    return unary_op(op)


def typed_monoid(m, typ: str) -> Monoid:
    if not isinstance(m, str):
        return m
    key = m.upper()
    if typ.upper() in ("FC32", "FC64"):
        if key.endswith("_FC"):
            key = key[:-3]
        if key not in _FC_MONOID:
            raise NotImplementedError(
                f"monoid {m!r} is not defined for complex {typ}; "
                f"available: {sorted(_FC_MONOID)}"
            )
        return _FC_MONOID[key]
    return monoid(m)


def typed_semiring(s, typ: str) -> Semiring:
    if not isinstance(s, str):
        return s
    key = s.upper()
    if typ.upper() in ("FC32", "FC64"):
        if key.endswith("_FC"):
            key = key[:-3]
        if key not in _FC_SEMIRING:
            raise NotImplementedError(
                f"semiring {s!r} is not defined for complex {typ}; "
                f"available: {sorted(_FC_SEMIRING)}"
            )
        return _FC_SEMIRING[key]
    return semiring(s)
