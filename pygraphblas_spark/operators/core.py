"""Cross-cutting operator semantics: masks, accumulators, element-wise joins.

These implement the GraphBLAS output-modification pipeline that EVERY
reference operator funnels through (``pygraphblas/matrix.py:2380-2399``
``_get_args`` + the C-side write rule):

    Z = accum is None ? T : accum(C_old, T)       # union merge
    C_new[k] = Z[k]        where mask(k)          # masked write
    C_new[k] = C_old[k]    where !mask(k), unless REPLACE
    C_new[k] absent        where !mask(k), if REPLACE

Spark mapping: value masks are a filtered semi-join, complement masks an
anti-join (reference descriptor semantics ``descriptor.py:22-51``), accum is
a full-outer join with a coalesce-combine, and the un-replaced remainder is
an anti-join of the old output against the mask. All pure DataFrame ops —
Catalyst sees one plan and can reorder/broadcast freely.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.algebra import BinaryOp, current_accum
from pygraphblas_spark.descriptor import Descriptor, NULL, resolve

VAL = "val"


def _truthy_mask(mask: DataFrame, structural: bool) -> DataFrame:
    """A value mask admits cells whose stored value casts to true; a
    structural mask admits every stored cell (descriptor flag S,
    reference ``descriptor.py:36-40``)."""
    if structural or VAL not in mask.columns:
        return mask
    return mask.filter(F.col(VAL).cast("boolean"))


def apply_mask(
    df: DataFrame,
    mask: Optional[DataFrame],
    keys: Sequence[str],
    complement: bool = False,
    structural: bool = False,
) -> DataFrame:
    """Keep rows of ``df`` whose keys are present (semi) / absent (anti)
    in the truthy mask."""
    if mask is None:
        return df
    m = _truthy_mask(mask, structural).select(*keys)
    how = "left_anti" if complement else "left_semi"
    return df.join(m, on=list(keys), how=how)


def _ewise_pos(keys: Sequence[str]) -> tuple:
    """(a_src, a_dst, b_src, b_dst) coordinates for positional binops in
    element-wise joins — both operands share the join keys; a vector's
    single key doubles as its row and column index."""
    c0 = F.col(keys[0])
    c1 = F.col(keys[1]) if len(keys) > 1 else c0
    return (c0, c1, c0, c1)


def ewise_add(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    op: BinaryOp,
) -> DataFrame:
    """Set-union element-wise op (reference ``Matrix.eadd``
    ``matrix.py:1103-1264``): op applied where both present, lone entries
    pass through unchanged. full_outer join + 3-way case."""
    keys = list(keys)
    an = a.select(*keys, F.col(VAL).alias("__a"))
    bn = b.select(*keys, F.col(VAL).alias("__b"))
    j = an.join(bn, on=keys, how="full_outer")
    both = F.col("__a").isNotNull() & F.col("__b").isNotNull()
    val = (
        F.when(both, op(F.col("__a"), F.col("__b"), *_ewise_pos(keys)))
        .when(F.col("__a").isNotNull(), F.col("__a"))
        .otherwise(F.col("__b"))
    )
    return j.select(*keys, val.alias(VAL))


def ewise_mult(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    op: BinaryOp,
) -> DataFrame:
    """Set-intersection element-wise op (reference ``Matrix.emult``
    ``matrix.py:1266-1415``): inner join, op on matching entries only."""
    keys = list(keys)
    an = a.select(*keys, F.col(VAL).alias("__a"))
    bn = b.select(*keys, F.col(VAL).alias("__b"))
    return an.join(bn, on=keys, how="inner").select(
        *keys, op(F.col("__a"), F.col("__b"), *_ewise_pos(keys)).alias(VAL)
    )


def accum_merge(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    accum: BinaryOp,
) -> DataFrame:
    """Z = accum(C_old, T): union merge where the accumulator combines
    collisions and lone entries pass through — exactly eadd semantics
    (the reference routes accum through the same C machinery)."""
    return ewise_add(old, new, keys, accum)


def finalize(
    old: Optional[DataFrame],
    new: DataFrame,
    keys: Sequence[str],
    mask: Optional[DataFrame] = None,
    accum: Optional[BinaryOp] = None,
    desc: Descriptor = NULL,
) -> DataFrame:
    """Apply the full GraphBLAS write rule (module docstring) to produce
    the final output DataFrame.

    Unspecified ``accum`` / ``desc`` fall back to the active
    ``with Accum(...):`` / ``with <desc>:`` scopes (the reference's
    ``_get_args``, matrix.py:2380-2399)."""
    keys = list(keys)
    if accum is None:
        accum = current_accum.get()
    desc = resolve(desc)
    z = new if (accum is None or old is None) else accum_merge(old, new, keys, accum)
    if mask is None:
        # No mask: Z replaces C entirely (replace flag is a no-op).
        return z
    masked = apply_mask(z, mask, keys, desc.mask_complement, desc.mask_structural)
    if desc.replace or old is None:
        return masked
    # Old values survive outside the mask.
    keep_old = apply_mask(
        old, mask, keys, not desc.mask_complement, desc.mask_structural
    )
    return masked.unionByName(keep_old)


def coo_equal(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> bool:
    """Whole-object equality (reference ``Matrix.iseq`` ``matrix.py:1436``):
    same pattern, same values. Action — used by tests and convergence checks.

    NaN-safe via eqNullSafe after an outer join.
    """
    keys = list(keys)
    an = a.select(*keys, F.col(VAL).alias("__a"))
    bn = b.select(*keys, F.col(VAL).alias("__b"))
    j = an.join(bn, on=keys, how="full_outer")
    mismatched = j.filter(~F.col("__a").eqNullSafe(F.col("__b"))).limit(1).count()
    return mismatched == 0
