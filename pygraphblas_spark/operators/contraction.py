"""Semiring contraction: mxm / mxv / vxm — the engine's heart.

Reference: ``Matrix.mxm`` (``pygraphblas/matrix.py:2401``), ``Matrix.mxv``
(``matrix.py:2586``), ``Vector.vxm`` (``vector.py:835``). A semiring
``(⊕, ⊗)`` generalizes matmul: ``C[i,j] = ⊕_k A[i,k] ⊗ B[k,j]``.

Spark shape: ``A ⋈ B on k`` (shuffle-hash / sort-merge / broadcast chosen
by Catalyst+AQE) then ``groupBy(i, j).agg(⊕(⊗))`` with map-side partial
aggregation for free.

Mask pushdown — the one optimization Catalyst will NOT do for us (SURVEY.md
§4): SuiteSparse's masked multiply computes *only* the output cells the
mask admits, which is what keeps ``L.mxm(L, mask=L)`` (triangle counting)
tractable. We replicate it by semi-joining the expanded wedge stream
``(i, k, j)`` against the mask keys *before* the aggregation, so unmasked
products never enter the agg hash table, and additionally pre-pruning each
input to rows whose i (resp. j) appears in the mask at all — that first
prune is a broadcast semi-join when the mask's key set is small.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.algebra import BinaryOp, Semiring
from pygraphblas_spark.descriptor import Descriptor, NULL, resolve
from pygraphblas_spark.operators.core import VAL, _truthy_mask, finalize


def _oriented(df: DataFrame, transpose: bool) -> DataFrame:
    """T0/T1 descriptor: read the matrix in the other orientation — a pure
    column swap, zero cost (reference materializes nothing either,
    ``descriptor.py:150-152``)."""
    if not transpose:
        return df
    return df.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col(VAL)
    )


def mxm(
    a: DataFrame,
    b: DataFrame,
    semiring: Semiring,
    mask: Optional[DataFrame] = None,
    accum: Optional[BinaryOp] = None,
    desc: Descriptor = NULL,
    out: Optional[DataFrame] = None,
    mask_pushdown: bool = True,
) -> DataFrame:
    """C⟨mask⟩ ⊕= A ⊗.⊕ B over COO edge frames (src, dst, val)."""
    desc = resolve(desc)
    a = _oriented(a, desc.transpose0)
    b = _oriented(b, desc.transpose1)

    an = a.select(
        F.col("src").alias("__i"), F.col("dst").alias("__k"), F.col(VAL).alias("__a")
    )
    bn = b.select(
        F.col("src").alias("__k"), F.col("dst").alias("__j"), F.col(VAL).alias("__b")
    )

    push = mask is not None and mask_pushdown and not desc.mask_complement
    if push:
        mkeys = _truthy_mask(mask, desc.mask_structural).select(
            F.col("src").alias("__i"), F.col("dst").alias("__j")
        )
        # Pre-prune each input to rows that can contribute to ANY masked
        # cell — but only when the mask is a *different* relation: when
        # mask is one of the inputs (the triangle-count idiom
        # L.mxm(L, mask=L)) the prune is an identity and would only add
        # two distinct+semi-join shuffles per side.
        if mask is not a and mask is not b:
            an = an.join(mkeys.select("__i").distinct(), on="__i", how="left_semi")
            bn = bn.join(mkeys.select("__j").distinct(), on="__j", how="left_semi")

    joined = an.join(bn, on="__k")

    if push:
        # The SuiteSparse-style prune: only masked (i,j) products survive to
        # the aggregation.
        joined = joined.join(mkeys, on=["__i", "__j"], how="left_semi")

    # positional-op coordinates: A entry is (i, k), B entry is (k, j)
    pos = (F.col("__i"), F.col("__k"), F.col("__k"), F.col("__j"))
    agg = semiring.agg_expr(F.col("__a"), F.col("__b"), pos).alias(VAL)
    result = joined.groupBy("__i", "__j").agg(agg).select(
        F.col("__i").alias("src"), F.col("__j").alias("dst"), F.col(VAL)
    )
    return finalize(out, result, ["src", "dst"], mask, accum, desc)


def mxv(
    a: DataFrame,
    v: DataFrame,
    semiring: Semiring,
    mask: Optional[DataFrame] = None,
    accum: Optional[BinaryOp] = None,
    desc: Descriptor = NULL,
    out: Optional[DataFrame] = None,
    broadcast_vector: bool = False,
) -> DataFrame:
    """w⟨mask⟩ ⊕= A ⊗.⊕ v : w[i] = ⊕_k A[i,k] ⊗ v[k].

    This is SpMV — one PageRank/BFS/CC step (reference ``matrix.py:2586``;
    PageRank uses it with ``desc=T0`` at ``gap/prmark.py:22-23``).

    Physical plan: the edge frame is the big fixed side; the vector
    shuffles to it (or broadcasts when small — ``broadcast_vector`` forces
    the hint for frontier-style vectors that are known-small). With the
    edge frame pre-partitioned on the join key (see algorithms/), the big
    side does not re-shuffle across iterations.
    """
    desc = resolve(desc)
    a = _oriented(a, desc.transpose0)
    an = a.select(
        F.col("src").alias("__i"), F.col("dst").alias("__k"), F.col(VAL).alias("__a")
    )
    vn = v.select(F.col("id").alias("__k"), F.col(VAL).alias("__b"))
    if broadcast_vector:
        vn = F.broadcast(vn)

    if mask is not None and not desc.mask_complement:
        mkeys = _truthy_mask(mask, desc.mask_structural).select(
            F.col("id").alias("__i")
        )
        an = an.join(mkeys, on="__i", how="left_semi")

    joined = an.join(vn, on="__k")
    # positional-op coordinates: A entry (i, k), vector entry (k, k)
    pos = (F.col("__i"), F.col("__k"), F.col("__k"), F.col("__k"))
    agg = semiring.agg_expr(F.col("__a"), F.col("__b"), pos).alias(VAL)
    result = joined.groupBy("__i").agg(agg).select(F.col("__i").alias("id"), F.col(VAL))
    return finalize(out, result, ["id"], mask, accum, desc)


def vxm(
    v: DataFrame,
    a: DataFrame,
    semiring: Semiring,
    mask: Optional[DataFrame] = None,
    accum: Optional[BinaryOp] = None,
    desc: Descriptor = NULL,
    out: Optional[DataFrame] = None,
    broadcast_vector: bool = False,
) -> DataFrame:
    """w⟨mask⟩ ⊕= v ⊗.⊕ A : w[j] = ⊕_k v[k] ⊗ A[k,j] — left-multiply,
    ≡ mxv on Aᵀ (reference ``vector.py:835``; equivalence tested at
    ``tests/test_vector.py:310``). The ⊗ argument order is (v, A):
    v supplies the FIRST operand, A the SECOND. The T1 descriptor flag
    transposes A (A is input 1 of vxm)."""
    # v ⊗ A == (Aᵀ ⊗-swapped v); reuse mxv with operand-swapped semiring.
    desc = resolve(desc)
    mul = semiring.mul
    if mul.positional:
        # The flipped mxv joins Aᵀ (entry presented as (j, k)) with v (k).
        # Reconstruct the vxm-presented coordinates: FIRST = v at (k, k)
        # = (pos[2], pos[3]); SECOND = A at (k, j) = (pos[1], pos[0]) —
        # so ANY_SECONDI (BFS parent, reference demo) yields k.
        swapped_mul = BinaryOp(
            mul.name + "_SWAP",
            lambda x, y, ai, aj, bi, bj: mul(y, x, bi, bj, aj, ai),
            positional=True,
        )
    else:
        swapped_mul = BinaryOp(mul.name + "_SWAP", lambda x, y: mul(y, x))
    swapped = Semiring(
        semiring.name + "_SWAP",
        semiring.add,
        swapped_mul,
        agg_direct=(
            (lambda x, y: semiring.agg_direct(y, x)) if semiring.agg_direct else None
        ),
    )
    flip = Descriptor(
        transpose0=not desc.transpose1,
        mask_complement=desc.mask_complement,
        mask_structural=desc.mask_structural,
        replace=desc.replace,
    )
    return mxv(a, v, swapped, mask, accum, flip, out, broadcast_vector)
