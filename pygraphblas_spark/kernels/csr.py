"""Per-partition CSR SpMV kernel — iterative sparse gather-scatter as a
vectorized Arrow UDF (north-star requirement; reference boundary analog:
``Matrix.to_arrays``/``npI/npJ/npV`` zero-copy numpy views,
``pygraphblas/matrix.py:1475-1605``).

Shape:

- edges and the rank/frontier vector are co-partitioned by
  ``block = src mod B`` / ``id mod B`` (dense vertex ids → balanced
  blocks; B ≈ shuffle partitions);
- a **cogroup** ``applyInPandas`` receives each block's edge rows and its
  matching vector slice as pandas frames (Arrow batches, zero per-row
  Python);
- inside the kernel, numpy does the gather (``w[src]`` via an index map)
  and the scatter (``np.bincount`` over dst codes — the CSR-compression
  step: ``np.unique(dst, return_inverse)`` is exactly a CSC column
  pointer build);
- per-block partial sums then reduce with one final groupBy — map-side
  combine over blocks, same as the join path's partial agg.

The kernel computes the PLUS_SECOND semiring product (PageRank's SpMV);
``mul='times'`` switches to PLUS_TIMES using the edge values. Results are
bit-identical to the join path up to float summation order; tests compare
at 1e-12.

When to prefer this over the join path: when the vector is dense (|v| ≈
|V|) and re-shuffles every iteration anyway, the cogroup does one shuffle
of each side per iteration — same as the join — but the aggregation
happens in numpy at memory bandwidth instead of through the codegen hash
agg. Measure per workload (bench.py covers both).
"""

from __future__ import annotations

from typing import Iterator, Literal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spmv_csr(
    edges: DataFrame,
    v: DataFrame,
    num_blocks: int = 32,
    mul: Literal["second", "times"] = "second",
) -> DataFrame:
    """y[dst] = Σ_src edges(src,dst) ⊗ v[src], ⊗ ∈ {SECOND, TIMES}.

    ``edges``: (src, dst[, val]); ``v``: (id, val). Returns (id, val).
    """
    use_val = mul == "times"
    ecols = ["src", "dst"] + (["val"] if use_val else [])
    e = edges.select(*ecols).withColumn(
        "block", F.pmod(F.col("src"), F.lit(num_blocks))
    )
    w = v.select("id", "val").withColumn(
        "block", F.pmod(F.col("id"), F.lit(num_blocks))
    )

    def kernel(edf: pd.DataFrame, wdf: pd.DataFrame) -> pd.DataFrame:
        if edf.empty or wdf.empty:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "val": pd.Series(dtype="float64")})
        src = edf["src"].to_numpy()
        dst = edf["dst"].to_numpy()
        # gather: w[src] via a positional index map (vectorized)
        wmap = pd.Series(
            wdf["val"].to_numpy(dtype="float64"), index=wdf["id"].to_numpy()
        )
        gathered = wmap.reindex(src).to_numpy()
        ok = ~np.isnan(gathered)
        if use_val:
            gathered = gathered * edf["val"].to_numpy(dtype="float64")
        if not ok.all():
            src, dst, gathered = src[ok], dst[ok], gathered[ok]
        if len(dst) == 0:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "val": pd.Series(dtype="float64")})
        # scatter: CSC-style compression of dst + segmented sum
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=gathered)
        return pd.DataFrame({"id": uniq, "val": sums})

    partials = (
        e.groupby("block")
        .cogroup(w.groupby("block"))
        .applyInPandas(kernel, "id long, val double")
    )
    # cross-block reduce (a dst receives contributions from every src block)
    return partials.groupBy("id").agg(F.sum("val").alias("val"))


def pagerank_csr(
    edges: DataFrame,
    n: int | None = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    max_iters: int = 100,
    num_blocks: int = 32,
    checkpoint=None,
) -> DataFrame:
    """PageRank with the CSR-kernel SpMV — identical semantics to
    ``algorithms.pagerank`` (gap/prmark.py), different physical engine.
    Tested equal to the join path at 1e-9."""
    from pygraphblas_spark.plans.checkpoint import CheckpointManager

    spark = edges.sparkSession
    ckpt = checkpoint or CheckpointManager(algorithm="pagerank_csr")
    e = edges.select("src", "dst").persist()
    if n is None:
        mx = e.agg(F.max("src"), F.max("dst")).first()
        n = int(max(mx[0], mx[1])) + 1
    else:
        e.count()
    teleport = (1.0 - damping) / n
    d = e.groupBy("src").agg((F.count(F.lit(1)) / damping).alias("d")).persist()
    d.count()

    r = spark.range(n).select("id", F.lit(1.0 / n).alias("rank"))
    r = ckpt.cut(r)
    for it in range(max_iters):
        t = r
        w = t.join(d, t["id"] == d["src"], "inner").select(
            d["src"].alias("id"), (t["rank"] / d["d"]).alias("val")
        )
        contrib = spmv_csr(e, w, num_blocks=num_blocks, mul="second")
        r_new = (
            spark.range(n)
            .join(contrib, "id", "left_outer")
            .select(
                "id",
                (F.lit(teleport) + F.coalesce(F.col("val"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        r_new = ckpt.cut(r_new)
        rdiff = (
            t.join(r_new, "id")
            .agg(F.sum(F.abs(t["rank"] - r_new["rank"])))
            .first()[0]
        )
        states = ckpt.save(it + 1, {"rank": r_new}, {"rdiff": rdiff, "n": n})
        r = states["rank"]
        if rdiff <= tol:
            break
    e.unpersist()
    d.unpersist()
    return r.select("id", "rank")
