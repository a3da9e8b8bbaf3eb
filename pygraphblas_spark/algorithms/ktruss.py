"""K-truss — masked support-count loop, straight from the reference demo.

Reference (``demo/K-Truss.ipynb`` cell 2):

    while True:
        C = A.mxm(A, semiring=UINT32.PLUS_LAND, mask=A)   # edge support
        keep = C.select('>=', k-2)
        if keep.nvals == A.nvals: return keep
        A = keep.pattern()

The support of edge (u,v) is |N(u) ∩ N(v)| — computed by the masked
semiring product itself (PLUS_LAND over the adjacency pattern), mask
pushdown keeping it O(wedges-over-mask). Written against our Matrix
facade exactly as the reference writes against pygraphblas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.matrix import Matrix


def k_truss(edges: DataFrame, k: int, max_iters: int = 50) -> DataFrame:
    """Edges of the k-truss of the undirected simple graph of ``edges``:
    every surviving edge participates in ≥ k-2 triangles among surviving
    edges. Returns (src, dst, support) with both orientations."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    mx = sym.agg(F.greatest(F.max("src"), F.max("dst"))).first()[0]
    n = int(mx) + 1 if mx is not None else 0
    a = Matrix.from_edge_df(sym.withColumn("val", F.lit(1)), n, n, "INT64")

    nvals = a.nvals
    for _ in range(max_iters):
        c = a.mxm(a, mask=a, semiring="PLUS_LAND")
        keep = c.select(">=", k - 2)
        keep.df = keep.df.localCheckpoint(eager=True)  # truncate loop lineage
        new_nvals = keep.nvals
        if new_nvals == nvals:
            return keep.df.select("src", "dst", F.col("val").alias("support"))
        nvals = new_nvals
        a = keep.pattern("INT64")
    return keep.df.select("src", "dst", F.col("val").alias("support"))
