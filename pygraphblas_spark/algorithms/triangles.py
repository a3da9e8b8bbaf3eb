"""Triangle counting — masked lower-triangular semiring multiply.

Reference forms (``demo/Triangle-Counting.ipynb`` cells 2-4,
``demo/TriangleCentrality.ipynb`` cell 17):

- Cohen:     ``L.mxm(U, mask=A).reduce_int() // 2``
- Sandia:    ``L.mxm(L, mask=L, semiring=PLUS_PAIR).reduce_int()``  ← ours

Two implementations:

- ``triangle_count_sandia``: literal Sandia form through the Matrix facade
  (mask-pushdown mxm) — parity demonstration, used by tests.
- ``triangle_count``: the scale path. Same algebra, but the orientation is
  by DEGREE, not raw vertex id: edges point low-degree → high-degree
  (ties by id). This bounds every vertex's out-list by O(√m), which caps
  the wedge explosion at hub vertices — the skewed self-join the north
  rule calls out (SURVEY.md §7.3). The count is identical (each triangle
  is counted exactly once, at its unique degree-ordered orientation).

Plan shape: one self-join on the wedge pivot + one semi-join against the
edge set + a global count — three shuffles total, all with map-side
partial aggregation, no iteration, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrized_distinct(edges: DataFrame) -> DataFrame:
    """Undirected edge set: both orientations, no self-loops, distinct."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def triangle_count(edges: DataFrame, strategy: str = "auto") -> int:
    """Exact global triangle count of the undirected graph of ``edges``.

    Degree-ordered orientation + wedge close: for each oriented wedge
    u→v, u→w (v<w in the order), a triangle iff v→w is an oriented edge.

    ``strategy``: 'auto' | 'incore' | 'blocked' | 'join'. Auto picks the
    CSR kernel tiers (kernels/tri_csr.py) when pair keys pack into
    int64: in-core numpy below ``INCORE_MAX_NNZ`` symmetrized edges in
    local mode, the blocked mapInArrow kernel above it; the DataFrame
    join plan remains for un-packable ids or very large oriented sets.
    """
    from pygraphblas_spark.kernels.csr_dense import INCORE_MAX_NNZ
    from pygraphblas_spark.kernels import tri_csr

    if strategy in ("auto", "incore", "blocked"):
        spark = edges.sparkSession
        e = edges.select("src", "dst").persist()
        mx = e.agg(F.max("src"), F.max("dst"), F.count(F.lit(1))).first()
        if mx[0] is None:
            e.unpersist()
            return 0
        n = int(max(mx[0], mx[1])) + 1
        packable = n < (1 << 31)  # n*n must stay inside int64
        local = spark.sparkContext.master.startswith("local")
        if packable:
            nnz = int(mx[2])
            if strategy == "incore" or (
                strategy == "auto" and local and 2 * nnz <= INCORE_MAX_NNZ
            ):
                tbl = e.toArrow()
                e.unpersist()
                return tri_csr.triangle_count_incore(
                    tbl.column("src").to_numpy(zero_copy_only=False),
                    tbl.column("dst").to_numpy(zero_copy_only=False),
                    n,
                    # size the numpy pool by the SESSION's parallelism,
                    # not the machine's — a local[2] session must do
                    # 2-way work (scaling probes measure this honestly)
                    threads=min(16, spark.sparkContext.defaultParallelism),
                )
            if strategy == "blocked" or (
                strategy == "auto" and 2 * nnz <= tri_csr.BLOCKED_MAX_ORIENTED
            ):
                try:
                    return tri_csr.triangle_count_blocked(e, n)
                except tri_csr.BlockedIndexTooLarge:
                    # cluster without a shared staging dir, index too
                    # big for the driver — the pure-shuffle join plan
                    # below is the scale-safe owner of that regime
                    if strategy == "blocked":
                        raise
                finally:
                    e.unpersist()
        e.unpersist()
        if strategy != "auto":
            raise ValueError(
                f"triangle_count strategy {strategy!r} needs ids packable "
                f"into int64 pair keys (n={n})"
            )

    sym = _symmetrized_distinct(edges)

    # degree-ordered relabel: rank = (degree, id) dense ordering
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # orient each undirected edge from lower (deg, id) to higher (deg, id)
    with_deg = (
        sym.join(deg.withColumnRenamed("src", "u").withColumnRenamed("deg", "du"),
                 sym["src"] == F.col("u"))
        .join(deg.withColumnRenamed("src", "v").withColumnRenamed("deg", "dv"),
              sym["dst"] == F.col("v"))
        .select("src", "dst", "du", "dv")
    )
    # rank = the total order (degree, id); oriented edges go rank-upward,
    # so an out-list is bounded by O(√m) even at hubs
    oriented = with_deg.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", F.struct(F.col("dv"), F.col("dst")).alias("rank"))
    oriented = oriented.persist()
    oriented.count()

    # wedges at pivot u: out-neighbor pairs (v, w) emitted once, in rank
    # order — the closing edge v→w can then only exist in that direction
    a = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("rank").alias("rv"))
    b = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("rank").alias("rw"))
    wedges = a.join(b, on="u").filter(F.col("rv") < F.col("rw")).select("v", "w")

    closed = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        on=["v", "w"],
        how="inner",
    )
    n = closed.count()
    oriented.unpersist()
    return n


def triangle_count_sandia(L) -> int:
    """Literal reference Sandia form: ``L.mxm(L, mask=L, PLUS_PAIR)``
    summed (``demo/TriangleCentrality.ipynb`` cell 17). ``L`` is a
    Matrix holding the strictly-lower-triangular half of the adjacency
    pattern (``A.tril(-1)``)."""
    c = L.mxm(L, mask=L, semiring="PLUS_PAIR")
    return c.reduce_int()
