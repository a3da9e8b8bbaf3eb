"""Triangle centrality — Burkhardt's TC1 formulation, Spark-first.

Reference: ``demo/TriangleCentrality.ipynb`` (TC1, cell 4)::

    def TC1(A):
        I = Matrix.identity(A.type, A.nrows)
        T = A.mxm(A, mask=A)
        y = T.reduce_vector()
        k = y.reduce_float()
        T_hat = T.pattern(A.type)
        X = (3 * A) - (2 * T_hat) + I
        return (1/k) * (X @ y)

Semantics, spelled out over the undirected simple graph of ``edges``:

- ``T[i,j]`` (for adjacent i,j) = number of triangles through edge (i,j)
  (= common neighbors of i and j).
- ``y[i] = Σ_j T[i,j] = 2 · tri(i)`` (each triangle at i is seen through
  its two incident edges).
- ``k = Σ_i y[i] = 6 · total_triangles``.
- centrality(v) = ``(3·Σ_{j∈N(v)} y_j − 2·Σ_{j∈N_T(v)} y_j + y_v) / k``
  where ``N_T(v)`` are the neighbors that share ≥1 triangle with v.

This module re-derives TC1 as a pure DataFrame plan rather than chaining
the Matrix facade (which works too — the tests cross-check both): the
per-edge triangle counts come from ONE degree-ordered wedge self-join
(the same O(m^1.5)-bounded plan as ``triangles.triangle_count``), then
each closed triangle is fanned back to its 3 edges and aggregated — the
``mask=A`` mxm never materializes the unmasked product. The tail is two
keyed aggregations and one join of per-vertex scalars; every shuffle
carries (vertex_id, double) rows only.

Scale notes (100 TB test): the wedge join is bounded by degree
orientation (hub out-lists capped at O(√m)); the triangle→edge fan-out
is aggregated with map-side partials (3 rows per triangle pre-combine);
``k`` is a scalar reduce. No collects, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygraphblas_spark.algorithms.triangles import _symmetrized_distinct


def _oriented_by_degree(sym: DataFrame) -> DataFrame:
    """Orient the symmetrized edge set low (degree, id) → high: each
    undirected edge appears exactly once, and out-lists are bounded by
    O(√m) — the standard hub-skew cap (SURVEY.md §7.3). Returns
    ``(src, dst, rank)`` where ``rank`` is the destination's total-order
    struct, used to emit each wedge once in rank order."""
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    with_deg = (
        sym.join(
            deg.withColumnRenamed("src", "u").withColumnRenamed("deg", "du"),
            sym["src"] == F.col("u"),
        )
        .join(
            deg.withColumnRenamed("src", "v").withColumnRenamed("deg", "dv"),
            sym["dst"] == F.col("v"),
        )
        .select("src", "dst", "du", "dv")
    )
    return with_deg.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", F.struct(F.col("dv"), F.col("dst")).alias("rank"))


def _tricentrality_incore(spark, e: DataFrame) -> DataFrame:
    """In-core tier: one Arrow pull, then the whole TC1 computation in
    vectorized numpy — same degree-ordered wedge enumeration as
    kernels/tri_csr.py, extended to keep per-vertex triangle counts and
    the triangle-support edge pattern. All sums are integer-valued
    doubles (exact), so results are bit-identical to the DataFrame plan."""
    import numpy as np

    tbl = e.toArrow()
    s = tbl.column("src").to_numpy(zero_copy_only=False).astype("int64")
    d = tbl.column("dst").to_numpy(zero_copy_only=False).astype("int64")
    keep = s != d
    s, d = s[keep], d[keep]
    ids, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    n = len(ids)
    empty_schema = "id long, centrality double"
    if n == 0:
        return spark.createDataFrame([], empty_schema)
    s2, d2 = inv[: len(s)], inv[len(s):]

    # symmetrize + dedup via packed keys (n < 2^31 guaranteed by caller)
    keys = np.unique(np.concatenate([s2 * n + d2, d2 * n + s2]))
    ss, dd = keys // n, keys % n
    deg = np.bincount(ss, minlength=n)

    # (deg, id)-rank relabel; orient rank-upward
    order = np.lexsort((np.arange(n), deg))
    rank = np.empty(n, dtype="int64")
    rank[order] = np.arange(n)
    rs, rd = rank[ss], rank[dd]
    fwd = rs < rd
    ek = rs[fwd] * n + rd[fwd]
    ek.sort()
    osrc, odst = ek // n, ek % n
    ptr = np.zeros(n + 1, "int64")
    np.cumsum(np.bincount(osrc, minlength=n), out=ptr[1:])

    # chunked wedge enumeration + closure probe (triangular decode as in
    # tri_csr._closures_for_segments)
    cnt = np.diff(ptr)
    wper = cnt * (cnt - 1) // 2
    seg_end = np.cumsum(wper)
    seg_begin = seg_end - wper
    W = int(seg_end[-1]) if n else 0
    tri_v = np.zeros(n, "int64")
    et_parts = []
    CH = 8_000_000
    for pos in range(0, W, CH):
        hi = min(pos + CH, W)
        s0 = int(np.searchsorted(seg_end, pos, side="right"))
        s1 = int(np.searchsorted(seg_begin, hi, side="left"))
        segs = np.arange(s0, s1)
        c = np.minimum(seg_end[segs], hi) - np.maximum(seg_begin[segs], pos)
        seg_of = np.repeat(segs, c)
        woff = np.arange(pos, hi, dtype="int64") - seg_begin[seg_of]
        j = ((1.0 + np.sqrt(1.0 + 8.0 * woff.astype("float64"))) / 2.0).astype(
            "int64"
        )
        # float inverse can land one off on exact triangulars — correct it
        j -= j * (j - 1) // 2 > woff
        i = woff - j * (j - 1) // 2
        a = odst[ptr[seg_of] + i]
        b = odst[ptr[seg_of] + j]
        key = a * n + b
        idx = np.searchsorted(ek, key)
        idx[idx >= len(ek)] = len(ek) - 1
        closed = ek[idx] == key
        if not closed.any():
            continue
        u, a, b = osrc[ptr[seg_of[closed]]], a[closed], b[closed]
        tri_v += np.bincount(u, minlength=n)
        tri_v += np.bincount(a, minlength=n)
        tri_v += np.bincount(b, minlength=n)
        et_parts.append(np.unique(np.concatenate([u * n + a, u * n + b, key[closed]])))

    y = 2.0 * tri_v
    k = float(y.sum())
    if k == 0.0:
        cent = np.zeros(n)
    else:
        ny = np.bincount(rank[ss], weights=y[rank[dd]], minlength=n)
        if et_parts:
            et = np.unique(np.concatenate(et_parts))
            et_s, et_d = et // n, et % n
            ty = np.bincount(et_s, weights=y[et_d], minlength=n) + np.bincount(
                et_d, weights=y[et_s], minlength=n
            )
        else:
            ty = np.zeros(n)
        cent = (3.0 * ny - 2.0 * ty + y) / k

    import pandas as pd

    out = pd.DataFrame({"id": ids, "centrality": cent[rank]})
    return spark.createDataFrame(out, empty_schema)


#: in-core tier bound — reuse the dense-kernel sizing rationale
def _incore_ok(spark, nnz: int, n: int) -> bool:
    from pygraphblas_spark.kernels.csr_dense import INCORE_MAX_NNZ

    return (
        spark.sparkContext.master.startswith("local")
        and 2 * nnz <= INCORE_MAX_NNZ
        and n < (1 << 31)
    )


def triangle_centrality(edges: DataFrame, strategy: str = "auto") -> DataFrame:
    """Per-vertex triangle centrality of the undirected graph of
    ``edges`` → DataFrame ``(id: long, centrality: double)`` over every
    vertex that appears in an edge. Returns all-zero centralities if the
    graph has no triangles (k = 0 guard).

    ``strategy``: 'auto' | 'incore' | 'join'. Auto runs the vectorized
    numpy tier when the symmetrized graph fits in-core in local mode
    (same tiering as ``triangle_count``); the DataFrame join plan is the
    cluster-scale path."""
    if strategy in ("auto", "incore"):
        spark = edges.sparkSession
        e = edges.select("src", "dst")
        if strategy == "incore":
            return _tricentrality_incore(spark, e)
        mx = e.agg(F.max("src"), F.max("dst"), F.count(F.lit(1))).first()
        if mx[0] is not None:
            n = int(max(mx[0], mx[1])) + 1
            if _incore_ok(spark, int(mx[2]), n):
                return _tricentrality_incore(spark, e)

    sym = _symmetrized_distinct(edges).persist()

    o = _oriented_by_degree(sym)
    o.persist()

    # one wedge self-join on the pivot + close against the oriented set;
    # wedges emit in rank order so the closing edge can only exist in
    # that one orientation
    ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("rank").alias("rb"))
    ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.col("rank").alias("rc"))
    w = ab.join(ac, "a").filter(F.col("rb") < F.col("rc")).select("a", "b", "c")
    tri = w.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
    )

    # fan each triangle to its 3 edges (canonical id-order key), aggregate
    pair = lambda u, v: F.struct(
        F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
    )
    edge_t = (
        tri.select(
            F.explode(
                F.array(
                    pair(F.col("a"), F.col("b")),
                    pair(F.col("a"), F.col("c")),
                    pair(F.col("b"), F.col("c")),
                )
            ).alias("e")
        )
        .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
    )
    # both orientations of the triangle-support pattern, with y contribution
    et_sym = edge_t.unionByName(
        edge_t.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("t")
        )
    ).persist()

    y = et_sym.groupBy(F.col("u").alias("id")).agg(F.sum("t").alias("y"))
    k = y.agg(F.sum("y")).first()[0]

    verts = sym.select(F.col("src").alias("id")).distinct()
    if not k:
        out = verts.select("id", F.lit(0.0).alias("centrality")).localCheckpoint()
        sym.unpersist()
        o.unpersist()
        et_sym.unpersist()
        return out

    # Σ_{j∈N(v)} y_j over the full adjacency
    adj_sum = (
        sym.join(y.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("y").alias("ny"))
    )
    # Σ_{j∈N_T(v)} y_j over the triangle-support pattern only
    tri_sum = (
        et_sym.select(F.col("u").alias("id"), F.col("v").alias("dst"))
        .join(y.withColumnRenamed("id", "dst"), "dst")
        .groupBy("id")
        .agg(F.sum("y").alias("ty"))
    )

    out = (
        verts.join(y, "id", "left")
        .join(adj_sum, "id", "left")
        .join(tri_sum, "id", "left")
        .select(
            "id",
            (
                (
                    3.0 * F.coalesce(F.col("ny"), F.lit(0.0))
                    - 2.0 * F.coalesce(F.col("ty"), F.lit(0.0))
                    + F.coalesce(F.col("y"), F.lit(0.0))
                )
                / F.lit(float(k))
            ).alias("centrality"),
        )
    )
    # materialize (vertex-count-sized) before dropping the cached
    # intermediates — otherwise the caller's action recomputes the whole
    # wedge-join lineage from scratch
    out = out.localCheckpoint()
    sym.unpersist()
    o.unpersist()
    et_sym.unpersist()
    return out


def degree_centrality(edges: DataFrame) -> DataFrame:
    """Degree centrality — reference ``demo/Centrality.ipynb`` cell 3::

        v = Vector.dense(A.type, A.nrows, 1.0)
        with FP64.PLUS_PAIR: return (A @ v) / A.nvals

    i.e. out-degree over the (symmetrized-as-given) edge set, divided by
    the total number of stored edges. ``A.nvals`` counts STORED entries —
    a Matrix built from duplicate (src, dst) rows stores one — so the
    edge rows are deduplicated first; duplicate input rows are collapsed,
    not counted as parallel edges. One distinct + one groupBy."""
    e = edges.select("src", "dst").distinct()
    nvals = e.count()
    return e.groupBy(F.col("src").alias("id")).agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(nvals))).alias(
            "centrality"
        )
    )
