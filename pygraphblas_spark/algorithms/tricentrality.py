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


def triangle_centrality(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle centrality of the undirected graph of
    ``edges`` → DataFrame ``(id: long, centrality: double)`` over every
    vertex that appears in an edge. Returns all-zero centralities if the
    graph has no triangles (k = 0 guard)."""
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
        out = verts.select("id", F.lit(0.0).alias("centrality"))
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
    sym.unpersist()
    o.unpersist()
    et_sym.unpersist()
    return out


def degree_centrality(edges: DataFrame) -> DataFrame:
    """Degree centrality — reference ``demo/Centrality.ipynb`` cell 3::

        v = Vector.dense(A.type, A.nrows, 1.0)
        with FP64.PLUS_PAIR: return (A @ v) / A.nvals

    i.e. out-degree over the (symmetrized-as-given) edge set, divided by
    the total number of stored edges. One groupBy — scan-speed."""
    e = edges.select("src", "dst")
    nvals = e.count()
    return e.groupBy(F.col("src").alias("id")).agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(nvals))).alias(
            "centrality"
        )
    )
