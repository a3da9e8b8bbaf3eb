"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over edge tables
derived from the driver's testdata (sources/tpch_graph.py); each SQL-
expressible operator has a DuckDB oracle in ``oracle_sql()``. Iterative
algorithms (pagerank / cc / lpa / bfs / sssp) are registered rows-only.

Numeric discipline for value-hash parity: quantities are cast to BIGINT
(they are integral in the testdata) so sums are exact; float results are
avoided except where rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

# Shared edge CTE used by every oracle query (distinct order→part edges).
_E = "(SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem)"
# Quantity-valued matrices split by returnflag (integral values → exact).
_MA = (
    "(SELECT l_orderkey AS src, l_partkey AS dst, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS val "
    "FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1, 2)"
)
_MR = (
    "(SELECT l_orderkey AS src, l_partkey AS dst, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS val "
    "FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2)"
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pygraphblas_spark.sources.tpch_graph import order_part_edges

    return order_part_edges(spark, sf_dir)


def _qty_matrix(spark: SparkSession, sf_dir: str, flag: str):
    """Matrix of summed quantities per (order, part) for one returnflag."""
    from pygraphblas_spark.matrix import Matrix

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = (
        li.filter(F.col("l_returnflag") == flag)
        .groupBy(
            F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("val"))
    )
    mx = 1 << 40  # logical dims irrelevant for these queries
    return Matrix.from_edge_df(df, mx, mx, "INT64")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the order→part bipartite graph at sf0.001."""
    from pygraphblas_spark.algorithms import pagerank

    e = _edges(spark, SF0001)
    r = pagerank(e, damping=0.85, tol=1e-4, max_iters=50)
    return r.select("id", F.round(F.col("rank"), 9).alias("rank")).orderBy(
        F.desc("rank"), "id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pygraphblas_spark.matrix import Matrix
    from pygraphblas_spark.vector import Vector
    from pygraphblas_spark import descriptor

    def out_degree(spark, sf):
        # Matrix.out_degree ≡ reference matrix.py:3548
        e = _edges(spark, sf)
        m = Matrix.from_edge_df(e, 1 << 40, 1 << 40, "FP64")
        return m.out_degree().df.select(
            F.col("id"), F.col("val").alias("degree")
        )

    def in_degree(spark, sf):
        # reduce_vector with T0 (column-wise) ≡ reference matrix.py:1861
        e = _edges(spark, sf)
        m = Matrix.from_edge_df(e, 1 << 40, 1 << 40, "INT64").pattern("INT64")
        v = m.reduce_vector("PLUS", desc=descriptor.T0)
        return v.df.select("id", F.col("val").alias("degree"))

    def part_cooccurrence(spark, sf):
        # AᵀA with PLUS_PAIR semiring, upper off-diagonal — parts sharing
        # an order (mxm ≡ reference matrix.py:2401)
        e = _edges(spark, sf)
        m = Matrix.from_edge_df(e, 1 << 40, 1 << 40, "INT64")
        c = m.mxm(m, semiring="PLUS_PAIR", desc=descriptor.T0)
        return c.triu(1).df.select(
            F.col("src").alias("p1"), F.col("dst").alias("p2"), F.col("val").alias("n")
        )

    def eadd_union(spark, sf):
        # eadd PLUS: union-with-passthrough ≡ reference matrix.py:1103
        a = _qty_matrix(spark, sf, "A")
        r = _qty_matrix(spark, sf, "R")
        return a.eadd(r, "PLUS").df.select("src", "dst", F.col("val").alias("qty"))

    def emult_intersection(spark, sf):
        # emult TIMES: intersection ≡ reference matrix.py:1266
        a = _qty_matrix(spark, sf, "A")
        r = _qty_matrix(spark, sf, "R")
        return r.emult(a, "TIMES").df.select(
            "src", "dst", F.col("val").alias("prod")
        )

    def select_gt(spark, sf):
        # select('>', 30) ≡ reference matrix.py:2042
        a = _qty_matrix(spark, sf, "A")
        return a.select(">", 30).df.select("src", "dst", F.col("val").alias("qty"))

    def apply_scale(spark, sf):
        # apply_second TIMES ≡ reference matrix.py:2007
        a = _qty_matrix(spark, sf, "A")
        return a.apply_second("TIMES", 2).df.select(
            "src", "dst", F.col("val").alias("qty2")
        )

    def reduce_scalar(spark, sf):
        # full reduce ≡ reference matrix.py:1828
        a = _qty_matrix(spark, sf, "A")
        total = a.reduce_int()
        return spark.createDataFrame([(total,)], "total bigint")

    def mxv_spmv(spark, sf):
        # SpMV: parts-by-order quantities × order-count vector
        # (mxv ≡ reference matrix.py:2586); integral values → exact
        a = _qty_matrix(spark, sf, "A")
        ids = a.df.select(F.col("dst").alias("id")).distinct()
        v = Vector(ids.withColumn("val", F.lit(1)), 1 << 40, "INT64")
        r = a.mxv(v, semiring="PLUS_TIMES")  # r[src] = Σ_dst qty·1
        return r.df.select("id", F.col("val").alias("s"))

    def transpose_pattern(spark, sf):
        # transpose + pattern ≡ reference matrix.py:1003/887
        a = _qty_matrix(spark, sf, "A")
        return a.T.pattern("INT64").df.select("src", "dst", F.col("val").alias("one"))

    def tril_filter(spark, sf):
        # tril on the co-ordered part pair graph ≡ reference matrix.py:2142
        e = _edges(spark, sf)
        m = Matrix.from_edge_df(e, 1 << 40, 1 << 40, "INT64")
        return m.tril(0).df.select("src", "dst")

    def vector_eadd(spark, sf):
        # Vector.eadd PLUS of out-degrees of two edge sets
        from pygraphblas_spark.sources.tpch_graph import (
            customer_order_edges,
            order_part_edges,
        )

        d1 = (
            order_part_edges(spark, sf)
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("val"))
        )
        d2 = (
            customer_order_edges(spark, sf)
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("val"))
        )
        a = Vector(d1, 1 << 40, "INT64")
        b = Vector(d2, 1 << 40, "INT64")
        return a.eadd(b, "PLUS").df.select("id", F.col("val").alias("d"))

    def triangle_count_q(spark, sf):
        # exact triangles of the part co-occurrence graph (thresholded
        # n>=2 to bound density) — degree-ordered oriented count
        from pygraphblas_spark.algorithms import triangle_count

        e = _edges(spark, sf)
        m = Matrix.from_edge_df(e, 1 << 40, 1 << 40, "INT64")
        co = (
            m.mxm(m, semiring="PLUS_PAIR", desc=descriptor.T0)
            .select(">=", 2)
            .offdiag()
        )
        t = triangle_count(co.df)
        return spark.createDataFrame([(t,)], "triangles bigint")

    # ---- iterative algorithms: rows-only checks (non-SQL-expressible) ----

    def pagerank_q(spark, sf):
        from pygraphblas_spark.algorithms import pagerank

        r = pagerank(_edges(spark, sf), tol=1e-6, max_iters=60)
        return r.select("id", F.round("rank", 9).alias("rank"))

    def connected_components_q(spark, sf):
        from pygraphblas_spark.algorithms import connected_components

        return connected_components(_edges(spark, sf))

    def label_propagation_q(spark, sf):
        from pygraphblas_spark.algorithms import label_propagation

        return label_propagation(_edges(spark, sf), max_iters=10)

    def bfs_levels_q(spark, sf):
        # BFS levels over the symmetrized order↔part graph from the
        # minimum vertex id — oracle-checked against a DuckDB recursive
        # CTE (the one iterative algorithm SQL can express exactly)
        from pygraphblas_spark.algorithms import bfs_levels

        e = _edges(spark, sf).select("src", "dst")
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        src0 = int(sym.agg(F.min("src")).first()[0])
        return bfs_levels(sym, src0, max_levels=30).select(
            "id", F.col("level").cast("int").alias("level")
        )

    def betweenness_q(spark, sf):
        # 4-source batched Brandes (gap/bcmark.py batch idiom) over the
        # symmetrized graph — rows-only (not SQL-expressible)
        from pygraphblas_spark.algorithms import betweenness_centrality

        e = _edges(spark, sf).select("src", "dst")
        srcs = [r["src"] for r in e.select("src").distinct().orderBy("src").limit(4).collect()]
        return betweenness_centrality(e, sources=srcs, directed=False).select(
            "id", F.round("bc", 6).alias("bc")
        )

    def sssp_q(spark, sf):
        # min-plus SSSP with unit weights over the symmetrized graph ≡
        # BFS hop distance → shares the recursive-CTE oracle shape
        from pygraphblas_spark.algorithms import sssp

        e = _edges(spark, sf).select("src", "dst")
        sym = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .withColumn("val", F.lit(1.0))
        )
        src0 = int(sym.agg(F.min("src")).first()[0])
        return sssp(sym, src0, max_iters=30).select(
            "id", F.col("dist").cast("double").alias("dist")
        )

    # ---- training-data pipeline queries (documents / embeddings) ----

    def exact_dedup(spark, sf):
        from pygraphblas_spark.pipeline.dedup import exact_duplicates

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return exact_duplicates(docs).select("norm_sha", "n_dups", "keep_id")

    def token_counts(spark, sf):
        from pygraphblas_spark.pipeline.text import add_token_counts

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return add_token_counts(docs).select("doc_id", "ws_tokens", "bpe_tokens")

    def lang_id(spark, sf):
        from pygraphblas_spark.pipeline.text import add_language_id

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return add_language_id(docs).select("doc_id", "lang_pred")

    def doc_fingerprint(spark, sf):
        from pygraphblas_spark.pipeline.text import add_fingerprint

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return add_fingerprint(docs).select("doc_id", "norm_sha")

    def cosine_topk(spark, sf):
        from pygraphblas_spark.pipeline.similarity import cosine_topk_bruteforce

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 8)
        return cosine_topk_bruteforce(emb, q, k=5).select(
            "query_id", "neighbor_id", "rank"
        )

    def ivf_topk_fullprobe(spark, sf):
        # IVF with nprobe == n_centroids degenerates to exact search →
        # shares the brute-force oracle; exercises the whole IVF path
        # (centroid sample, pandas-UDF assignment, list join, re-rank)
        from pygraphblas_spark.pipeline.similarity import ivf_topk

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 8)
        return ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8).select(
            "query_id", "neighbor_id", "rank"
        )

    def minhash_near_dups(spark, sf):
        # xxhash64 has no DuckDB twin → rows-only; correctness is covered
        # by tests/test_pipeline.py recall-vs-exact-Jaccard property
        from pygraphblas_spark.pipeline.dedup import minhash_lsh_candidates

        docs = spark.read.parquet(f"{sf}/documents.parquet").limit(300)
        return minhash_lsh_candidates(docs, verify_threshold=0.5)

    def embedding_near_dups(spark, sf):
        # LSH-bucketed cosine near-dup (xxhash hyperplanes → rows-only;
        # precision/recall covered by tests/test_pipeline.py)
        from pygraphblas_spark.pipeline.dedup import embedding_near_duplicates

        # testdata embeddings are near-orthogonal (max pair cos ≈ 0.51 at
        # sf0.01) — 0.35 sits in the top tail so the query returns rows
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return embedding_near_duplicates(emb, threshold=0.35, planes=4, tables=8)

    def simhash_sigs(spark, sf):
        from pygraphblas_spark.pipeline.dedup import simhash_signatures

        docs = spark.read.parquet(f"{sf}/documents.parquet").limit(300)
        return simhash_signatures(docs)

    def codegraph_pagerank(spark, sf):
        # full input_hint pipeline: synth source table → edges → pagerank
        from pygraphblas_spark.algorithms import pagerank
        from pygraphblas_spark.sources.codegraph import build_edges, synthesize_source_table

        src = synthesize_source_table(spark, 2000, seed=42)
        v, e = build_edges(src)
        return pagerank(e, max_iters=20).select(
            "id", F.round("rank", 9).alias("rank")
        )

    return {
        "out_degree": out_degree,
        "in_degree": in_degree,
        "part_cooccurrence": part_cooccurrence,
        "eadd_union": eadd_union,
        "emult_intersection": emult_intersection,
        "select_gt": select_gt,
        "apply_scale": apply_scale,
        "reduce_scalar": reduce_scalar,
        "mxv_spmv": mxv_spmv,
        "transpose_pattern": transpose_pattern,
        "tril_filter": tril_filter,
        "vector_eadd": vector_eadd,
        "triangle_count": triangle_count_q,
        "pagerank": pagerank_q,
        "connected_components": connected_components_q,
        "label_propagation": label_propagation_q,
        "bfs_levels": bfs_levels_q,
        "sssp_unit": sssp_q,
        "betweenness_4src": betweenness_q,
        "codegraph_pagerank": codegraph_pagerank,
        "exact_dedup": exact_dedup,
        "token_counts": token_counts,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "cosine_topk": cosine_topk,
        "ivf_topk_fullprobe": ivf_topk_fullprobe,
        "minhash_near_dups": minhash_near_dups,
        "embedding_near_dups": embedding_near_dups,
        "simhash_sigs": simhash_sigs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "out_degree": f"SELECT src AS id, COUNT(*) AS degree FROM {_E} GROUP BY src",
        "in_degree": f"SELECT dst AS id, COUNT(*) AS degree FROM {_E} GROUP BY dst",
        "part_cooccurrence": (
            f"SELECT a.dst AS p1, b.dst AS p2, COUNT(*) AS n "
            f"FROM {_E} a JOIN {_E} b ON a.src = b.src "
            f"WHERE a.dst < b.dst GROUP BY a.dst, b.dst"
        ),
        "eadd_union": (
            f"SELECT COALESCE(a.src, r.src) AS src, COALESCE(a.dst, r.dst) AS dst, "
            f"CAST(COALESCE(a.val, 0) + COALESCE(r.val, 0) AS BIGINT) AS qty "
            f"FROM {_MA} a FULL OUTER JOIN {_MR} r ON a.src = r.src AND a.dst = r.dst"
        ),
        "emult_intersection": (
            f"SELECT a.src AS src, a.dst AS dst, CAST(a.val * r.val AS BIGINT) AS prod "
            f"FROM {_MA} a JOIN {_MR} r ON a.src = r.src AND a.dst = r.dst"
        ),
        "select_gt": f"SELECT src, dst, val AS qty FROM {_MA} WHERE val > 30",
        "apply_scale": f"SELECT src, dst, CAST(val * 2 AS BIGINT) AS qty2 FROM {_MA}",
        "reduce_scalar": f"SELECT CAST(SUM(val) AS BIGINT) AS total FROM {_MA}",
        "mxv_spmv": (
            f"SELECT src AS id, CAST(SUM(val) AS BIGINT) AS s FROM {_MA} GROUP BY src"
        ),
        "transpose_pattern": (
            f"SELECT dst AS src, src AS dst, CAST(1 AS BIGINT) AS one FROM {_MA}"
        ),
        "tril_filter": f"SELECT src, dst FROM {_E} WHERE dst <= src",
        "vector_eadd": (
            "SELECT COALESCE(d1.id, d2.id) AS id, "
            "CAST(COALESCE(d1.val, 0) + COALESCE(d2.val, 0) AS BIGINT) AS d FROM "
            f"(SELECT src AS id, COUNT(*) AS val FROM {_E} GROUP BY src) d1 "
            "FULL OUTER JOIN "
            "(SELECT o_custkey AS id, COUNT(*) AS val FROM (SELECT DISTINCT o_custkey, o_orderkey FROM orders) GROUP BY o_custkey) d2 "
            "ON d1.id = d2.id"
        ),
        "exact_dedup": (
            r"SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_sha, "
            "COUNT(*) AS n_dups, MIN(doc_id) AS keep_id "
            "FROM documents GROUP BY 1 HAVING COUNT(*) > 1"
        ),
        "token_counts": (
            "SELECT doc_id, "
            r"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens, "
            r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]', 0)) AS bpe_tokens "
            "FROM documents"
        ),
        "lang_id": (
            "WITH s AS (SELECT doc_id, "
            r"len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b', 0)) AS en, "
            r"len(regexp_extract_all(lower(text), '\b(der|die|und|ist|das)\b', 0)) AS de, "
            r"len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b', 0)) AS fr, "
            r"len(regexp_extract_all(lower(text), '\b(el|la|que|los|de)\b', 0)) AS es "
            "FROM documents) "
            "SELECT doc_id, CASE WHEN GREATEST(en, de, fr, es) = 0 THEN 'und' "
            "WHEN en = GREATEST(en, de, fr, es) THEN 'en' "
            "WHEN de = GREATEST(en, de, fr, es) THEN 'de' "
            "WHEN fr = GREATEST(en, de, fr, es) THEN 'fr' ELSE 'es' END AS lang_pred "
            "FROM s"
        ),
        "doc_fingerprint": (
            r"SELECT doc_id, sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_sha "
            "FROM documents"
        ),
        "cosine_topk": (
            "WITH scored AS ( "
            "  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "         ROUND(list_dot_product(q.embedding, b.embedding) / "
            "               (sqrt(list_dot_product(q.embedding, q.embedding)) * "
            "                sqrt(list_dot_product(b.embedding, b.embedding))), 6) AS cos "
            "  FROM embeddings q JOIN embeddings b ON q.vec_id <> b.vec_id "
            "  WHERE q.vec_id < 8 "
            "), ranked AS ( "
            "  SELECT query_id, neighbor_id, "
            "         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank "
            "  FROM scored) "
            "SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5"
        ),
        "bfs_levels": (
            "WITH RECURSIVE "
            f"sym AS (SELECT src, dst FROM {_E} UNION SELECT dst AS src, src AS dst FROM {_E}), "
            "r(id, level) AS ( "
            "  SELECT MIN(src), 0 FROM sym "
            "  UNION "
            "  SELECT e.dst, r.level + 1 FROM sym e JOIN r ON e.src = r.id "
            "  WHERE r.level < 30 "
            ") "
            "SELECT id, CAST(MIN(level) AS INT) AS level FROM r GROUP BY id"
        ),
        "sssp_unit": (
            "WITH RECURSIVE "
            f"sym AS (SELECT src, dst FROM {_E} UNION SELECT dst AS src, src AS dst FROM {_E}), "
            "r(id, level) AS ( "
            "  SELECT MIN(src), 0 FROM sym "
            "  UNION "
            "  SELECT e.dst, r.level + 1 FROM sym e JOIN r ON e.src = r.id "
            "  WHERE r.level < 30 "
            ") "
            "SELECT id, CAST(MIN(level) AS DOUBLE) AS dist FROM r GROUP BY id"
        ),
        "ivf_topk_fullprobe": (
            "WITH scored AS ( "
            "  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, "
            "         ROUND(list_dot_product(q.embedding, b.embedding) / "
            "               (sqrt(list_dot_product(q.embedding, q.embedding)) * "
            "                sqrt(list_dot_product(b.embedding, b.embedding))), 6) AS cos "
            "  FROM embeddings q JOIN embeddings b ON q.vec_id <> b.vec_id "
            "  WHERE q.vec_id < 8 "
            "), ranked AS ( "
            "  SELECT query_id, neighbor_id, "
            "         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank "
            "  FROM scored) "
            "SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5"
        ),
        "triangle_count": (
            "WITH co AS ( "
            f"  SELECT a.dst AS u, b.dst AS v FROM {_E} a JOIN {_E} b ON a.src = b.src "
            "  WHERE a.dst <> b.dst GROUP BY a.dst, b.dst HAVING COUNT(*) >= 2 "
            "), deg AS ( "
            "  SELECT u, COUNT(*) AS d FROM co GROUP BY u "
            "), oriented AS ( "
            "  SELECT co.u AS s, co.v AS t FROM co "
            "  JOIN deg du ON co.u = du.u JOIN deg dv ON co.v = dv.u "
            "  WHERE (du.d < dv.d) OR (du.d = dv.d AND co.u < co.v) "
            ") "
            "SELECT CAST(COUNT(*) AS BIGINT) AS triangles "
            "FROM oriented e1 JOIN oriented e2 ON e1.s = e2.s AND e1.t < e2.t "
            "JOIN oriented e3 ON (e3.s = e1.t AND e3.t = e2.t) "
            "                 OR (e3.s = e2.t AND e3.t = e1.t)"
        ),
    }
