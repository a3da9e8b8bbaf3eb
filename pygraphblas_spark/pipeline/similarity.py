"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: exact top-k neighbors for a query set —
  broadcast the (small) query side, one pass over the base table,
  ``zip_with``+``aggregate`` dot products (JVM higher-order functions, no
  Python), window rank. The baseline every ANN variant is measured against.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  (sign of dot with h seeded pseudo-random planes, derived from xxhash of
  the dimension index — deterministic, no RNG state), candidates only
  within matching buckets across b tables, then exact re-rank. Recall<1,
  tunable with (planes, tables).

At 100 TB the bruteforce path is O(|Q|·|B|) — fine for |Q| in the
thousands with a broadcast; the LSH path turns it into bucket-local work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Returns (query_id, neighbor_id, cos, rank) with rank 1..k,
    deterministic tie-break by neighbor id. Queries are broadcast.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("bv")
    )
    scored = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("bv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplane_sign(vec: Column, plane: int, table: int) -> Column:
    """Sign of <vec, h> for a deterministic pseudo-random hyperplane h:
    h[d] = centered xxhash64(d, plane, table) — reproducible on any
    cluster, no RNG state, all codegen. The hyperplane length follows the
    vector's own size (zip_with would null-pad a mismatch)."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda d: (
                    F.xxhash64(d, F.lit(plane), F.lit(table)) % 2001 - 1000
                ).cast("double"),
            ),
            lambda v, h: v.cast("double") * h,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj > 0).cast("int")


def lsh_bucket_key(vec: Column, planes: int, table: int) -> Column:
    """Bucket id for one hash table: the sign bits packed into a long."""
    bits = [
        _hyperplane_sign(vec, p, table) * F.lit(1 << p) for p in range(planes)
    ]
    return sum(bits[1:], bits[0]).cast("long")


def lsh_bucketed_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``tables`` hash tables; exact cosine re-rank on candidates only.

    Same output schema as the bruteforce path (rank may contain <k rows
    per query when buckets are sparse)."""
    def bucketed(df, idname):
        v = F.col(vec_col)
        return df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(f"{idname}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_bucket_key(v, planes, t).alias("bucket"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("tb"),
        ).select(idname, f"{idname}_v", "tb.tbl", "tb.bucket")

    qb = bucketed(queries, "query_id")
    bb = bucketed(base, "neighbor_id")
    cand = (
        qb.join(bb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity(F.col("query_id_v"), F.col("neighbor_id_v")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
