"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: exact top-k neighbors for a query set —
  broadcast the (small) query side, one pass over the base table,
  ``zip_with``+``aggregate`` dot products (JVM higher-order functions, no
  Python), window rank. The baseline every ANN variant is measured against.
- ``lsh_bucketed_topk``: random-hyperplane LSH buckets (sign of dot with
  seeded pseudo-random planes derived from xxhash of the dimension index
  — deterministic, no RNG state), candidates only within matching buckets
  across b tables, then exact re-rank. Recall<1, tunable with
  (planes, tables).
- ``ivf_topk``: inverted-file index — C deterministic sampled centroids
  are broadcast as one numpy matrix; assignment is a vectorized pandas
  UDF (one Arrow-batched matmul per batch, no per-row Python); each base
  vector lives in 1 list, each query probes its ``nprobe`` nearest lists;
  exact re-rank inside probed lists. Recall<1, tunable with (C, nprobe).

At 100 TB the bruteforce path is O(|Q|·|B|) — fine for |Q| in the
thousands with a broadcast; LSH/IVF turn it into bucket-local work whose
candidate volume is controlled by (planes, tables) / (C, nprobe).
"""

import numpy as np
import pandas as pd

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


def hyperplane_values(planes: int, table: int, dim: int) -> list[list[float]]:
    """Deterministic sha256-derived hyperplane entries for one LSH table.

    h[p][d] = (int(sha256("hp-{p}-{table}" <US> "{d}")[:15 hex], 16)
               % 2001) - 1000 — a pure function of (p, table, d),
    reproducible in any engine or language (the DuckDB correctness
    oracle embeds the same values). Used by ``hash_mode='sha256'``."""
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            hx = hashlib.sha256(f"hp-{p}-{table}\x1f{d}".encode()).hexdigest()
            row.append(float(int(hx[:15], 16) % 2001 - 1000))
        out.append(row)
    return out


def _dot_literal(vec: Column, vals: list[float]) -> Column:
    """<vec, literal plane>: double products, sequential double fold —
    the exact op order the DuckDB oracle mirrors."""
    arr = F.array(*[F.lit(v) for v in vals])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
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


def lsh_bucket_key(
    vec: Column,
    planes: int,
    table: int,
    hash_mode: str = "xxhash",
    dim: int | None = None,
) -> Column:
    """Bucket id for one hash table: the sign bits packed into a long.

    ``hash_mode='sha256'`` (requires ``dim``) uses Python-precomputed
    sha256-derived hyperplane literals instead of in-engine xxhash — the
    buckets are then reproducible in any SQL engine."""
    if hash_mode == "sha256":
        if dim is None:
            raise ValueError("hash_mode='sha256' requires dim")
        hv = hyperplane_values(planes, table, dim)
        bits = [
            (_dot_literal(vec, hv[p]) > 0).cast("int") * F.lit(1 << p)
            for p in range(planes)
        ]
    else:
        bits = [
            _hyperplane_sign(vec, p, table) * F.lit(1 << p) for p in range(planes)
        ]
    return sum(bits[1:], bits[0]).cast("long")


def _sample_centroids(
    base: DataFrame, n_centroids: int, id_col: str, vec_col: str
):
    """Deterministic centroid sample: the ``n_centroids`` base vectors
    with the smallest xxhash64(id) — reproducible on any cluster, one
    small ordered collect. Returns a (C, d) float64 numpy matrix with
    rows L2-normalized (so nearest-centroid-by-dot == by-cosine)."""
    rows = (
        base.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(n_centroids)
        .collect()
    )
    c = np.array([r["v"] for r in rows], dtype="float64")
    norms = np.linalg.norm(c, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return c / norms


def _assign_lists(df: DataFrame, centroids, nprobe: int, idname: str, vec_col: str):
    """(id, vec) → one row per probed centroid list. ``nprobe=1`` for the
    base side (each vector lives in exactly one inverted list). The
    argmax over C centroids is a single numpy matmul per Arrow batch.

    Only (id, list_id) come out — the vector is consumed here and
    re-joined later for the exact re-rank, so the candidate-pair shuffle
    and distinct never carry ``array<float>`` payloads."""
    from pyspark.sql.functions import pandas_udf

    c_t = centroids.T  # (d, C)
    k = min(nprobe, centroids.shape[0])

    @pandas_udf("array<int>")
    def probe_lists(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype="float64")  # (B, d)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ c_t  # (B, C)
        if k == 1:
            top = np.argmax(sims, axis=1)[:, None]
        else:
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        return pd.Series(list(top.astype("int32")))

    out = df.select(
        F.col("__id").alias(idname),
        F.explode(probe_lists(F.col("__v"))).alias("list_id"),
    )
    return out


def _rerank_pairs(
    cand: DataFrame,
    base: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Join vectors back onto an id-pair candidate set and re-rank by
    exact cosine. The distinct upstream ran on bare (query_id,
    neighbor_id) pairs; vectors ride exactly one join each here. The rank
    (and the cross-engine oracle) orders by the 6-decimal-rounded cosine
    with an id tie-break — rounding first makes the tie-break
    deterministic across engines instead of relying on bit-identical
    float folds."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("bv")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(b, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("bv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _kmeans_refine(
    b: DataFrame, centroids, iters: int, vec_col: str
):
    """Lloyd refinement of the sampled centroids: assign every base
    vector to its nearest centroid (the same Arrow-batched matmul the
    index build uses), recompute each centroid as the mean of its list
    via posexplode + groupBy (one shuffle of (list_id, pos, val) floats
    per round — never the whole vectors to the driver), pull only the
    C×d means back. Empty lists keep their previous centroid."""
    for _ in range(max(0, iters)):
        assign = _assign_lists(b, centroids, 1, "bid", vec_col)
        comp = (
            b.join(assign, b["__id"] == F.col("bid"))
            .select("list_id", F.posexplode("__v").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
        )
        pdf = comp.toPandas()
        new = centroids.copy()
        for lid, grp in pdf.groupby("list_id"):
            new[int(lid), grp["pos"].to_numpy()] = grp["m"].to_numpy()
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = new / norms
    return centroids


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index.

    Base vectors are assigned to their nearest of ``n_centroids``
    deterministic sampled centroids (one inverted list each); each query
    probes its ``nprobe`` nearest lists and re-ranks exactly within them.
    Output schema matches ``cosine_topk_bruteforce``; recall rises with
    ``nprobe`` (== exact when nprobe == n_centroids).
    ``kmeans_iters`` > 0 runs that many Lloyd rounds to refine the
    sampled centroids before the index is built — better-balanced lists,
    higher recall at the same nprobe.
    """
    centroids = _sample_centroids(base, n_centroids, id_col, vec_col)
    b = base.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if kmeans_iters:
        centroids = _kmeans_refine(b, centroids, kmeans_iters, vec_col)
    q = queries.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    bl = _assign_lists(b, centroids, 1, "neighbor_id", vec_col)
    ql = _assign_lists(q, centroids, nprobe, "query_id", vec_col)
    cand = (
        ql.join(bl, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _rerank_pairs(cand, base, queries, k, id_col, vec_col)


def lsh_bucketed_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_mode: str = "xxhash",
    dim: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``tables`` hash tables; exact cosine re-rank on candidates only.

    Same output schema as the bruteforce path (rank may contain <k rows
    per query when buckets are sparse). The bucket join and the distinct
    carry only (tbl, bucket, id) — vectors are consumed computing the
    bucket key and re-joined for the exact re-rank.
    ``hash_mode='sha256'`` (requires ``dim``) makes the buckets
    engine-portable (see ``lsh_bucket_key``) for cross-engine checks.
    ``max_bucket_size`` drops degenerate base-side buckets (e.g. the
    all-zero-ish region collapsing one hyperplane bucket) before the
    candidate join — bounded work, recall tradeoff; None is exact."""
    from pygraphblas_spark.pipeline.dedup import cap_oversized_buckets
    def bucketed(df, idname):
        v = F.col(vec_col)
        return df.select(
            F.col(id_col).alias(idname),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_bucket_key(
                                v, planes, t, hash_mode=hash_mode, dim=dim
                            ).alias("bucket"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("tb"),
        ).select(idname, "tb.tbl", "tb.bucket")

    qb = bucketed(queries, "query_id")
    bb = bucketed(base, "neighbor_id")
    if max_bucket_size is not None:
        bb = bb.persist()
        bb = cap_oversized_buckets(
            bb, ["tbl", "bucket"], max_bucket_size, "ann lsh"
        )
    cand = (
        qb.join(bb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _rerank_pairs(cand, base, queries, k, id_col, vec_col)
