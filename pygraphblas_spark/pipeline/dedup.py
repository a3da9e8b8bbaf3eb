"""Deduplication operators — exact and near-duplicate, scan-scale.

Four families, each a standalone DataFrame op:

- ``exact_duplicates``: hash-groupBy on normalized sha256 — one shuffle,
  map-side partial agg; at 100 TB this is the cheapest possible dedup
  (shuffle only the 32-byte hash + id, never the text).
- ``minhash_lsh_candidates``: shingle → minhash (k permutations via
  xxhash64 seeds) → band → bucket self-join → candidate pairs (+ exact
  Jaccard verification on candidates only). The self-join shuffles only
  (band_id, band_hash, doc_id) — the classic sub-quadratic near-dup path.
- ``simhash_signatures``: 64-bit SimHash per doc (per-bit majority of
  token hashes) — near-dups have small Hamming distance; banding over
  16-bit chunks gives the candidate join.
- ``ngram_jaccard_pairs``: exact word-n-gram Jaccard over all pairs that
  share ≥1 shingle (explode + self-join on shingle + count ratio) —
  quadratic in the worst case, exact; the verification oracle for LSH.

Everything is arrays + higher-order functions (transform / aggregate /
explode) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger("pygraphblas_spark.pipeline")


def cap_oversized_buckets(
    bucketed: DataFrame,
    keys: list[str],
    max_bucket_size: int | None,
    what: str = "bucket",
) -> DataFrame:
    """Drop bucket keys holding more than ``max_bucket_size`` rows before
    a candidate self-join.

    LSH-style candidate generation self-joins on bucket keys, so one
    degenerate bucket (boilerplate/empty docs sharing a band signature or
    simhash chunk) makes the join quadratic in that bucket's size — the
    one shape that kills a 100 TB run. Capping trades recall for a hard
    bound: pairs whose only shared bucket was oversized are missed
    (near-dup banding usually still finds them via another band/chunk).

    ``max_bucket_size=None`` disables the cap (exact oracle mode). The
    drop is never silent: oversized-bucket count and row volume are
    computed (one small aggregation job over the per-key counts) and
    logged at WARNING before the lazily-filtered frame is returned.
    Callers joining the same bucketing twice should persist ``bucketed``
    upstream to avoid recomputing the signature scan.
    """
    if max_bucket_size is None:
        return bucketed
    counts = bucketed.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn"))
    big = counts.filter(F.col("__bn") > max_bucket_size).persist()
    stats = big.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.coalesce(F.sum("__bn"), F.lit(0)).alias("rows"),
    ).first()
    if stats["buckets"]:
        _LOG.warning(
            "cap_oversized_buckets: dropping %d %s bucket(s) holding %d "
            "rows (> max_bucket_size=%d) — candidate pairs whose only "
            "shared bucket was dropped will be missed",
            stats["buckets"],
            what,
            stats["rows"],
            max_bucket_size,
        )
    return bucketed.join(big.select(*keys), list(keys), "left_anti")


def _normalized(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def _sha60(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash from sha256 — the cross-engine hash mode.

    xxhash64 is JVM-only; sha256 exists in Spark, DuckDB, and every
    warehouse, so pipelines hashed this way are oracle-checkable
    anywhere. 15 hex chars = 60 bits keeps the value inside a signed
    int64 in both engines. The seed is prefixed with an ASCII unit
    separator so ("1","2x") and ("12","x") cannot collide."""
    h = F.sha2(F.concat_ws("\x1f", F.lit(str(seed)), col.cast("string")), 256)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def _elem_hash(col: Column, seed: int, hash_mode: str) -> Column:
    if hash_mode == "sha256":
        return _sha60(col, seed)
    return F.xxhash64(col, F.lit(seed))


def _word_shingles(text: Column, n: int) -> Column:
    """Array of word n-gram shingles (distinct)."""
    tokens = F.split(_normalized(text), " ")
    k = F.size(tokens) - (n - 1)
    return F.when(k <= 0, F.array(_normalized(text))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
            )
        )
    )


# ---------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization)
    documents: returns (norm_sha, n_dups, keep_id, dup_ids) for groups
    with n > 1. ``keep_id`` = min id (deterministic survivor)."""
    h = F.sha2(_normalized(F.col(text_col)), 256)
    return (
        df.select(F.col(id_col).alias("doc_id"), h.alias("norm_sha"))
        .groupBy("norm_sha")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
            F.sort_array(F.collect_list("doc_id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    shingle_n: int = 3,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """(doc_id, sig: array<long>[num_perm]) — sig[j] = min over shingles
    of hash(shingle, seed=j). One pass, all JVM expressions.

    ``hash_mode='sha256'`` swaps xxhash64 for the sha256-derived 60-bit
    hash (slower, but reproducible in any SQL engine — the DuckDB
    correctness oracle runs this mode). The shingle array is computed in
    its own projection so the per-perm min expressions share it rather
    than re-deriving it ``num_perm`` times."""
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        _word_shingles(F.col(text_col), shingle_n).alias("__sh"),
    )

    # NB: closure factory, not `lambda s, j=j:` — a default arg makes the
    # lambda binary and PySpark then binds it as the (element, index) form.
    def perm_hash(j):
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: _elem_hash(s, j, hash_mode))
        )

    sig = F.array(*[perm_hash(j) for j in range(num_perm)])
    return shingled.select("doc_id", sig.alias("sig"))


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """(doc_id, band, bucket) LSH rows — the join key space for banded
    MinHash. Public so incremental (streaming) dedup can bucket NEW
    documents against a persisted corpus bucket table with identical
    seeds (streaming/dedup.py)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n, hash_mode)

    def band_bucket(b):
        cols = [F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        if hash_mode == "sha256":
            return _sha60(
                F.concat_ws(",", *[c.cast("string") for c in cols]), 10000 + b
            )
        return F.xxhash64(*cols)

    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_bucket(b).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.5,
    hash_mode: str = "xxhash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Returns (id_a, id_b, jaccard) with id_a < id_b; when
    ``verify_threshold`` is set, candidates are verified with exact
    shingle Jaccard (computed only for candidates) and filtered.
    ``hash_mode='sha256'`` makes signatures AND band buckets
    cross-engine reproducible (DuckDB-oracle-checkable).
    ``max_bucket_size`` bounds the band-bucket self-join against
    degenerate buckets (see ``cap_oversized_buckets``) — set it on
    boilerplate-heavy corpora; None is exact.
    """
    banded = minhash_band_buckets(
        df, id_col, text_col, num_perm, bands, shingle_n, hash_mode
    )
    if max_bucket_size is not None:
        banded = banded.persist()
        banded = cap_oversized_buckets(
            banded, ["band", "bucket"], max_bucket_size, "minhash band"
        )
    a = banded.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("id_a")
    )
    b = banded.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("id_b")
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand.withColumn("jaccard", F.lit(None).cast("double"))
    # verify candidates only: join shingle sets back, exact Jaccard
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        _word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    j = (
        cand.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= verify_threshold)


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """(doc_id, simhash: long) — per-bit majority vote of token hashes.

    bit b of simhash = 1 iff Σ_tokens sign(bit b of hash(token)) > 0.
    Expressed as one aggregate() over the token-hash array per bit —
    ``bits`` JVM expressions, still one scan, no shuffle. The token-hash
    array is computed once in its own projection and shared by all the
    bit votes.

    ``hash_mode='sha256'`` uses the 60-bit sha256-derived hash (DuckDB-
    reproducible); its bits 60-63 are always 0, so signature bits above
    59 vote unanimously 0 — deterministic in both engines.
    """
    tokens = F.split(_normalized(F.col(text_col)), " ")
    def tok_hash(t):
        # unseeded xxhash64 preserves the round-1 signature values
        return _sha60(t, 0) if hash_mode == "sha256" else F.xxhash64(t)

    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens, tok_hash).alias("__th"),
    )
    th = F.col("__th")

    # closure factory (see perm_hash note above); init cast to long so the
    # merge lambda's result type matches the accumulator type
    def bit_vote(b):
        return F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long"),
        )

    bit_exprs = []
    for b in range(bits):
        # shiftleft wraps to the sign bit at b=63 (two's complement) —
        # a Python literal 1<<63 would overflow LongType
        bit_exprs.append(
            F.when(bit_vote(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = sum(bit_exprs[1:], bit_exprs[0])
    return hashed.select("doc_id", sig.alias("simhash"))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_mode: str = "xxhash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash banding with a pigeonhole guarantee:
    signatures are split into ``max_hamming + 1`` chunks, so any pair
    within the Hamming budget must agree exactly on ≥1 chunk and the
    bucket join finds ALL of them (max_hamming=3 reproduces the classic
    4×16-bit split). ``hash_mode='sha256'`` makes the whole pipeline
    cross-engine reproducible (DuckDB-oracle-checkable); its signatures
    carry 60 effective bits, so chunk widths size to 60 there.
    ``max_bucket_size`` bounds the chunk-bucket self-join against
    degenerate buckets — e.g. millions of low-entropy docs sharing a
    constant chunk (see ``cap_oversized_buckets``); capped mode weakens
    the pigeonhole guarantee to pairs that agree on ≥1 SURVIVING chunk;
    None is exact."""
    sigs = simhash_signatures(df, id_col, text_col, hash_mode=hash_mode)
    bits = 60 if hash_mode == "sha256" else 64
    n_chunks = max_hamming + 1
    width = -(-bits // n_chunks)  # ceil: chunks cover every variable bit
    key_mask = (1 << width) - 1
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), width * c)
                        .bitwiseAND(F.lit(key_mask))
                        .alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.key")
    if max_bucket_size is not None:
        chunks = chunks.persist()
        chunks = cap_oversized_buckets(
            chunks, ["chunk", "key"], max_bucket_size, "simhash chunk"
        )
    a = chunks.select("chunk", "key", F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = chunks.select("chunk", "key", F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"))
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", simhash_hamming(F.col("sig_a"), F.col("sig_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------
# exact n-gram Jaccard (the LSH verification oracle)
# ---------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via shingle inverted index:
    explode shingles → self-join on shingle → intersection counts →
    |A∩B| / (|A| + |B| - |A∩B|). Exact but worst-case quadratic — the
    ground truth for LSH recall tests and fine at verification scale."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("shingle"), F.col("doc_id").alias("id_a"))
    b = sh.select(F.col("shingle"), F.col("doc_id").alias("id_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_mode: str = "xxhash",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    Sub-quadratic: candidates must share a random-hyperplane LSH bucket
    in >= 1 of ``tables`` hash tables (reusing the similarity module's
    deterministic hyperplanes); exact cosine is computed on candidates
    only and thresholded. Returns (id_a, id_b, cos) with id_a < id_b.

    Recall rises with ``tables`` (high-cosine pairs collide with
    probability (1 - theta/pi)^planes per table); the exact-verify step
    guarantees precision = 1.
    """
    from pygraphblas_spark.pipeline.similarity import (
        cosine_similarity,
        lsh_bucket_key,
    )

    if hash_mode == "sha256" and dim is None:
        # one-row probe for the vector dimension (needed to materialize
        # the literal hyperplanes)
        dim = len(emb.select(vec_col).first()[0])

    def bucketed(idname):
        # vectors are consumed by the bucket key and never carried into
        # the bucket join / candidate distinct — at 100 TB the shuffle
        # holds (tbl, bucket, id) rows only
        v = F.col(vec_col)
        return emb.select(
            F.col(id_col).alias(idname),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_bucket_key(v, planes, t, hash_mode, dim).alias(
                                "bucket"
                            ),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("tb"),
        ).select(idname, "tb.tbl", "tb.bucket")

    a = bucketed("id_a")
    b = bucketed("id_b")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # re-join vectors for the exact verify; threshold on the UNROUNDED
    # cosine (precision = 1 holds strictly at the boundary), round only
    # in the projected output column
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_exact", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos_exact") >= threshold)
        .select("id_a", "id_b", F.round("cos_exact", 6).alias("cos"))
    )


def ngram_containment(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Benchmark-contamination check: for every (doc, probe) pair, the
    CONTAINMENT |shingles(probe) ∩ shingles(doc)| / |shingles(probe)| —
    the standard decontamination measure (a probe fully quoted inside a
    much larger doc scores 1.0 where symmetric Jaccard would dilute).

    Scale shape: probes (the benchmark suite) are tiny next to the
    corpus — their exploded shingle index broadcasts; docs stream
    through one explode + hash join, aggregating matches per pair. No
    all-pairs anything.
    """
    d_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    ).distinct()
    p_sh = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.explode(_word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    ).distinct()
    p_size = p_sh.groupBy("probe_id").agg(F.count(F.lit(1)).alias("p_n"))
    hits = (
        d_sh.join(F.broadcast(p_sh), "sh")
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.join(F.broadcast(p_size), "probe_id")
        .select(
            "doc_id",
            "probe_id",
            F.round(F.col("n_hit") / F.col("p_n"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
