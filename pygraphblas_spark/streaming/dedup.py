"""Streaming incremental deduplication — the ingest-time twin of the
batch dedup pipeline (``pipeline/dedup.py``).

A training-data corpus at 100 TB is not deduplicated in one batch job:
documents arrive continuously and each micro-batch must be checked
against everything already accepted. This module maintains, under one
``corpus_root``:

- ``docs/``     (doc_id, norm_sha, text)  — the accepted corpus
- ``buckets/``  (doc_id, band, bucket)    — its MinHash-LSH band index

Per micro-batch (foreachBatch, so the full batch DataFrame API is
available):

1. intra-batch exact dedup (min doc_id survives per norm_sha);
2. exact dedup vs corpus: anti-join on norm_sha;
3. near-dup vs corpus: band-bucket join of the new docs' LSH rows
   against the persisted bucket table → candidate (new, old) pairs only
   (never all-pairs), verified with exact shingle Jaccard; matches are
   rejected;
4. survivors (+ their bucket rows) are appended.

Scale notes: every join is keyed (norm_sha / (band, bucket) / doc_id) —
shuffle-partitioned, no broadcast of the corpus; the bucket table is the
only thing the stream reads per batch, and at scale it would be bucketed
by (band, bucket) so the candidate join co-locates. Seeds match the
batch pipeline exactly (``minhash_band_buckets``), so a corpus built by
the batch job and one built by the stream agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pygraphblas_spark.pipeline.dedup import (
    _normalized,
    _word_shingles,
    minhash_band_buckets,
    minhash_lsh_candidates,
)

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_documents_from_files(spark: SparkSession, path: str) -> DataFrame:
    """Streaming document source: directory of JSON lines, fixed schema."""
    return spark.readStream.schema(DOC_STREAM_SCHEMA).json(path)


def _table_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def dedup_batch(
    batch: DataFrame,
    corpus_docs: DataFrame | None = None,
    corpus_buckets: DataFrame | None = None,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """One micro-batch of incremental dedup as a pure DataFrame transform
    (so the same logic is batch-testable and oracle-checkable).

    Returns the accepted docs (doc_id, norm_sha, text); callers derive
    their LSH index rows with ``minhash_band_buckets(accepted)``.
    Rules, in order:

    1. intra-batch exact: min doc_id survives per norm_sha;
    2. vs-corpus exact: anti-join on norm_sha;
    3. intra-batch near-dup: a doc is rejected if ANY smaller-id doc in
       the batch is a verified near-dup (order-independent — the smaller
       side is rejected-blind, so chains need no iteration);
    4. vs-corpus near-dup: band-bucket candidates against the persisted
       bucket index, verified by exact Jaccard.
    """
    staged = batch.select(
        "doc_id", "text", F.sha2(_normalized(F.col("text")), 256).alias("norm_sha")
    )
    keep = staged.groupBy("norm_sha").agg(F.min("doc_id").alias("doc_id"))
    staged = staged.join(keep, ["norm_sha", "doc_id"], "left_semi")

    if corpus_docs is not None:
        staged = staged.join(corpus_docs.select("norm_sha"), "norm_sha", "left_anti")

    # intra-batch near-dups: reject the larger id of every verified pair
    pairs = minhash_lsh_candidates(
        staged,
        "doc_id",
        "text",
        num_perm,
        bands,
        shingle_n,
        verify_threshold=jaccard_threshold,
        hash_mode=hash_mode,
    )
    staged = staged.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )

    if corpus_docs is not None and corpus_buckets is not None:
        new_buckets = minhash_band_buckets(
            staged, "doc_id", "text", num_perm, bands, shingle_n, hash_mode
        )
        cand = (
            new_buckets.join(
                corpus_buckets.select(
                    "band", "bucket", F.col("doc_id").alias("old_id")
                ),
                ["band", "bucket"],
            )
            .select("doc_id", "old_id")
            .distinct()
        )
        # Verify shingles are computed INLINE on the joined candidate
        # pairs, never as a projection on the corpus relation: a
        # `corpus_docs.select(_word_shingles(text))` sits BELOW the join
        # in the physical plan, shingling EVERY stored doc every
        # micro-batch — O(state) CPU per batch, quadratic over the
        # stream's life (measured: 50k-doc batches degrading ~8x by a
        # 150k-doc corpus). Joining the (small) candidate id pairs to the
        # two text columns first and evaluating the shingle expressions
        # in the filter — which references BOTH sides, so it cannot be
        # pushed below the join — keeps verify CPU O(candidate pairs).
        # The corpus parquet SCAN stays linear-IO (doc_id+text read, then
        # join-filtered); at larger state, store docs/ hash-bucketed by
        # doc_id like the streaming-CC state store (graph.py) and prune
        # the scan to candidate buckets the same way.
        sh_a = _word_shingles(F.col("text_a"), shingle_n)
        sh_b = _word_shingles(F.col("text_b"), shingle_n)
        rejected = (
            cand.join(
                staged.select("doc_id", F.col("text").alias("text_a")), "doc_id"
            )
            .join(
                corpus_docs.select(
                    F.col("doc_id").alias("old_id"), F.col("text").alias("text_b")
                ),
                "old_id",
            )
            .filter(
                F.size(F.array_intersect(sh_a, sh_b))
                / F.size(F.array_union(sh_a, sh_b))
                >= jaccard_threshold
            )
            .select("doc_id")
            .distinct()
        )
        staged = staged.join(rejected, "doc_id", "left_anti")

    return staged.select("doc_id", "norm_sha", "text")


def incremental_dedup_maintenance(
    spark: SparkSession,
    stream_path: str,
    corpus_root: str,
    checkpoint_dir: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    hash_mode: str = "xxhash",
):
    """Run the incremental dedup over all currently-available stream input
    (trigger availableNow) and block until done. Returns the query."""
    docs_path = f"{corpus_root}/docs"
    buckets_path = f"{corpus_root}/buckets"
    documents = stream_documents_from_files(spark, stream_path)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        # existence checked per path: a crash between the two appends must
        # not leave a state where one read throws on every retry
        have_docs = _table_exists(sess, docs_path)
        have_buckets = _table_exists(sess, buckets_path)
        accepted = dedup_batch(
            batch,
            corpus_docs=sess.read.parquet(docs_path) if have_docs else None,
            corpus_buckets=(
                sess.read.parquet(buckets_path)
                if have_docs and have_buckets
                else None
            ),
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            jaccard_threshold=jaccard_threshold,
            hash_mode=hash_mode,
        ).persist()  # one computation of the whole dedup lineage per batch
        try:
            buckets = minhash_band_buckets(
                accepted, "doc_id", "text", num_perm, bands, shingle_n, hash_mode
            )
            # buckets FIRST: an orphaned bucket row (crash before the docs
            # append) is harmless — rule 4 drops candidates whose old_id is
            # missing from docs/. Docs-first would permanently lose the LSH
            # index rows for those docs on retry (rule 2 rejects the re-read
            # batch, so their buckets would never be written).
            buckets.write.mode("append").parquet(buckets_path)
            accepted.write.mode("append").parquet(docs_path)
        finally:
            accepted.unpersist()

    q = (
        documents.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
