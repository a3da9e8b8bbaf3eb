#!/usr/bin/env python
"""Corpus deduplication — spark-submit entry point (training-data side).

Deploy (same artifact as the graph jobs):

    python examples/package_pyfiles.py          # -> pygraphblas_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files pygraphblas_spark.zip \
        --num-executors ${N} --executor-cores 8 --executor-memory 16g \
        examples/dedup_job.py \
        --input s3://bucket/corpus --output s3://bucket/deduped \
        --report s3://bucket/dedup_report

One batch pass of the incremental-dedup rules (streaming/dedup.py
``dedup_batch``): intra-corpus exact dedup (min-id survivor per
normalized sha256) then MinHash-LSH near-dup rejection (banded candidate
join, exact-Jaccard verify — never all-pairs). For a continuously-fed
corpus use ``streaming.incremental_dedup_maintenance`` instead.

Runs unchanged under plain ``python`` on local[*] for smoke tests.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet of (doc_id, text, ...)")
    ap.add_argument("--output", required=True, help="deduplicated parquet")
    ap.add_argument("--report", default=None, help="optional rejected-id parquet")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="near-dup Jaccard rejection threshold")
    ap.add_argument("--num-perm", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("pygraphblas_spark_dedup").getOrCreate()

    try:
        from pygraphblas_spark.streaming.dedup import dedup_batch
    except ModuleNotFoundError:  # plain-python dev run from a checkout:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from pygraphblas_spark.streaming.dedup import dedup_batch

    docs = spark.read.parquet(args.input)
    accepted = dedup_batch(
        docs.select("doc_id", "text"),
        num_perm=args.num_perm,
        bands=args.bands,
        jaccard_threshold=args.threshold,
    )
    # keep every original column of the surviving docs
    kept = docs.join(accepted.select("doc_id"), "doc_id", "left_semi")
    kept.write.mode("overwrite").parquet(args.output)
    if args.report:
        docs.select("doc_id").join(
            accepted.select("doc_id"), "doc_id", "left_anti"
        ).write.mode("overwrite").parquet(args.report)

    n_in = docs.count()
    n_out = kept.count()
    print(f"dedup: {n_in} -> {n_out} docs ({n_in - n_out} rejected)")
    spark.stop()


if __name__ == "__main__":
    main()
