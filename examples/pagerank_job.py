#!/usr/bin/env python
"""PageRank over a source-code link graph — spark-submit entry point.

Deploy (north rule: multi-executor cluster, two sizes N and 4N):

    python examples/package_pyfiles.py          # -> pygraphblas_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files pygraphblas_spark.zip \
        --num-executors ${N} --executor-cores 8 --executor-memory 16g \
        --conf spark.sql.adaptive.enabled=true \
        examples/pagerank_job.py \
        --source lake.code.files --output s3://bucket/ranks \
        --checkpoint s3://bucket/ck/pagerank

``--source`` is an Iceberg catalog table (repo, path, commit, lang,
content) or a parquet path; ``--checkpoint`` makes the run resumable
mid-iteration (durable per-partition rank states + manifest metrics).
Runs unchanged under plain ``python`` on local[*] for smoke tests.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="Iceberg table name or parquet path of the source table")
    ap.add_argument("--output", required=True, help="output path for (id, rank)")
    ap.add_argument("--checkpoint", default=None,
                    help="durable checkpoint root (resumable)")
    ap.add_argument("--checkpoint-interval", type=int, default=5,
                    help="persist state every K iterations (0 = metrics only)")
    ap.add_argument("--edges-out", default=None,
                    help="optionally persist the extracted edge table")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--damping", type=float, default=0.85)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/deploy-mode; builder only names the app.
    spark = SparkSession.builder.appName("pygraphblas_spark_pagerank").getOrCreate()

    try:
        from pygraphblas_spark.algorithms import pagerank
    except ModuleNotFoundError:  # plain-python dev run from a checkout:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from pygraphblas_spark.algorithms import pagerank
    from pygraphblas_spark.plans.checkpoint import CheckpointManager
    from pygraphblas_spark.sources.codegraph import build_edges, load_source_table

    source = load_source_table(spark, args.source)
    vertices, edges = build_edges(source)
    if args.edges_out:
        edges.write.mode("overwrite").parquet(args.edges_out)
        edges = spark.read.parquet(args.edges_out)

    ckpt = (
        CheckpointManager(
            root=args.checkpoint,
            interval=args.checkpoint_interval,
            algorithm="pagerank",
        )
        if args.checkpoint
        else None
    )
    ranks = pagerank(
        edges,
        n=vertices.count(),
        damping=args.damping,
        tol=args.tol,
        max_iters=args.max_iters,
        checkpoint=ckpt,
    )
    # join the vertex dictionary back so the output is human-addressable
    out = ranks.join(vertices, ranks["id"] == vertices["id"], "left").select(
        ranks["id"], "repo", "path", "rank"
    )
    out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
