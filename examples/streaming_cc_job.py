#!/usr/bin/env python
"""Streaming incremental connected components — spark-submit entry point.

Deploy (same artifact as the batch graph jobs):

    python examples/package_pyfiles.py          # -> pygraphblas_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files pygraphblas_spark.zip \
        --num-executors ${N} --executor-cores 8 --executor-memory 16g \
        examples/streaming_cc_job.py \
        --stream s3://bucket/edge-stream --state s3://bucket/cc-state \
        --checkpoint s3://bucket/cc-ckpt

Maintains a persisted ``(id, component)`` table incrementally as edge
batches arrive (streaming/graph.py): per micro-batch, only the
components touched by the batch are star-contracted and locally
recomputed — work and state writes ∝ batch size + touched components,
not graph size. ``--compact`` folds the delta log into a fresh base
snapshot (run on a maintenance cadence). ``--show`` prints the resolved
state row count and component count.

Runs unchanged under plain ``python`` on local[*] for smoke tests.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", required=True, help="JSON-lines edge stream dir")
    ap.add_argument("--state", required=True, help="state root (base/ + delta/)")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--compact", action="store_true",
                    help="fold deltas into a fresh base snapshot after the run")
    ap.add_argument("--show", action="store_true",
                    help="print resolved state stats when done")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("pygraphblas_spark_stream_cc").getOrCreate()

    try:
        from pygraphblas_spark.streaming.graph import (
            compact_state,
            incremental_components_maintenance,
            read_state,
        )
    except ModuleNotFoundError:  # plain-python dev run from a checkout:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from pygraphblas_spark.streaming.graph import (
            compact_state,
            incremental_components_maintenance,
            read_state,
        )

    incremental_components_maintenance(
        spark, args.stream, args.state, args.checkpoint
    )
    if args.compact:
        compact_state(spark, args.state)
    if args.show:
        state = read_state(spark, args.state)
        if state is None:
            print("state: empty")
        else:
            stats = state.agg(
                F.count(F.lit(1)).alias("vertices"),
                F.countDistinct("component").alias("components"),
            ).first()
            print(f"state: {stats['vertices']} vertices, "
                  f"{stats['components']} components")


if __name__ == "__main__":
    main()
