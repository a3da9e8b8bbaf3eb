#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): edges/sec per iteration for the
iterative algorithms. Per-query wall-clock seconds go in "queries";
"value" is total wall-clock. Iteration counts and edges/sec/iteration
are included under "detail" for the scaling-efficiency report
(BENCH/BASELINE.md — see bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import sys
import time


def run(sf_dir: str, cpus: str, rounds: int = 1) -> dict:
    # imports here so --help stays fast
    from pyspark.sql import functions as F

    from pygraphblas_spark.session import get_spark
    from pygraphblas_spark.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from pygraphblas_spark.sources.codegraph import build_edges, synthesize_source_table
    from pygraphblas_spark.sources.tpch_graph import order_part_edges

    n_cores = 32 if cpus == "*" else int(cpus)
    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(8, n_cores))

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # ---- inputs ----
    # codegraph: the primary input shape (input_hint); sized by sf
    n_files = {"0.001": 2_000, "0.01": 20_000, "0.1": 200_000}.get(sf, 20_000)
    src_table = synthesize_source_table(spark, n_files, seed=42)
    vertices, code_edges = build_edges(src_table)
    code_edges = code_edges.persist()
    n_code_edges = code_edges.count()
    n_vertices = vertices.count()

    tpch_edges = order_part_edges(spark, sf_dir).persist()
    n_tpch_edges = tpch_edges.count()

    queries: dict[str, float] = {}
    detail: dict[str, dict] = {}

    def timed(name, fn, edges_count=None, iters_getter=None):
        best = float("inf")
        extra = {}
        for _ in range(rounds):
            t0 = time.time()
            extra = fn() or {}
            best = min(best, time.time() - t0)
        queries[name] = round(best, 3)
        d = {"sec": round(best, 3), **extra}
        if edges_count and extra.get("iterations"):
            d["edges_per_sec_per_iter"] = round(
                edges_count * extra["iterations"] / best
            )
        detail[name] = d

    # ---- PageRank on the code graph ----
    def _pr():
        from pygraphblas_spark.plans.checkpoint import CheckpointManager

        ckpt = CheckpointManager(algorithm="pagerank")
        r = pagerank(code_edges, n=n_vertices, tol=1e-6, max_iters=50, checkpoint=ckpt)
        r.count()
        return {"iterations": len(ckpt.records)}

    timed("pagerank_codegraph", _pr, edges_count=n_code_edges)

    # ---- CC on the code graph ----
    def _cc():
        from pygraphblas_spark.plans.checkpoint import CheckpointManager

        ckpt = CheckpointManager(algorithm="cc")
        c = connected_components(code_edges, n=n_vertices, checkpoint=ckpt)
        c.count()
        return {"iterations": len(ckpt.records)}

    timed("cc_codegraph", _cc, edges_count=2 * n_code_edges)

    # ---- LPA on the code graph ----
    def _lpa():
        from pygraphblas_spark.plans.checkpoint import CheckpointManager

        ckpt = CheckpointManager(algorithm="lpa")
        l = label_propagation(code_edges, n=n_vertices, max_iters=10, checkpoint=ckpt)
        l.count()
        return {"iterations": len(ckpt.records)}

    timed("lpa_codegraph", _lpa, edges_count=2 * n_code_edges)

    # ---- Triangle count on the code graph ----
    def _tri():
        t = triangle_count(code_edges)
        return {"triangles": t, "iterations": 1}

    timed("triangles_codegraph", _tri, edges_count=n_code_edges)

    # ---- PageRank on the TPC-H bipartite graph ----
    def _pr2():
        from pygraphblas_spark.plans.checkpoint import CheckpointManager

        ckpt = CheckpointManager(algorithm="pagerank")
        r = pagerank(tpch_edges, tol=1e-4, max_iters=50, checkpoint=ckpt)
        r.count()
        return {"iterations": len(ckpt.records)}

    timed("pagerank_tpch", _pr2, edges_count=n_tpch_edges)

    # ---- operator micro-suite: masked mxm (co-occurrence) ----
    def _mxm():
        from pygraphblas_spark.matrix import Matrix
        from pygraphblas_spark import descriptor

        m = Matrix.from_edge_df(tpch_edges, 1 << 40, 1 << 40, "INT64")
        co = m.mxm(m, semiring="PLUS_PAIR", desc=descriptor.T0).triu(1)
        co.df.count()
        return {"iterations": 1}

    timed("mxm_cooccurrence", _mxm, edges_count=n_tpch_edges)

    total = round(sum(queries.values()), 3)
    return {
        "metric": "headline query wall-clock (graph algorithms + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "detail": detail,
        "config": {
            "cores": n_cores,
            "code_edges": n_code_edges,
            "code_vertices": n_vertices,
            "tpch_edges": n_tpch_edges,
        },
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # best-of-3 per query: single-shot wall-clock on this shared box has
    # been observed to swing up to 8x on bursty host contention (same
    # code, same counts, consecutive runs); the floor is the reproducible
    # number and three shots make the floor robust to a one-round burst
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    result = run(sf_dir, cpus, rounds=rounds)
    print(json.dumps(result))
