"""Dense-vector PageRank kernel over cached per-partition CSR blocks.

The north star's physical plan made concrete: "edges ... built into
per-partition CSR blocks, and PageRank ... computed by iterative sparse
gather-scatter expressed as vectorized pandas/Arrow UDFs over DataFrames —
no per-row Python". Reference boundary analog: ``Matrix.to_arrays`` /
``npI/npJ/npV`` zero-copy numpy views (``pygraphblas/matrix.py:1475-1605``)
— the same Python⇄arrays frontier, here crossed via Arrow.

Design (what each piece buys at scale):

- **CSR block cache (built once)**: edges are hash-partitioned by ``dst``
  and sorted; each partition is compressed to three numpy arrays — unique
  dst ids, segment starts, and the src index array — stored as raw
  ``binary`` cells in a cached one-row-per-block DataFrame. Because the
  partitioner is a function of ``dst``, every dst's in-edges live in
  exactly one block: per-block scatter results are FINAL. The iteration
  loop therefore has ZERO shuffles, and the JVM's per-iteration work is
  shipping cached byte buffers (pure memcpy — no row↔columnar encode).
- **Weight vector transport**: each iteration needs ``w = rank·damping/
  outdeg`` (n doubles) visible to every kernel task. In ``local[k]`` the
  vector is published as an ``.npy`` file and the kernel ``np.load``\ s it
  ``mmap_mode='r'`` — ONE page-cache copy shared by all workers, exactly
  the per-node sharing a real multi-executor node gets from its block
  manager (k Python workers unpickling k private copies is a local-mode
  pathology, not something to design around). On a non-local master it
  falls back to ``sc.broadcast``.
- **Per-iteration dataflow**: one job, one narrow stage over the block
  cache; kernels gather ``w[src]`` (vectorized fancy-index against the
  mmap) and segment-sum with ``np.add.reduceat`` (blocks are dst-sorted,
  so no per-iteration sort); results return as binary numpy buffers; the
  driver applies teleport + L1-diff in O(n) vectorized ops.

Crossover: the driver holds three dense n-vectors and every executor node
maps one — fine to ~10^8 vertices; beyond that ``algorithms.pagerank``
uses the fully distributed join path (no per-node n-sized state), which
is the 10^12-file configuration. ``DENSE_KERNEL_MAX_ROWS`` gates the
automatic choice.

Semantics are exactly ``gap/prmark.py:8-30`` (damping, teleport, GAP
dangling behavior, L1 convergence); tested equal to the join path at 1e-9.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: above this many vertices ``algorithms.pagerank(strategy='auto')`` stops
#: using the dense kernel (driver + each executor node hold an n-vector).
DENSE_KERNEL_MAX_ROWS = 10_000_000


def _build_blocks(e: DataFrame, num_blocks: int, narrow: bool):
    """Compress dst-partitioned, dst-sorted edges into per-partition CSR
    arrays stored as binary cells (one row per non-empty block)."""
    import pyarrow as pa

    idt = "int32" if narrow else "int64"

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        srcs, dsts = [], []
        for b in batches:
            srcs.append(b.column("src").to_numpy(zero_copy_only=False))
            dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
        if not srcs:
            return
        src = np.ascontiguousarray(np.concatenate(srcs), dtype=idt)
        dst = np.concatenate(dsts)  # sorted within the partition
        starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]]).astype("int64")
        uniq = dst[starts].astype("int64")
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([uniq.tobytes()], type=pa.binary()),
                pa.array([starts.tobytes()], type=pa.binary()),
                pa.array([src.tobytes()], type=pa.binary()),
            ],
            names=["uniq", "starts", "src"],
        )

    blocks = e.mapInArrow(build, "uniq binary, starts binary, src binary").persist()
    blocks.count()
    return blocks, idt


def pagerank_dense_kernel(
    edges: DataFrame,
    n: int | None = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    max_iters: int = 100,
    num_blocks: int | None = None,
    checkpoint=None,
) -> DataFrame:
    """PageRank over cached CSR blocks — zero shuffles per iteration.

    Returns (id: long, rank: double) for every vertex 0..n-1; identical
    results to ``algorithms.pagerank`` (same GAP formulation).
    """
    import pyarrow as pa

    from pygraphblas_spark.plans.checkpoint import CheckpointManager, iteration_conf

    spark = edges.sparkSession
    sc = spark.sparkContext
    ckpt = checkpoint or CheckpointManager(algorithm="pagerank_kernel")
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    local_mode = sc.master.startswith("local")

    with iteration_conf(spark):
        e = edges.select("src", "dst")
        if n is None:
            mx = e.agg(F.max("src"), F.max("dst")).first()
            n = int(max(mx[0], mx[1])) + 1
        if n == 0:
            return spark.createDataFrame([], "id long, rank double")

        # out-degree → inv_d = damping/outdeg (0 for dangling; GAP leak)
        deg_pd = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).toPandas()
        inv_d = np.zeros(n, dtype="float64")
        inv_d[deg_pd["src"].to_numpy()] = damping / deg_pd["deg"].to_numpy(
            dtype="float64"
        )

        narrow = n <= (1 << 31) - 1
        if narrow:
            e = e.select(
                F.col("src").cast("int").alias("src"),
                F.col("dst").cast("int").alias("dst"),
            )
        e = e.repartition(num_blocks, "dst").sortWithinPartitions("dst")
        blocks, idt = _build_blocks(e, num_blocks, narrow)

        tmpdir = tempfile.mkdtemp(prefix="pgb_w_") if local_mode else None
        teleport = (1.0 - damping) / n
        rank = np.full(n, 1.0 / n, dtype="float64")

        try:
            iters, rdiff = 0, float("inf")
            prev_path, w_b = None, None
            for it in range(max_iters):
                w = rank * inv_d
                w_path = None
                if local_mode:
                    w_path = os.path.join(tmpdir, f"w_{it}.npy")
                    np.save(w_path, w)
                else:
                    w_b = sc.broadcast(w)
                bref = w_b

                def spmv(
                    batches: Iterator["pa.RecordBatch"],
                ) -> Iterator["pa.RecordBatch"]:
                    wv = (
                        np.load(w_path, mmap_mode="r")
                        if w_path is not None
                        else bref.value
                    )
                    for b in batches:
                        for i in range(b.num_rows):
                            uniq = np.frombuffer(
                                b.column("uniq")[i].as_buffer(), dtype="int64"
                            )
                            starts = np.frombuffer(
                                b.column("starts")[i].as_buffer(), dtype="int64"
                            )
                            src = np.frombuffer(
                                b.column("src")[i].as_buffer(), dtype=idt
                            )
                            sums = np.add.reduceat(wv[src], starts)
                            yield pa.RecordBatch.from_arrays(
                                [
                                    pa.array([uniq.tobytes()], type=pa.binary()),
                                    pa.array([sums.tobytes()], type=pa.binary()),
                                ],
                                names=["ids", "vals"],
                            )

                # driver fetch via Arrow stream (toArrow) — collect() would
                # funnel ~16n bytes through single-threaded py4j pickling
                tbl = blocks.mapInArrow(spmv, "ids binary, vals binary").toArrow()
                y = np.full(n, teleport, dtype="float64")
                ids_col, vals_col = tbl.column("ids"), tbl.column("vals")
                for i in range(tbl.num_rows):
                    ids = np.frombuffer(ids_col[i].as_buffer(), dtype="int64")
                    y[ids] += np.frombuffer(vals_col[i].as_buffer(), dtype="float64")
                rdiff = float(np.abs(y - rank).sum())
                rank = y
                iters = it + 1

                if w_b is not None:
                    w_b.unpersist()
                    w_b = None
                if prev_path:
                    try:
                        os.remove(prev_path)
                    except OSError:
                        pass
                prev_path = w_path

                if ckpt.durable and iters % ckpt.interval == 0:
                    rank_df = spark.createDataFrame(
                        pd.DataFrame(
                            {"id": np.arange(n, dtype="int64"), "rank": rank}
                        )
                    )
                    ckpt.save(iters, {"rank": rank_df}, {"rdiff": rdiff, "n": n})
                else:
                    ckpt.records.append(
                        {
                            "iteration": iters,
                            "algorithm": ckpt.algorithm,
                            "metrics": {"rdiff": rdiff, "n": n},
                            "durable": False,
                        }
                    )
                if rdiff <= tol:
                    break
        finally:
            blocks.unpersist()
            if tmpdir:
                shutil.rmtree(tmpdir, ignore_errors=True)

        return spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype="int64"), "rank": rank})
        )
