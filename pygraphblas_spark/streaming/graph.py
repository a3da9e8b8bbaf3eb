"""Streaming incremental graph maintenance — connected components over a
continuous edge stream.

A 10^12-file link graph is not static: new commits add edges
continuously, and recomputing components from scratch per batch is
O(graph) work for O(batch) change. This module maintains a persisted
``(id, component)`` state table (component = minimum member id — the
same canonical labels ``algorithms.connected_components`` produces) and
updates it incrementally per micro-batch:

1. **affected set**: components touched by any batch-edge endpoint (one
   semi-join of the state against the batch's vertex set);
2. **star contraction**: each affected component is represented by its
   star edges ``member → label`` (the label is itself a member, so
   connectivity inside the component is exactly preserved with one row
   per member);
3. **local recompute**: ``connected_components`` runs over (batch edges
   ∪ affected star edges) only — work ∝ batch size + size of touched
   components, not graph size;
4. **merge**: untouched state rows pass through unchanged.

State persistence is LSM-shaped so the per-batch WRITE is also ∝ the
affected set: ``state_root/base`` holds the last compacted snapshot and
``state_root/delta`` accumulates per-batch changed rows stamped with a
monotone ``seq``; readers resolve last-writer-wins per id, and
``compact_state`` folds deltas into a new base. At scale both tables
would be bucketed by id so the resolve and the star-edge joins co-locate.

The incremental result provably equals a from-scratch recompute: star
edges preserve each prior component's connectivity, batch edges are
included verbatim, and min-label is determined by the vertices of the
merged component, all of which appear in the local subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygraphblas_spark.streaming.core import stream_edges_from_files


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def components_batch(
    batch_edges: DataFrame, state: DataFrame | None = None
) -> DataFrame:
    """One micro-batch of incremental CC as a pure DataFrame transform.

    ``state`` is the prior ``(id, component)`` table (or None for the
    first batch). Returns the updated FULL state — callers that persist
    incrementally should write only the changed rows (see
    ``incremental_components_maintenance``), but the transform itself is
    total so it is batch-testable and oracle-checkable.
    """
    e = batch_edges.select("src", "dst")
    if state is None or state.isEmpty():
        verts = e.select(F.col("src").alias("id")).unionByName(
            e.select(F.col("dst").alias("id"))
        ).distinct()
        return _local_cc(e, verts)

    batch_verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    affected = (
        state.join(batch_verts, "id", "left_semi")
        .select("component")
        .distinct()
    )
    # localCheckpoint: ``touched`` feeds two branches (star edges and the
    # vertex set) — materialize the affected-set-sized table once instead
    # of re-running the semi-join, without leaking a persist past return
    touched = state.join(affected, "component", "left_semi").localCheckpoint()
    stars = touched.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("src"), F.col("component").alias("dst")
    )
    sub_edges = e.unionByName(stars)
    sub_verts = (
        batch_verts.unionByName(touched.select("id")).distinct()
    )
    updated = _local_cc(sub_edges, sub_verts)
    untouched = state.join(affected, "component", "left_anti")
    return untouched.unionByName(updated)


def _local_cc(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """CC over the subgraph, restricted to ``verts`` (the dense-kernel
    tier labels every id in 0..n-1; isolated batch vertices still get a
    singleton row via the verts left join)."""
    from pygraphblas_spark.algorithms import connected_components

    if edges.isEmpty():
        return verts.select("id", F.col("id").alias("component"))
    cc = connected_components(edges)
    return verts.join(cc, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def read_state(spark: SparkSession, state_root: str) -> DataFrame | None:
    """Resolve the current state: base snapshot + last-writer-wins deltas."""
    base_p, delta_p = f"{state_root}/base", f"{state_root}/delta"
    have_base, have_delta = _exists(spark, base_p), _exists(spark, delta_p)
    if not have_base and not have_delta:
        return None
    parts = []
    if have_base:
        parts.append(
            spark.read.parquet(base_p).select(
                "id", "component", F.lit(-1).cast("long").alias("seq")
            )
        )
    if have_delta:
        parts.append(spark.read.parquet(delta_p).select("id", "component", "seq"))
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    latest = allrows.groupBy("id").agg(F.max("seq").alias("seq"))
    # distinct: a crash-retried micro-batch appends identical rows with
    # the same seq (deterministic labels) — resolve must dedup them
    return (
        allrows.join(latest, ["id", "seq"], "left_semi")
        .select("id", "component")
        .distinct()
    )


def compact_state(spark: SparkSession, state_root: str) -> None:
    """Fold deltas into a fresh base snapshot (called on a maintenance
    cadence; per-batch writes stay ∝ affected size between compactions)."""
    resolved = read_state(spark, state_root)
    if resolved is None:
        return
    tmp = f"{state_root}/base_new"
    resolved.write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(state_root).getFileSystem(hconf)
    P = jvm.org.apache.hadoop.fs.Path
    # base_new is complete and durable before anything is deleted: a
    # crash here leaves base_new orphaned (harmless) or requires re-run
    fs.delete(P(f"{state_root}/base"), True)
    fs.rename(P(tmp), P(f"{state_root}/base"))
    fs.delete(P(f"{state_root}/delta"), True)


def incremental_components_maintenance(
    spark: SparkSession,
    stream_path: str,
    state_root: str,
    checkpoint_dir: str,
):
    """Run incremental CC over all currently-available stream input
    (trigger availableNow) and block until done. Per batch, only the
    rows of affected components (plus new vertices) are appended to the
    delta log, stamped with the micro-batch id as ``seq``."""
    edges = stream_edges_from_files(spark, stream_path)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        state = read_state(sess, state_root)
        e = batch.select("src", "dst")
        if state is None:
            changed = components_batch(e, None)
        else:
            batch_verts = (
                e.select(F.col("src").alias("id"))
                .unionByName(e.select(F.col("dst").alias("id")))
                .distinct()
            )
            affected = (
                state.join(batch_verts, "id", "left_semi")
                .select("component")
                .distinct()
            )
            touched = state.join(affected, "component", "left_semi")
            stars = touched.filter(F.col("id") != F.col("component")).select(
                F.col("id").alias("src"), F.col("component").alias("dst")
            )
            sub_verts = batch_verts.unionByName(touched.select("id")).distinct()
            changed = _local_cc(e.unionByName(stars), sub_verts)
        changed.select(
            "id", "component", F.lit(batch_id).cast("long").alias("seq")
        ).write.mode("append").parquet(f"{state_root}/delta")

    q = (
        edges.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
