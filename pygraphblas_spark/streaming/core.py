"""Streaming kernels: edge ingestion, incremental degree, windowed events.

Design for a production stream at scale:
- file/Kafka source → ``readStream`` with a fixed schema (no inference on
  the hot path);
- stateful aggregations keyed by vertex id — state store partitioned the
  same way the batch engine partitions vertices, so a streaming degree
  vector can be joined against batch ranks without reshuffle;
- watermarks bound state for event-time windows (late data dropped after
  the horizon — explicit, not silent);
- graph maintenance (dedup + append to the canonical edge table) runs in
  ``foreachBatch`` where the full batch DataFrame API (joins against the
  existing table) is available.

Tests run every query with ``trigger(availableNow=True)`` — processes all
available input then stops — so results are deterministic.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_edges_from_files(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming edge source: a directory of JSON files, fixed schema.

    ``max_files_per_trigger`` chunks a long-lived (or availableNow)
    query into micro-batches of at most that many files — the
    production shape where ONE query processes arriving batches on a
    cadence instead of a fresh query lifecycle per batch."""
    reader = spark.readStream.schema(EDGE_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def streaming_out_degree(edges: DataFrame) -> DataFrame:
    """Incremental out-degree over an unbounded edge stream — running
    count per src maintained in the state store."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    by: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark: late rows
    beyond ``watermark`` are dropped and their window state is evicted —
    bounded state on an unbounded stream.

    ``by`` adds dimension keys to the window group; ``value_col`` adds
    ``sum_value`` (callers wanting cross-engine-exact sums should pass an
    integer column — double summation is order-dependent). Works on
    batch DataFrames too (the watermark is a no-op there), so the same
    code path serves backfill and live streams."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("sum_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *by)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *by,
            "n",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def run_to_completion(
    df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "update",
    format: str = "memory",
    query_name: str = "q",
):
    """Execute a streaming DataFrame over all currently-available input
    (trigger availableNow) and block until done. Returns the query."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format(format)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stateful_degree_tracker(
    edges: DataFrame,
    inactivity_timeout_ms: int = 0,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-vertex running out-degree and cumulative weight, maintained in
    the state store across micro-batches (the streaming analog of the
    engine's degree vector).

    State schema: (degree: long, weight: double). Each micro-batch the
    group's new edges arrive as pandas frames (Arrow batches — no per-row
    Python); the updated running totals are emitted. With
    ``inactivity_timeout_ms`` > 0, vertices idle longer than the timeout
    have their state evicted and are emitted once with ``expired=true``
    — bounded state on an unbounded stream.

    Output: (id: long, degree: long, weight: double, expired: boolean).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if inactivity_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )

    def track(key, pdfs, state: GroupState):
        (vid,) = key
        if state.hasTimedOut:
            deg, wt = state.get
            state.remove()
            yield pd.DataFrame(
                {"id": [vid], "degree": [deg], "weight": [wt], "expired": [True]}
            )
            return
        deg, wt = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            deg += len(pdf)
            wt += float(pdf["val"].fillna(0.0).sum())
        state.update((deg, wt))
        if inactivity_timeout_ms > 0:
            state.setTimeoutDuration(inactivity_timeout_ms)
        yield pd.DataFrame(
            {"id": [vid], "degree": [deg], "weight": [wt], "expired": [False]}
        )

    return edges.groupBy(F.col("src")).applyInPandasWithState(
        track,
        outputStructType="id long, degree long, weight double, expired boolean",
        stateStructType="degree long, weight double",
        outputMode="update",
        timeoutConf=timeout,
    )


def incremental_graph_maintenance(
    spark: SparkSession,
    stream_path: str,
    table_path: str,
    checkpoint_dir: str,
):
    """Micro-batch graph maintenance: each batch of streamed edges is
    deduplicated against the canonical parquet edge table and appended —
    the streaming ingest path for the batch engine's input.

    foreachBatch gives the full batch API (anti-join against the existing
    table); the canonical table stays distinct. At scale the anti-join
    prunes with partition filters on the table's bucketing.
    """
    edges = stream_edges_from_files(spark, stream_path)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        new = batch.select("src", "dst", "val").dropDuplicates(["src", "dst"])
        # existence via the Hadoop FileSystem API — works on any
        # supported store (s3a/gs/abfs/hdfs/file), unlike os.path
        sess = batch.sparkSession
        jvm = sess._jvm
        hconf = sess._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(table_path)
        if p.getFileSystem(hconf).exists(p):
            existing = sess.read.parquet(table_path)
            new = new.join(
                existing.select("src", "dst"), ["src", "dst"], "left_anti"
            )
        new.write.mode("append").parquet(table_path)

    q = (
        edges.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
