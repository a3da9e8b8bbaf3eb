"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.10) — this module covers the
brief's streaming axis with the idiomatic Spark shapes a streaming link
graph needs: edge-stream ingestion, incremental degree state, watermarked
windowed event aggregation, a custom stateful operator
(applyInPandasWithState per-vertex degree state with timeout eviction),
and micro-batch graph maintenance via foreachBatch.
"""

from pygraphblas_spark.streaming.dedup import (
    incremental_dedup_maintenance,
    stream_documents_from_files,
)
from pygraphblas_spark.streaming.graph import (
    components_batch,
    compact_state,
    incremental_components_maintenance,
    read_state,
)
from pygraphblas_spark.streaming.core import (
    stream_edges_from_files,
    streaming_out_degree,
    stateful_degree_tracker,
    windowed_event_counts,
    run_to_completion,
    incremental_graph_maintenance,
)

__all__ = [
    "components_batch",
    "compact_state",
    "incremental_components_maintenance",
    "read_state",
    "stream_edges_from_files",
    "streaming_out_degree",
    "stateful_degree_tracker",
    "windowed_event_counts",
    "run_to_completion",
    "incremental_graph_maintenance",
    "incremental_dedup_maintenance",
    "stream_documents_from_files",
]
