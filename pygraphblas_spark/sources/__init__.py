"""Sources: the engine's scan layer.

- ``codegraph``: the primary input per BASELINE.json — an Iceberg/parquet
  table of source-code repositories ``(repo, path, commit, lang, content)``
  turned into a link-graph edge table (imports ∪ commit co-occurrence).
- ``tpch_graph``: edge derivations from the driver's TPC-H-ish testdata,
  used for DuckDB-oracle-checkable queries.
"""

from pygraphblas_spark.sources.codegraph import (
    build_edges,
    build_vertices,
    extract_commit_edges,
    extract_import_edges,
    synthesize_source_table,
)

__all__ = [
    "synthesize_source_table",
    "build_vertices",
    "build_edges",
    "extract_import_edges",
    "extract_commit_edges",
]
