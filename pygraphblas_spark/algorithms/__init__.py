"""Graph algorithms over edge DataFrames — the reference's demo workload
(SURVEY.md §2.11) re-expressed as iterative, checkpointed Spark jobs.

All hot loops operate on raw DataFrames (src, dst[, val]) with explicit
partitioning; the Matrix/Vector facades are the construction/test-level API.
"""

from pygraphblas_spark.algorithms.pagerank import pagerank
from pygraphblas_spark.algorithms.components import connected_components
from pygraphblas_spark.algorithms.labelprop import label_propagation
from pygraphblas_spark.algorithms.triangles import triangle_count, triangle_count_sandia
from pygraphblas_spark.algorithms.bfs import bfs_levels, bfs_tree
from pygraphblas_spark.algorithms.sssp import sssp
from pygraphblas_spark.algorithms.ktruss import k_truss
from pygraphblas_spark.algorithms.betweenness import betweenness_centrality
from pygraphblas_spark.algorithms.louvain import louvain, modularity
from pygraphblas_spark.algorithms.tricentrality import (
    triangle_centrality,
    degree_centrality,
)

__all__ = [
    "triangle_centrality",
    "degree_centrality",
    "louvain",
    "modularity",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_count_sandia",
    "bfs_levels",
    "bfs_tree",
    "sssp",
    "k_truss",
    "betweenness_centrality",
]
