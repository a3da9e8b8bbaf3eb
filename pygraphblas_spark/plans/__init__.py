"""Iteration state management: checkpoints, lineage manifests, resume."""

from pygraphblas_spark.plans.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
