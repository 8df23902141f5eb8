"""Mesh / sharding / distributed-training layer.

The reference has NO distributed code (SURVEY §2.8: single CUDA device, one
EMA-sync comment placeholder). This package is the TPU-native parallelism
story built from scratch: `jax.sharding.Mesh` over ICI, NamedSharding
partition rules for data/tensor parallelism, and jitted training steps whose
collectives XLA inserts automatically (psum over dp for gradients, all-gather
at tp boundaries). PP/EP are intentionally absent — no model in this zoo is
pipeline- or expert-shaped (≤1.6B dense params).
"""

from neuralcodecs_tpu.parallel.mesh import make_mesh, mesh_axes_for
from neuralcodecs_tpu.parallel.sharding import (
    param_shardings,
    batch_sharding,
    replicated,
)

__all__ = [
    "make_mesh",
    "mesh_axes_for",
    "param_shardings",
    "batch_sharding",
    "replicated",
]
