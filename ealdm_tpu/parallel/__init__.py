"""Mesh + sharding layer (pjit data/model parallelism over ICI).

TPU-native replacement for the reference's distributed stack (PyTorch
Lightning "ddp" + NCCL all-reduce, `/root/reference/main.py:577`): a
`jax.sharding.Mesh` with a `data` axis (DP; gradient psum emitted by the
compiler) and an optional `model` axis (TP over UNet channels / attention
heads), plus the LR-scaling convention and host-side metric reduction.
"""

from .mesh import MeshConfig, create_mesh, local_batch_size, scale_learning_rate
from .sharding import (
    batch_sharding,
    param_sharding_rules,
    replicate,
    shard_batch,
    shard_params,
    shard_state,
    state_sharding_rules,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "local_batch_size",
    "scale_learning_rate",
    "batch_sharding",
    "param_sharding_rules",
    "replicate",
    "shard_batch",
    "shard_params",
    "shard_state",
    "state_sharding_rules",
]
