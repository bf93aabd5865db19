"""Device mesh construction and DP/TP axis layout.

The mesh is laid out so the `data` axis rides the fastest ICI dimension; on
multi-slice systems DCN maps to the outermost axis. Collectives (grad psum,
param all-gather under TP) are emitted by the compiler from sharding
annotations — there is no hand-written communication layer to maintain,
unlike the reference's NCCL path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1   # tensor-parallel degree (UNet channels / attn heads)

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        assert data * model == n_devices, (
            f"mesh {data}x{model} != {n_devices} devices"
        )
        return data, model


def create_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    data = mesh.shape["data"]
    assert global_batch % data == 0, (global_batch, data)
    return global_batch // data


def scale_learning_rate(
    base_lr: float,
    batch_size: int,
    n_devices: int,
    accumulate_grad_batches: int = 1,
    scale_lr: bool = True,
) -> float:
    """Reference LR convention: lr = accumulate x ndev x bs x base_lr
    (`/root/reference/main.py:741-745`); pass scale_lr=False to use base_lr."""
    if not scale_lr:
        return base_lr
    return accumulate_grad_batches * n_devices * batch_size * base_lr
