"""ResNet-50 feature extractor, flax/NHWC.

Capability parity with `torchvision.models.resnet50` as used by the STDiff
tower's (bypassed) image branch (`/root/reference/STDiff/models.py:452`) and
the third-stage feature extractor (`third_stage_model.py`). Weights are
importable from a torchvision state_dict via `resnet50_key_map`; GroupNorm
replaces BatchNorm running stats (documented SPMD deviation — identical
shapes so torch BN affine params map onto the GroupNorm affine).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import resolve_num_groups


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * self.expansion
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1", dtype=self.dtype)(x)
        y = nn.GroupNorm(resolve_num_groups(self.features, 32), name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, name="conv2", dtype=self.dtype,
        )(y)
        y = nn.GroupNorm(resolve_num_groups(self.features, 32), name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", dtype=self.dtype)(y)
        y = nn.GroupNorm(resolve_num_groups(out_ch, 32), name="bn3")(y)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, name="downsample_conv", dtype=self.dtype,
            )(residual)
            residual = nn.GroupNorm(
                resolve_num_groups(out_ch, 32), name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Feature trunk: [N,H,W,3] -> [N,H/32,W/32,2048] (+ optional pooled)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 0  # 0 => feature extractor (no fc head)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, pool: bool = False):
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            name="conv1", dtype=self.dtype,
        )(x)
        y = nn.GroupNorm(32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                y = Bottleneck(
                    64 * 2**stage, strides=strides,
                    name=f"layer{stage + 1}_{b}", dtype=self.dtype,
                )(y)
        if pool or self.num_classes:
            y = jnp.mean(y, axis=(1, 2))
        if self.num_classes:
            y = nn.Dense(self.num_classes, name="fc", dtype=self.dtype)(y)
        return y
