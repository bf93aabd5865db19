"""ResNet-50 feature extractor, flax/NHWC, torchvision-faithful.

Capability parity with `torchvision.models.resnet50` as used by the STDiff
tower's (bypassed) image branch (`/root/reference/STDiff/models.py:452`) and
the third-stage feature extractor (`third_stage_model.py`).

Two norm modes:
  * `norm="group"` (default): GroupNorm(32). The right choice for the
    zero-egress consumers that run the trunk at RANDOM init (third-stage
    fc heads, retrieval embeddings) — frozen eval-mode BN is the identity
    at init, so without a real normalizer residual addition compounds
    activation variance ~2x per bottleneck and the pooled features explode.
  * `norm="frozen_bn"`: eval-mode BatchNorm2d with running stats as plain
    parameters (eps=1e-5) — construct with this to make a torchvision
    `state_dict()` import value-exact (`load_torch_resnet50_state`,
    oracle-tested in tests/test_eval_trunks.py).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm2d: y = (x - mean) * rsqrt(var + eps) * w + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps) * scale
        return x * inv + (bias - mean * inv)


def _make_norm(norm: str, features: int, name: str):
    if norm == "frozen_bn":
        return FrozenBatchNorm(features, name=name)
    if norm == "group":
        return nn.GroupNorm(num_groups=min(32, features), name=name)
    raise ValueError(f"unknown norm mode: {norm!r}")


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * self.expansion
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1", dtype=self.dtype)(x)
        y = _make_norm(self.norm, self.features, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, name="conv2", dtype=self.dtype,
        )(y)
        y = _make_norm(self.norm, self.features, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", dtype=self.dtype)(y)
        y = _make_norm(self.norm, out_ch, "bn3")(y)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, name="downsample_conv", dtype=self.dtype,
            )(residual)
            residual = _make_norm(self.norm, out_ch, "downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Feature trunk: [N,H,W,3] -> [N,H/32,W/32,2048] (+ optional pooled)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 0  # 0 => feature extractor (no fc head)
    norm: str = "group"  # "frozen_bn" for torchvision weight import
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, pool: bool = False):
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            name="conv1", dtype=self.dtype,
        )(x)
        y = _make_norm(self.norm, 64, "bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                y = Bottleneck(
                    64 * 2**stage, strides=strides, norm=self.norm,
                    name=f"layer{stage + 1}_{b}", dtype=self.dtype,
                )(y)
        if pool or self.num_classes:
            y = jnp.mean(y, axis=(1, 2))
        if self.num_classes:
            y = nn.Dense(self.num_classes, name="fc", dtype=self.dtype)(y)
        return y


def load_torch_resnet50_state(state_dict: Dict[str, Any],
                              stage_sizes=(3, 4, 6, 3)) -> Dict:
    """torchvision resnet50 `state_dict()` -> flax params for
    `ResNet50(norm="frozen_bn")` (the imported running stats live in
    FrozenBatchNorm parameters; the default GroupNorm trunk has a different
    parameter structure and cannot host them).

    torchvision naming translated:
      conv{k}.weight            -> conv{k}/kernel (OIHW -> HWIO)
      bn{k}.weight/bias         -> bn{k}/scale,bias
      bn{k}.running_mean/var    -> bn{k}/mean,var
      layer{s}.{b}.*            -> layer{s}_{b}/*
      layer{s}.{b}.downsample.0 -> downsample_conv ; .1 -> downsample_bn
      fc.weight/bias            -> fc/kernel (T), fc/bias
    """
    from ..utils.torch_import import to_numpy as to_np, tree_put

    params: Dict = {}

    def put(path, v):
        tree_put(params, path, jnp.asarray(v))

    def put_conv(path, key):
        put(path + ["kernel"], np.transpose(to_np(state_dict[key]),
                                            (2, 3, 1, 0)))

    def put_bn(path, prefix):
        put(path + ["scale"], to_np(state_dict[f"{prefix}.weight"]))
        put(path + ["bias"], to_np(state_dict[f"{prefix}.bias"]))
        put(path + ["mean"], to_np(state_dict[f"{prefix}.running_mean"]))
        put(path + ["var"], to_np(state_dict[f"{prefix}.running_var"]))

    put_conv(["conv1"], "conv1.weight")
    put_bn(["bn1"], "bn1")
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            for k in (1, 2, 3):
                put_conv([f, f"conv{k}"], f"{t}.conv{k}.weight")
                put_bn([f, f"bn{k}"], f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in state_dict:
                put_conv([f, "downsample_conv"], f"{t}.downsample.0.weight")
                put_bn([f, "downsample_bn"], f"{t}.downsample.1")
    if "fc.weight" in state_dict:
        put(["fc", "kernel"], to_np(state_dict["fc.weight"]).T)
        put(["fc", "bias"], to_np(state_dict["fc.bias"]))
    return {"params": params}
