"""InceptionV3 (FID variant) feature trunk, flax/NHWC.

Value-parity target: the torchmetrics FrechetInceptionDistance feature
network used by the reference third stage
(`/root/reference/STDiff/third_stage_model.py:27,750` —
`torchmetrics.image.fid.FrechetInceptionDistance(feature=2048)`), i.e. the
pytorch-fid / torch-fidelity "pt_inception-2015-12-05" InceptionV3:
torchvision's inception_v3 graph with the FID patches — the Mixed_5*/6*/7b
branch-pool average pools use count_include_pad=False and Mixed_7c's
branch pool is a MAX pool.

BatchNorm is implemented frozen (eval-mode: running mean/var are plain
parameters, eps=1e-3) — exactly the semantics of the frozen torch eval
trunk, so a weight import via `load_torch_inception_state` is bit-faithful.
Oracle-tested against a hand-built torch twin with torchvision state_dict
naming in tests/test_eval_trunks.py.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool_3x3_exclusive(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[1:3], x.dtype), 0.0, jax.lax.add, (3, 3), (1, 1),
        [(1, 1), (1, 1)],
    )
    return summed / counts[None, :, :, None]


def _max_pool(x, window, strides, padding="VALID"):
    return nn.max_pool(x, (window, window), (strides, strides), padding)


class BasicConv2d(nn.Module):
    """Conv(bias=False) + frozen BatchNorm(eps=1e-3) + ReLU."""

    features: int
    kernel: tuple = (1, 1)
    strides: tuple = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, tuple) and len(pad) == 2 and all(
            isinstance(p, int) for p in pad
        ):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=pad,
            use_bias=False, name="conv", dtype=self.dtype,
        )(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + 1e-3) * scale
        x = x * inv + (bias - mean * inv)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv2d(48, name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2",
                         dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3",
                         dtype=self.dtype)(b3)
        bp = _avg_pool_3x3_exclusive(x)
        bp = BasicConv2d(self.pool_features, name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(64, name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3",
                         dtype=self.dtype)(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3",
                         dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5",
                         dtype=self.dtype)(bd)
        bp = _avg_pool_3x3_exclusive(x)
        bp = BasicConv2d(192, name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2",
                         dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3",
                         dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4",
                         dtype=self.dtype)(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # "avg" (FIDInceptionE_1, Mixed_7b) or "max" (FIDInceptionE_2, Mixed_7c)
    pool_type: str = "avg"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, name="branch3x3_1", dtype=self.dtype)(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a",
                        dtype=self.dtype)(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b",
                        dtype=self.dtype)(b3),
        ], axis=-1)
        bd = BasicConv2d(448, name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a",
                        dtype=self.dtype)(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b",
                        dtype=self.dtype)(bd),
        ], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_3x3_exclusive(x)
        else:
            bp = nn.max_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        bp = BasicConv2d(192, name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[N,H,W,3] in [0,1] -> [N, 2048] FID pool3 features.

    resize_input / normalize_input mirror pytorch-fid's defaults: bilinear
    resize to 299^2 (antialias off, like F.interpolate) then [0,1]->[-1,1].
    """

    resize_input: bool = True
    normalize_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), "bilinear",
                antialias=False,
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3",
                        dtype=self.dtype)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3",
                        dtype=self.dtype)(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, name="Conv2d_3b_1x1", dtype=self.dtype)(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", dtype=self.dtype)(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE("avg", name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE("max", name="Mixed_7c", dtype=self.dtype)(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> 2048


def load_torch_inception_state(state_dict: Dict[str, Any]) -> Dict:
    """torchvision-named InceptionV3 state_dict -> flax params for
    InceptionV3Features.

    Mapping is mechanical because module names match torchvision exactly:
      `<scope>.conv.weight`       -> <scope>/conv/kernel   (OIHW -> HWIO)
      `<scope>.bn.weight`         -> <scope>/bn_scale
      `<scope>.bn.bias`           -> <scope>/bn_bias
      `<scope>.bn.running_mean`   -> <scope>/bn_mean
      `<scope>.bn.running_var`    -> <scope>/bn_var
    `fc.*`, `AuxLogits.*` and bookkeeping buffers are ignored.
    """
    from ..utils.torch_import import to_numpy, tree_put

    params: Dict = {}

    def put(path, v):
        tree_put(params, path, jnp.asarray(v))

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits") or "num_batches_tracked" in key:
            continue
        v = to_numpy(val)
        scope, leaf = parts[:-2], ".".join(parts[-2:])
        if leaf == "conv.weight":
            put(scope + ["conv", "kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif leaf == "bn.weight":
            put(scope + ["bn_scale"], v)
        elif leaf == "bn.bias":
            put(scope + ["bn_bias"], v)
        elif leaf == "bn.running_mean":
            put(scope + ["bn_mean"], v)
        elif leaf == "bn.running_var":
            put(scope + ["bn_var"], v)
        else:
            raise ValueError(f"unmapped torch key: {key}")
    return {"params": params}
