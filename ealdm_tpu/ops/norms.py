"""Normalization primitives (NHWC, fp32-accumulated).

Parity targets: `GroupNorm32` (`/root/reference/ldm/modules/diffusionmodules/
util.py:214-218`, fp32 compute regardless of input dtype), the eps=1e-6
GroupNorm used by the VAE/attention stacks (`model.py:38-40`,
`attention.py:74`), and `nn.InstanceNorm2d` as used by STDiff AdaIN
(`/root/reference/STDiff/models.py:362-377`, affine=False, eps=1e-5).

All are written as plain jnp on NHWC tensors: XLA fuses the normalize +
affine + (optional) SiLU chain into neighbouring convs, which is the
speed-of-light formulation — the moment-reduction is HBM-bound and fusion
removes the extra round trip that a separate kernel would keep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["group_norm", "instance_norm_2d", "layer_norm", "silu"]


def silu(x):
    return x * jax.nn.sigmoid(x)


# Global normalization-statistics precision. fp32 is the training default
# (reference GroupNorm32 semantics); "native" keeps the compute dtype (bf16)
# for inference speed — ~9% end-to-end on the 256^2 DDIM-50 pipeline.
_NORM_STATS_DTYPE = "fp32"


def set_norm_stats_precision(mode: str):
    """mode: 'fp32' (default, training-grade) or 'native' (fast inference)."""
    global _NORM_STATS_DTYPE
    assert mode in ("fp32", "native")
    _NORM_STATS_DTYPE = mode


def _stats_dtype(x):
    return x.dtype if _NORM_STATS_DTYPE == "native" else jnp.float32


def resolve_num_groups(c: int, num_groups: int) -> int:
    """Largest group count <= num_groups that divides c (tiny-channel safe)."""
    g = min(num_groups, c)
    while c % g != 0:
        g -= 1
    return g


def group_norm(x, scale, bias, num_groups=32, eps=1e-5, act=None):
    """GroupNorm over NHWC input; stats in fp32 (or native, see
    set_norm_stats_precision); optional fused act."""
    in_dtype = x.dtype
    n, h, w, c = x.shape
    num_groups = resolve_num_groups(c, num_groups)
    sd = _stats_dtype(x)
    xf = x.astype(sd).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    if scale is not None:
        xf = xf * scale.astype(sd)
    if bias is not None:
        xf = xf + bias.astype(sd)
    if act is not None:
        xf = act(xf)
    return xf.astype(in_dtype)


def instance_norm_2d(x, eps=1e-5):
    """Per-(sample, channel) spatial normalization of NHWC input (no affine)."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(in_dtype)


def layer_norm(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis; stats follow set_norm_stats_precision."""
    in_dtype = x.dtype
    sd = _stats_dtype(x)
    xf = x.astype(sd)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        xf = xf * scale.astype(sd)
    if bias is not None:
        xf = xf + bias.astype(sd)
    return xf.astype(in_dtype)
