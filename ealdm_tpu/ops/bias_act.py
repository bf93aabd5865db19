"""Fused bias + activation + gain + clamp, TPU-native.

This is the TPU equivalent of the reference's `bias_act` CUDA op
(`/root/reference/torch_utils/ops/bias_act.py`, kernel in `bias_act.cu`), the
only native op exercised on the reference EALDM forward path (via
`FullyConnectedLayer`, `/root/reference/STDiff/models.py:272`).

Two implementations with identical numerics:

* ``bias_act_ref`` — pure jnp. XLA already fuses this chain into the producing
  matmul, so on most shapes this IS the speed-of-light implementation.
* ``bias_act_pallas`` — an explicit single-pass VMEM kernel for large
  activations where we want guaranteed fusion + one HBM round-trip.

``bias_act`` picks automatically and carries a custom VJP whose backward is
itself expressed in differentiable jnp, so second-order gradients (needed by
StyleGAN-style losses) work, mirroring the reference's 2nd-order-grad autograd
wrapper (`bias_act.py:158-209`).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU only; keep importable on bare CPU wheels
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["bias_act", "bias_act_ref", "activation_funcs"]

_SQRT2 = math.sqrt(2.0)


class _ActSpec(NamedTuple):
    fn: object  # (x, alpha) -> y
    def_alpha: float
    def_gain: float


def _elu(x, alpha):
    del alpha
    return jnp.where(x > 0, x, jnp.expm1(x))


def _selu(x, alpha):
    del alpha
    lam, a = 1.0507009873554805, 1.6732632423543772
    return lam * jnp.where(x > 0, x, a * jnp.expm1(x))


# Same nine activations as the reference table (`bias_act.py:21-31`).
activation_funcs = {
    "linear": _ActSpec(lambda x, a: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, a: jnp.maximum(x, 0.0), 0.0, _SQRT2),
    "lrelu": _ActSpec(lambda x, a: jnp.where(x >= 0, x, x * a), 0.2, _SQRT2),
    "tanh": _ActSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(_elu, 0.0, 1.0),
    "selu": _ActSpec(_selu, 0.0, 1.0),
    "softplus": _ActSpec(lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, a: x * jax.nn.sigmoid(x), 0.0, _SQRT2),
}


def _resolve(act: str, alpha, gain, clamp):
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)
    assert clamp < 0 or clamp >= 0
    return spec, alpha, gain, clamp


def bias_act_ref(x, b=None, dim=-1, act="linear", alpha=None, gain=None, clamp=None):
    """Reference numerics: y = clamp(act(x + b[dim]) * gain, ±clamp)."""
    spec, alpha, gain, clamp = _resolve(act, alpha, gain, clamp)
    if b is not None:
        assert b.ndim == 1
        d = dim % x.ndim
        assert b.shape[0] == x.shape[d]
        shape = [1] * x.ndim
        shape[d] = -1
        x = x + b.reshape(shape)
    x = spec.fn(x, alpha)
    if gain != 1:
        x = x * gain
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def _pallas_kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp):
    spec = activation_funcs[act]
    # compute in fp32 on the VPU regardless of storage dtype (bf16-safe)
    x = x_ref[...].astype(jnp.float32)
    x = x + b_ref[...].astype(jnp.float32)  # bias pre-broadcast to a [1, C] row
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    o_ref[...] = x.astype(o_ref.dtype)


def _bias_act_pallas_2d(x2d, brow, act, alpha, gain, clamp, block_m):
    m, c = x2d.shape
    grid = (m // block_m,)
    return pl.pallas_call(
        functools.partial(
            _pallas_kernel, act=act, alpha=alpha, gain=gain, clamp=clamp
        ),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2d, brow)


def _pallas_eligible(x, b, dim):
    if not _HAS_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if dim % x.ndim != x.ndim - 1:
        return False  # kernel assumes channel-last bias
    c = x.shape[-1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    # tile-friendly and big enough to be worth a dedicated kernel
    return c % 128 == 0 and m % 8 == 0 and m * c >= 1 << 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def bias_act(x, b=None, dim=-1, act="linear", alpha=None, gain=None, clamp=None):
    """Fused y = clamp(act(x + b) * gain). Differentiable (2nd order too)."""
    return _fwd_impl(x, b, dim, act, alpha, gain, clamp)


def _fwd_impl(x, b, dim, act, alpha, gain, clamp):
    _, alpha_r, gain_r, clamp_r = _resolve(act, alpha, gain, clamp)
    if _pallas_eligible(x, b, dim):
        c = x.shape[-1]
        x2d = x.reshape(-1, c)
        brow = (
            b.reshape(1, c).astype(x.dtype)
            if b is not None
            else jnp.zeros((1, c), x.dtype)
        )
        m = x2d.shape[0]
        block_m = 256
        while m % block_m != 0:
            block_m //= 2
        out = _bias_act_pallas_2d(x2d, brow, act, alpha_r, gain_r, clamp_r, block_m)
        return out.reshape(x.shape)
    return bias_act_ref(x, b, dim=dim, act=act, alpha=alpha, gain=gain, clamp=clamp)


def _fwd(x, b, dim, act, alpha, gain, clamp):
    y = _fwd_impl(x, b, dim, act, alpha, gain, clamp)
    return y, (x, b)


def _bwd(dim, act, alpha, gain, clamp, res, g):
    x, b = res
    # Recompute-based backward in plain jnp: differentiable => 2nd order works.
    def f(x_, b_):
        return bias_act_ref(x_, b_, dim=dim, act=act, alpha=alpha, gain=gain, clamp=clamp)

    if b is None:
        (dx,) = jax.vjp(lambda x_: f(x_, None), x)[1](g)
        return dx, None
    dx, db = jax.vjp(f, x, b)[1](g)
    return dx, db


bias_act.defvjp(_fwd, _bwd)
