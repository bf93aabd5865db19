"""Fused Pallas GroupNorm(+bias-add+SiLU) kernel on HWNC-viewed activations.

Why a kernel: XLA lowers each GroupNorm into a chain of small reduce /
elementwise fusions, and on this chip every such op carries a fixed
~30-85us pipeline cost regardless of size — the UNet's ~40 GroupNorm ops
per DDIM step cost ~4 ms of a 14 ms step while the convs already run at
~189 TF/s (profiled with jax.profiler on TPU v5e; see PARITY.md perf
notes). The win comes from *removing ops from the graph*: one pallas_call
per GroupNorm replaces the whole stats + broadcast + affine + SiLU chain,
and also absorbs the ResBlock's timestep-embedding bias add.

Layout: XLA lays diffusion-UNet activations out as {3,0,2,1} — physically
H,W,N,C-major. A kernel consuming the logical NHWC array would force a
relayout copy on entry and exit (measured +280 ms/program, more than it
saves). Callers instead hand us `jnp.transpose(x, (1, 2, 0, 3))`: for a
{3,0,2,1}-laid-out x this HWNC view is a bitcast, the kernel reads and
writes the bytes in place with the native (N, C) minor tile on
(sublane, lane), and the caller transposes the result back (again a
bitcast when the consumer keeps the conv layout).

Group statistics: per-(sample, channel) sums are cross-spatial reductions
accumulated in VMEM scratch across an H-chunked grid (phase 0); the
group-sum over C/G adjacent channels and the broadcast back to channels
are two tiny one-hot matmuls ([N,C]@[C,G] and [N,G]@[G,C],
Precision.HIGHEST so fp32 operands are not truncated to bf16 on the MXU)
so Mosaic never relayouts a lane vector; phase 1 re-reads each chunk and
writes the normalized output — 2 reads + 1 write, all at HBM bandwidth,
in a single XLA op. When the whole tensor fits in VMEM the grid collapses
to one single-pass step.

Reference semantics matched: `GroupNorm32` (fp32 statistics regardless of
input dtype, `/root/reference/ldm/modules/diffusionmodules/util.py:214-218`)
and the eps=1e-6 GroupNorm of the VAE/attention stacks
(`/root/reference/ldm/modules/diffusionmodules/model.py:38-40`).

Differentiable: callers wrap this in a custom VJP that recomputes the
plain-jnp formulation's backward (rematerialization — no residuals saved).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_hwnc", "supports_fused_group_norm"]

# Single-pass cap: bf16 in + bf16 out blocks plus the fp32 temporaries
# Mosaic materializes (~12 B/elem total) must stay under the ~16 MB VMEM.
_MAX_ELEMS_SINGLE = 524_288
# Chunked-phase cap: the input/output chunks are double-buffered, so the
# budget per chunk is half again.
_MAX_ELEMS_CHUNK = 262_144


def _h_chunk(h: int, w: int, n: int, c: int) -> int:
    """Largest divisor of h whose [hb, W, N, C] chunk fits VMEM (0 if none)."""
    best = 0
    for hb in range(1, h + 1):
        if h % hb == 0 and hb * w * n * c <= _MAX_ELEMS_CHUNK:
            best = hb
    return best


def supports_fused_group_norm(shape, num_groups: int) -> bool:
    """Eligibility of NHWC `shape`: lane-aligned C divisible into groups,
    sublane-aligned N, and an H-chunk that fits VMEM."""
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if c % 128 != 0 or num_groups < 1 or c % num_groups != 0:
        return False
    if n % 8 != 0:
        return False
    return _h_chunk(h, w, n, c) > 0


def _group_affine(s, sq, scale, bias, *, num_groups, eps, cnt_per_group):
    """From per-(sample, channel) sums -> per-(sample, channel) (a, b) with
    y = x*a + b. Group mixing via one-hot MXU matmuls."""
    n, c = s.shape
    cg = c // num_groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (ch // cg == gr).astype(jnp.float32)
    dg = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mean_g = dg(s, onehot) / cnt_per_group  # [N, G]
    var_g = jnp.maximum(dg(sq, onehot) / cnt_per_group - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    rstd_c = dg(rstd_g, onehot.T)  # [N, C]
    mean_c = dg(mean_g, onehot.T)
    a = rstd_c * scale[None, :]
    b = bias[None, :] - mean_c * a
    return a, b


def _single_kernel(x_ref, scale_ref, bias_ref, pre_ref, o_ref,
                   *, num_groups, eps, fuse_silu, has_pre):
    h, w, n, c = x_ref.shape
    xf = x_ref[...].astype(jnp.float32)
    if has_pre:
        xf = xf + pre_ref[...].astype(jnp.float32)[None, None, :, :]
    s = jnp.sum(xf, axis=(0, 1))
    sq = jnp.sum(xf * xf, axis=(0, 1))
    a, b = _group_affine(
        s, sq, scale_ref[...].astype(jnp.float32),
        bias_ref[...].astype(jnp.float32),
        num_groups=num_groups, eps=eps,
        cnt_per_group=jnp.float32(h * w * (c // num_groups)),
    )
    y = xf * a[None, None, :, :] + b[None, None, :, :]
    if fuse_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _chunked_kernel(x_ref, scale_ref, bias_ref, pre_ref, o_ref, acc_ref,
                    *, num_groups, eps, fuse_silu, has_pre, hw):
    p = pl.program_id(0)  # phase: 0 = accumulate stats, 1 = normalize
    i = pl.program_id(1)
    n, c = x_ref.shape[2], x_ref.shape[3]

    xf = x_ref[...].astype(jnp.float32)
    if has_pre:
        xf = xf + pre_ref[...].astype(jnp.float32)[None, None, :, :]

    @pl.when(p == 0)
    def _():
        s = jnp.sum(xf, axis=(0, 1))
        sq = jnp.sum(xf * xf, axis=(0, 1))

        @pl.when(i == 0)
        def _():
            acc_ref[0] = s
            acc_ref[1] = sq

        @pl.when(i > 0)
        def _():
            acc_ref[0] += s
            acc_ref[1] += sq

        # phase-0 output flush must not leave garbage if phase 1 is ever
        # skipped; cheap passthrough keeps the DMA deterministic.
        o_ref[...] = x_ref[...]

    @pl.when(p == 1)
    def _():
        @pl.when(i == 0)
        def _():
            a, b = _group_affine(
                acc_ref[0], acc_ref[1],
                scale_ref[...].astype(jnp.float32),
                bias_ref[...].astype(jnp.float32),
                num_groups=num_groups, eps=eps,
                cnt_per_group=jnp.float32(hw * (c // num_groups)),
            )
            acc_ref[0] = a
            acc_ref[1] = b

        y = xf * acc_ref[0][None, None, :, :] + acc_ref[1][None, None, :, :]
        if fuse_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[...] = y.astype(o_ref.dtype)


def group_norm_hwnc(x_hwnc, scale, bias, num_groups: int, eps: float,
                    fuse_silu: bool = False, pre_bias=None):
    """GroupNorm(+SiLU) of an HWNC-viewed NHWC tensor; returns the HWNC
    view of the result. `pre_bias` ([N, C], e.g. the ResBlock's timestep
    embedding projection) is added to x before the statistics."""
    h, w, n, c = x_hwnc.shape
    has_pre = pre_bias is not None
    if pre_bias is None:
        pre_bias = jnp.zeros((n, c), x_hwnc.dtype)

    if h * w * n * c <= _MAX_ELEMS_SINGLE:
        kernel = functools.partial(
            _single_kernel, num_groups=num_groups, eps=eps,
            fuse_silu=fuse_silu, has_pre=has_pre,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w, n, c), x_hwnc.dtype),
        )(x_hwnc, scale, bias, pre_bias)

    hb = _h_chunk(h, w, n, c)
    kernel = functools.partial(
        _chunked_kernel, num_groups=num_groups, eps=eps,
        fuse_silu=fuse_silu, has_pre=has_pre, hw=h * w,
    )
    return pl.pallas_call(
        kernel,
        grid=(2, h // hb),
        in_specs=[
            pl.BlockSpec((hb, w, n, c), lambda p, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda p, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda p, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, w, n, c), lambda p, i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, n, c), x_hwnc.dtype),
        scratch_shapes=[pltpu.VMEM((2, n, c), jnp.float32)],
    )(x_hwnc, scale, bias, pre_bias)
