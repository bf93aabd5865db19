"""W8A8 int8 convolution via im2col + int8 MXU matmul.

The experiment VERDICT round-2 asked for: this chip's int8 matmul path
measures 295 TOPS (~2x the ~150 TF/s measured bf16 peak) but XLA lowers
int8 *convolutions* to a slow path (103 TOPS, ~8 min compiles) — so the
only way to buy the int8 rate for the UNet's dominant 3x3 convs
(reference ResBlocks, `ldm/modules/diffusionmodules/openaimodel.py`) is to
rewrite them as im2col patches x one big [N*H*W, 9*Cin] @ [9*Cin, Cout]
matmul.

Scheme: per-output-channel symmetric weight scales, per-tensor dynamic
symmetric activation scale (computed on the fly from max|x|), int32
accumulation, dequantized fused into the output cast. Patch extraction is
9 shifted slices (no gather).

End-to-end verdict on the DDIM pipeline: recorded in docs/PERF.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["int8_im2col_conv", "int8_eligible"]


def int8_eligible(x_shape, kernel_shape, strides, padding,
                  data_format: str) -> bool:
    """3x3 stride-1 SAME/pad-1 convs with enough channels to pay for the
    quantize/dequantize overhead (the 32^2x256-class ResBlock convs)."""
    if (kernel_shape[0], kernel_shape[1]) != (3, 3):
        return False
    if tuple(strides) != (1, 1):
        return False
    if padding not in ("SAME", 1, (1, 1), [(1, 1), (1, 1)]):
        return False
    if data_format not in ("NHWC", "HWNC"):
        return False
    return x_shape[-1] >= 128


def _patches_3x3(xp, h, w, h_axis, w_axis):
    """9 shifted views of the padded input, stacked on a new last-1 axis."""
    outs = []
    for dh in range(3):
        sl = lax.slice_in_dim(xp, dh, dh + h, axis=h_axis)
        for dw in range(3):
            outs.append(lax.slice_in_dim(sl, dw, dw + w, axis=w_axis))
    return jnp.stack(outs, axis=-2)  # [..., 9, C]


def int8_im2col_conv(x, kernel, data_format: str = "NHWC"):
    """3x3 stride-1 SAME conv as a quantized im2col matmul.

    x: [N,H,W,Cin] or [H,W,N,Cin] (any float dtype); kernel: [3,3,Cin,Cout]
    float. Returns x.dtype.
    """
    out_dtype = x.dtype
    if data_format == "NHWC":
        n, h, w, cin = x.shape
        h_axis, w_axis = 1, 2
    else:
        h, w, n, cin = x.shape
        h_axis, w_axis = 0, 1
    cout = kernel.shape[-1]

    # --- quantize activations: per-tensor symmetric int8
    xf = x.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)

    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (1, 1)
    pads[w_axis] = (1, 1)
    xq = jnp.pad(xq, pads)
    patches = _patches_3x3(xq, h, w, h_axis, w_axis)  # [..., 9, Cin] int8
    patches = patches.reshape(n * h * w, 9 * cin)

    # --- quantize weights: per-output-channel symmetric int8
    wf = kernel.astype(jnp.float32).reshape(9 * cin, cout)
    w_scale = jnp.max(jnp.abs(wf), axis=0) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / w_scale), -127, 127).astype(jnp.int8)

    acc = lax.dot_general(
        patches, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (a_scale * w_scale)
    y = y.reshape(
        (n, h, w, cout) if data_format == "NHWC" else (h, w, n, cout)
    )
    return y.astype(out_dtype)
