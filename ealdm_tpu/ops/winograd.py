"""Winograd fast convolution F(2x2,3x3) / F(4x4,3x3) for stride-1 SAME 3x3.

This is the FLOP-reduction lever for the UNet/VAE conv stacks (reference
burns its 3x3 convs through cuDNN, `ldm/modules/diffusionmodules/
openaimodel.py` ResBlocks + `ldm/modules/diffusionmodules/model.py` VAE):
F(2,3) does 16 multiplies per 4-pixel output tile where direct does 36
(2.25x fewer), F(4,3) does 36 per 16 pixels (4x fewer).

TPU-v5e VERDICT (measured, see docs/PERF.md): it LOSES. The chip's
FLOP:byte ratio (~240) means the r^2/m^2 memory amplification of the
transformed tensors (4x for F(2,3), 2.25x for F(4,3)) plus the extra
transform ops cost more than the multiply reduction saves — direct conv
0.37 ms vs F(2,3) 0.73 ms / F(4,3) 0.59 ms on the dominant 32^2x256ch
shape, and end-to-end the DDIM pipeline slows down (numbers in
docs/PERF.md). The implementation is kept behind `set_conv_impl` as the
recorded kill of this lever, and because the trade flips on op-count-bound
or future low-FLOP:byte parts.

Numerics: tile/inverse transforms run in fp32; only the per-position
batched matmul runs in the compute dtype. bf16 relative error ~6e-3 for
F(2,3) and ~2.5e-2 for F(4,3) vs ~1.4e-3 for direct bf16 conv (amplified
transform values cost bf16 mantissa bits).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "set_conv_impl", "get_conv_impl", "conv2d", "winograd_conv2d",
    "winograd_eligible",
]

# ---------------------------------------------------------------------------
# Transform matrices (Lavin & Gray 2015 cooked points {0,±1,±2}).
# F(2x2,3x3): input tile 4, output tile 2. F(4x4,3x3): input 6, output 4.
_BT = {
    2: np.array(
        [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
        np.float32,
    ),
    4: np.array(
        [
            [4, 0, -5, 0, 1, 0],
            [0, -4, -4, 1, 1, 0],
            [0, 4, -4, -1, 1, 0],
            [0, -2, -1, 2, 1, 0],
            [0, 2, -1, -2, 1, 0],
            [0, 4, 0, -5, 0, 1],
        ],
        np.float32,
    ),
}
_G = {
    2: np.array(
        [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
    ),
    4: np.array(
        [
            [1 / 4, 0, 0],
            [-1 / 6, -1 / 6, -1 / 6],
            [-1 / 6, 1 / 6, -1 / 6],
            [1 / 24, 1 / 12, 1 / 6],
            [1 / 24, -1 / 12, 1 / 6],
            [0, 0, 1],
        ],
        np.float32,
    ),
}
_AT = {
    2: np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32),
    4: np.array(
        [
            [1, 1, 1, 1, 1, 0],
            [0, 1, -1, 2, -2, 0],
            [0, 1, 1, 4, 4, 0],
            [0, 1, -1, 8, -8, 1],
        ],
        np.float32,
    ),
}

# Global conv implementation switch, mirroring ops.norms.set_norm_impl.
#   "xla"       : lax.conv_general_dilated everywhere (default; fastest
#                 measured on TPU v5e — see module docstring)
#   "winograd2" : F(2x2,3x3) for eligible 3x3 convs
#   "winograd4" : F(4x4,3x3) for eligible 3x3 convs
#   "int8"      : W8A8 im2col matmul for eligible high-channel 3x3 convs
#                 (ops/im2col_int8.py)
_CONV_IMPL = "xla"


def set_conv_impl(mode: str):
    global _CONV_IMPL
    assert mode in ("xla", "winograd2", "winograd4", "int8"), mode
    _CONV_IMPL = mode


def get_conv_impl() -> str:
    return _CONV_IMPL


def winograd_eligible(x_shape, kernel_shape, strides, padding,
                      data_format: str) -> bool:
    """3x3, stride 1, SAME/pad-1, spatial dims known and >= the output tile."""
    kh, kw = kernel_shape[0], kernel_shape[1]
    if (kh, kw) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if padding not in ("SAME", 1, (1, 1), [(1, 1), (1, 1)]):
        return False
    if data_format not in ("NHWC", "HWNC"):
        return False
    h, w = ((x_shape[1], x_shape[2]) if data_format == "NHWC"
            else (x_shape[0], x_shape[1]))
    return h >= 2 and w >= 2


def _extract_tiles(xp, th, tw, m, r, h_axis, w_axis):
    """Overlapping r x r tiles at stride m via strided slices (no gather).

    xp: padded input with H' >= m*(th-1)+r along h_axis (same for W).
    Returns an array with h_axis replaced by (th, r) and w_axis by (tw, r).
    """
    rows = [
        lax.slice_in_dim(xp, k, k + m * (th - 1) + 1, stride=m, axis=h_axis)
        for k in range(r)
    ]
    x1 = jnp.stack(rows, axis=h_axis + 1)  # [..., th, r, ... W' ...]
    cols = [
        lax.slice_in_dim(x1, k, k + m * (tw - 1) + 1, stride=m,
                         axis=w_axis + 1)
        for k in range(r)
    ]
    return jnp.stack(cols, axis=w_axis + 2)


def winograd_conv2d(x, kernel, m: int = 2, data_format: str = "NHWC",
                    mm_dtype=None):
    """3x3 stride-1 SAME conv via Winograd F(m x m, 3x3).

    x: [N,H,W,Cin] or [H,W,N,Cin]; kernel: [3,3,Cin,Cout] (HWIO).
    Transforms in fp32; the per-position batched matmul in `mm_dtype`
    (defaults to x.dtype). Output dtype == x.dtype.
    """
    assert m in (2, 4)
    r = m + 2  # input tile size
    BT = jnp.asarray(_BT[m])
    G = jnp.asarray(_G[m])
    AT = jnp.asarray(_AT[m])
    out_dtype = x.dtype
    mm_dtype = mm_dtype or out_dtype

    if data_format == "NHWC":
        n, h, w_sz, cin = x.shape
        h_axis, w_axis = 1, 2
    else:  # HWNC
        h, w_sz, n, cin = x.shape
        h_axis, w_axis = 0, 1
    cout = kernel.shape[-1]

    th = -(-h // m)
    tw = -(-w_sz // m)
    # SAME for 3x3 needs 1 pixel of left/top halo; right/bottom halo is
    # 1 + tile round-up slack.
    pad_h = (1, m * (th - 1) + r - h - 1)
    pad_w = (1, m * (tw - 1) + r - w_sz - 1)
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = pad_h
    pads[w_axis] = pad_w
    xp = jnp.pad(x, pads)

    t = _extract_tiles(xp, th, tw, m, r, h_axis, w_axis)
    # -> NHWC: [N, th, r, tw, r, C]; HWNC: [th, r, tw, r, N, C]
    if data_format == "NHWC":
        t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))  # [N, th, tw, r, r, C]
    else:
        t = jnp.transpose(t, (0, 2, 4, 1, 3, 5))  # [th, tw, N, r, r, C]
    tf = t.astype(jnp.float32)

    # V = BT @ X @ B over the trailing (r, r) spatial dims.
    V = jnp.einsum("...jkc,ij->...ikc", tf, BT, precision=lax.Precision.HIGHEST)
    V = jnp.einsum("...ikc,kj->...ijc", V, BT.T, precision=lax.Precision.HIGHEST)
    ntiles = n * th * tw
    # position-major layout: p leading -> r*r independent MXU matmuls
    V = jnp.transpose(V.reshape(ntiles, r * r, cin), (1, 0, 2))
    V = V.astype(mm_dtype)

    # U = G @ W @ G^T  (per channel pair); tiny vs the main matmul.
    wf = kernel.astype(jnp.float32)
    U = jnp.einsum("ij,jkcd->ikcd", G, wf, precision=lax.Precision.HIGHEST)
    U = jnp.einsum("ikcd,kj->ijcd", U, G.T, precision=lax.Precision.HIGHEST)
    U = U.reshape(r * r, cin, cout).astype(mm_dtype)

    # r^2 batched matmuls: [p, ntiles, cin] x [p, cin, cout]. For fp32
    # staging force true-fp32 MXU passes (TPU otherwise lowers fp32
    # contractions to bf16 by default precision).
    prec = (lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else lax.Precision.DEFAULT)
    Y = jnp.einsum("pnc,pcd->pnd", V, U,
                   preferred_element_type=jnp.float32, precision=prec)

    Y = jnp.transpose(Y, (1, 0, 2)).reshape(
        (n, th, tw, r, r, cout) if data_format == "NHWC"
        else (th, tw, n, r, r, cout)
    )
    y = jnp.einsum("...jkc,ij->...ikc", Y, AT, precision=lax.Precision.HIGHEST)
    y = jnp.einsum("...ikc,kj->...ijc", y, AT.T, precision=lax.Precision.HIGHEST)  # [..., m, m, cout]
    if data_format == "NHWC":
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            n, th * m, tw * m, cout)
        y = y[:, :h, :w_sz]
    else:
        y = jnp.transpose(y, (0, 3, 1, 4, 2, 5)).reshape(
            th * m, tw * m, n, cout)
        y = y[:h, :w_sz]
    return y.astype(out_dtype)


def conv2d(x, kernel, strides=(1, 1), padding="SAME",
           data_format: str = "NHWC", dtype=None):
    """Conv dispatch honoring set_conv_impl; the Conv2D module entry point."""
    dtype = dtype or x.dtype
    impl = _CONV_IMPL
    if impl == "int8":
        from .im2col_int8 import int8_eligible, int8_im2col_conv

        if int8_eligible(x.shape, kernel.shape, strides, padding,
                         data_format):
            return int8_im2col_conv(
                x.astype(dtype), kernel, data_format=data_format)
    elif impl != "xla" and winograd_eligible(
        x.shape, kernel.shape, strides, padding, data_format
    ):
        return winograd_conv2d(
            x.astype(dtype), kernel,
            m=2 if impl == "winograd2" else 4,
            data_format=data_format, mm_dtype=dtype,
        )
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    dn = (("NHWC", "HWIO", "NHWC") if data_format == "NHWC"
          else ("HWNC", "HWIO", "HWNC"))
    return lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=tuple(strides), padding=pad, dimension_numbers=dn,
    )
