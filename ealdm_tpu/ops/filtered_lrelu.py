"""filtered_lrelu: fused upsample -> biased leaky-ReLU -> downsample (NHWC).

TPU equivalent of the reference's largest CUDA op
(`/root/reference/torch_utils/ops/filtered_lrelu.py`, 1.7k lines of CUDA in
`filtered_lrelu.cu`). Numerics follow `_filtered_lrelu_ref`
(`filtered_lrelu.py:121-156`): bias -> upfirdn2d(up, gain=up^2) ->
lrelu(slope)*gain with clamp -> upfirdn2d(down).

On TPU the composition is expressed with the XLA-native `upfirdn2d` and the
fused `bias_act`; XLA fuses the elementwise middle stage into the convs and
rematerialization replaces the CUDA sign-buffer trick, so no bespoke Mosaic
kernel is needed for speed-of-light here.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn2d import get_filter_size, upfirdn2d, _parse_padding

__all__ = ["filtered_lrelu"]


def filtered_lrelu(
    x,
    fu=None,
    fd=None,
    b=None,
    up=1,
    down=1,
    padding=0,
    gain=math.sqrt(2.0),
    slope=0.2,
    clamp=None,
):
    """x: [N, H, W, C]; fu/fd: 1-D separable or 2-D FIR filters; b: [C]."""
    assert x.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    px0, px1, py0, py1 = _parse_padding(padding)
    fu_w, fu_h = get_filter_size(fu)
    fd_w, fd_h = get_filter_size(fd)

    in_dtype = x.dtype
    n, in_h, in_w, c = x.shape
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    x = bias_act(x, b, dim=-1)  # bias only (linear act)
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1), gain=up**2)
    x = bias_act(x, None, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down)

    assert x.shape == (n, out_h, out_w, c)
    return x.astype(in_dtype)
