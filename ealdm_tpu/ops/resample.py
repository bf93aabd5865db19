"""conv2d_resample + grid_sample (NHWC).

Parity targets:
  conv2d_resample (`/root/reference/torch_utils/ops/conv2d_resample.py:46-143`):
    grouped 2D convolution with arbitrary integer up/downsampling and FIR
    filtering, composed here from `upfirdn2d` + `lax.conv_general_dilated`
    (the reference composes upfirdn2d + torch convs the same way).
  grid_sample_gradfix (`grid_sample_gradfix.py:26-77`): bilinear grid sample
    with well-defined higher-order grads — `jax.scipy.ndimage.map_coordinates`
    is functionally differentiable to any order, so no autograd override is
    needed; only the coordinate convention is adapted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .upfirdn2d import get_filter_size, setup_filter, upfirdn2d

__all__ = ["conv2d_resample", "grid_sample"]


def _conv(x, w, groups=1, stride=1):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """2D conv with optional up/downsampling. x: [N,H,W,Cin]; w: [kh,kw,Cin/groups,Cout].

    Semantics of the reference generic path (`conv2d_resample.py:135-142`):
    padding is applied ONCE at the start (inside the FIR-upsample stage),
    then a VALID (optionally strided) conv, then FIR-downsample. `padding`
    is w.r.t. the upsampled image; flip_weight=True means correlation
    (torch conv2d convention).
    """
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    elif len(padding) == 2:
        padding = (padding[0], padding[0], padding[1], padding[1])
    px0, px1, py0, py1 = padding
    fw, fh = get_filter_size(f)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if not flip_weight:  # correlation by default; flip for true convolution
        w = jnp.flip(w, axis=(0, 1))

    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
        return _conv(x, w, groups=groups, stride=down)

    x = upfirdn2d(
        x, f if up > 1 else None, up=up, padding=(px0, px1, py0, py1),
        gain=up**2 if up > 1 else 1, flip_filter=flip_filter,
    )
    x = _conv(x, w, groups=groups)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x


def grid_sample(x, grid):
    """Bilinear grid sample, torch align_corners=False convention.

    x: [N, H, W, C]; grid: [N, Hg, Wg, 2] with (x, y) in [-1, 1].
    Differentiable to arbitrary order (pure gather/lerp composition).
    """
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    def sample_one(img, cx, cy):
        # map_coordinates over each channel with order-1 (bilinear)
        def per_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [cy, cx], order=1, mode="constant", cval=0.0
            )

        return jax.vmap(per_channel, in_axes=2, out_axes=2)(img)

    return jax.vmap(sample_one)(x, gx, gy)
