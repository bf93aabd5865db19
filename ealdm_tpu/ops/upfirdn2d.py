"""upfirdn2d and friends, TPU-native (NHWC).

TPU equivalent of the reference CUDA op suite
(`/root/reference/torch_utils/ops/upfirdn2d.py`, kernel in `upfirdn2d.cu`):
zero-insertion upsample -> pad/crop -> FIR filter -> decimate, plus the
`filter2d` / `upsample2d` / `downsample2d` wrappers and `setup_filter`.

Instead of a hand-written gather kernel, the whole pipeline is ONE XLA
`conv_general_dilated`: `lhs_dilation` performs the zero-insertion,
explicit (possibly negative) padding performs pad/crop, and `window_strides`
performs the decimation. XLA lowers this straight onto the MXU/VPU with the
surrounding elementwise ops fused, which is the idiomatic speed-of-light
formulation on TPU — there is no indexing trick for a Mosaic kernel to beat
here. Layout is NHWC (channel-last), the TPU-preferred layout; the reference
is NCHW.

Numerics match `_upfirdn2d_ref` (`upfirdn2d.py:167-214`) exactly, including
the trailing-zero subtlety of the zero-insertion upsample (the reference
appends up-1 zeros after the LAST sample too; `lhs_dilation` does not, so the
trailing zeros are folded into the high padding).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "upfirdn2d",
    "filter2d",
    "upsample2d",
    "downsample2d",
    "setup_filter",
]


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = (scaling, scaling)
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = (padding, padding)
    if len(padding) == 2:
        px, py = padding
        padding = (px, px, py, py)
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    return int(f.shape[-1]), int(f.shape[0])  # (fw, fh)


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Normalize/flip/gain-scale an FIR filter; returns 1-D (separable) or 2-D."""
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[None]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_conv(x, f2d, strides, padding, lhs_dilation):
    """NHWC depthwise conv with a per-channel-shared [fh, fw] filter."""
    c = x.shape[-1]
    kernel = jnp.tile(f2d[:, :, None, None].astype(x.dtype), (1, 1, 1, c))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _upfirdn2d_1axis(x, f1d, up, down, pad0, pad1, axis):
    """Apply up/FIR/down along one spatial axis (axis=1 => H, axis=2 => W)."""
    if axis == 1:
        f2d = f1d[:, None]
        strides = (down, 1)
        padding = ((pad0, pad1 + up - 1), (0, 0))
        lhs_dilation = (up, 1)
    else:
        f2d = f1d[None, :]
        strides = (1, down)
        padding = ((0, 0), (pad0, pad1 + up - 1))
        lhs_dilation = (1, up)
    return _depthwise_conv(x, f2d, strides, padding, lhs_dilation)


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """y = decimate(FIR(pad(zero_upsample(x)))). x: [N, H, W, C] (NHWC)."""
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    n, in_h, in_w, c = x.shape
    fw, fh = get_filter_size(f)
    assert in_w * upx + padx0 + padx1 >= fw and in_h * upy + pady0 + pady1 >= fh

    # lax conv is a correlation; the reference correlates with the flipped
    # filter when flip_filter=False (i.e. true convolution).
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    gain = float(gain)
    if f.ndim == 1:
        # separable: one pass per axis; overall gain applied once at the end.
        y = _upfirdn2d_1axis(xf, f, upx, downx, padx0, padx1, axis=2)
        y = _upfirdn2d_1axis(y, f, upy, downy, pady0, pady1, axis=1)
    else:
        y = _depthwise_conv(
            xf,
            f,
            strides=(downy, downx),
            padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
            lhs_dilation=(upy, upx),
        )
    if gain != 1.0:
        y = y * gain
    return y.astype(in_dtype)


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """Same-size FIR filtering (shape-preserving by default)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = (padx0 + fw // 2, padx1 + (fw - 1) // 2, pady0 + fh // 2, pady1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """FIR upsample by `up` with DC-preserving gain (gain * up^2)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = (
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    )
    return upfirdn2d(
        x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy
    )


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """FIR anti-aliased downsample by `down`."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = (
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
