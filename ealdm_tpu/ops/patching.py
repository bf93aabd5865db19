"""Overlapping-patch (fold/unfold) inference for oversized inputs.

Parity target: reference `ldm/models/diffusion/ddpm.py`
  meshgrid/delta_border/get_weighting (572-607), get_fold_unfold (609-659),
  and the `split_input_params` branches of decode_first_stage (723-830),
  encode_first_stage (835-880) and apply_model (923-1009).

The reference splits a large latent/image into an overlapping grid of crops
with `torch.nn.Unfold`, runs the network crop-by-crop in a Python loop, then
stitches with `torch.nn.Fold` using a border-distance weighting so crop seams
blend smoothly (overlap mass is normalised away by folding the weight map).

TPU-first redesign:
  * The patch grid is static at trace time, so `unfold2d` is one XLA gather.
  * `fold2d` is not re-derived by hand: torch's Fold is *defined* as the
    adjoint of Unfold, so we take `jax.linear_transpose(unfold2d)` — XLA
    emits the exact scatter-add, and fold/unfold can never disagree.
  * Instead of the reference's `[model(z_i) for i in range(L)]` loop, the L
    crops are folded into the **batch axis** and the network runs ONCE on a
    `[B*L, ...]` batch — large, static, MXU-friendly.

Layout is NHWC throughout (this framework's convention).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

DEFAULT_SPLIT_PARAMS: Dict[str, object] = {
    # mirrors the reference's log_images defaults (ddpm.py:1297-1306)
    "ks": (128, 128),
    "stride": (64, 64),
    "vqf": 4,
    "patch_distributed_vq": True,
    "tie_braker": False,
    "clip_max_weight": 0.5,
    "clip_min_weight": 0.01,
    "clip_max_tie_weight": 0.5,
    "clip_min_tie_weight": 0.01,
}


def grid_shape(hw: Tuple[int, int], ks: Tuple[int, int], stride: Tuple[int, int]):
    """Number of crops (Ly, Lx) for a VALID patch grid (ddpm.py:616-618)."""
    ly = (hw[0] - ks[0]) // stride[0] + 1
    lx = (hw[1] - ks[1]) // stride[1] + 1
    return ly, lx


def clamp_patch_params(hw, ks, stride):
    """Shrink kernel/stride to the input, as the reference does dynamically
    ("reducing Kernel", ddpm.py:729-735) — here statically, shapes are known."""
    ks = (min(ks[0], hw[0]), min(ks[1], hw[1]))
    stride = (min(stride[0], hw[0]), min(stride[1], hw[1]))
    return ks, stride


def delta_border(h: int, w: int) -> jnp.ndarray:
    """[h, w] normalised distance to the nearest border: 0 at the edge,
    0.5 in the centre (reference delta_border, ddpm.py:579-591)."""
    y = jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1)
    x = jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1)
    dy = jnp.minimum(y, 1.0 - y)
    dx = jnp.minimum(x, 1.0 - x)
    return jnp.minimum(dy[:, None], dx[None, :])


def compute_weighting(h: int, w: int, ly: int, lx: int, params: Dict) -> jnp.ndarray:
    """Per-crop blending weights, shape [L, h, w, 1] (reference get_weighting,
    ddpm.py:593-607). `tie_braker` additionally down-weights crops near the
    grid border so overlapping ties resolve toward interior crops."""
    wgt = jnp.clip(
        delta_border(h, w), params["clip_min_weight"], params["clip_max_weight"]
    )
    wgt = jnp.broadcast_to(wgt[None], (ly * lx, h, w))
    if params.get("tie_braker"):
        tie = jnp.clip(
            delta_border(ly, lx),
            params["clip_min_tie_weight"],
            params["clip_max_tie_weight"],
        ).reshape(-1)
        wgt = wgt * tie[:, None, None]
    return wgt[..., None]


def unfold2d(x: jnp.ndarray, ks: Tuple[int, int], stride: Tuple[int, int]) -> jnp.ndarray:
    """[B,H,W,C] -> [B, L, kh, kw, C] overlapping crops, row-major crop order
    (matches torch.nn.Unfold's L ordering). One static XLA gather."""
    b, h, w, c = x.shape
    kh, kw = ks
    ly, lx = grid_shape((h, w), ks, stride)
    ri = (jnp.arange(ly) * stride[0])[:, None] + jnp.arange(kh)[None]  # [Ly, kh]
    ci = (jnp.arange(lx) * stride[1])[:, None] + jnp.arange(kw)[None]  # [Lx, kw]
    rows = x[:, ri]  # [B, Ly, kh, W, C]
    patches = rows[:, :, :, ci]  # [B, Ly, kh, Lx, kw, C]
    patches = patches.transpose(0, 1, 3, 2, 4, 5)  # [B, Ly, Lx, kh, kw, C]
    return patches.reshape(b, ly * lx, kh, kw, c)


def fold2d(
    patches: jnp.ndarray,
    out_hw: Tuple[int, int],
    ks: Tuple[int, int],
    stride: Tuple[int, int],
) -> jnp.ndarray:
    """[B, L, kh, kw, C] -> [B, H, W, C] overlap-add stitch: the exact adjoint
    of unfold2d (== torch.nn.Fold), via jax.linear_transpose -> scatter-add."""
    b, _, kh, kw, c = patches.shape
    h, w = out_hw
    spec = jax.ShapeDtypeStruct((b, h, w, c), patches.dtype)
    transpose = jax.linear_transpose(lambda img: unfold2d(img, ks, stride), spec)
    (out,) = transpose(patches)
    return out


def patched_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    params: Dict,
    *,
    uf: int = 1,
    df: int = 1,
) -> jnp.ndarray:
    """Run `fn` ([N,h,w,C] -> [N,h*uf/df,w*uf/df,C']) over an overlapping crop
    grid of `x` and stitch the results (reference get_fold_unfold uf/df cases,
    ddpm.py:609-659). All L crops run as ONE [B*L,...] batched call."""
    assert uf == 1 or df == 1
    b, h, w, _ = x.shape
    ks, stride = clamp_patch_params((h, w), tuple(params["ks"]), tuple(params["stride"]))
    ly, lx = grid_shape((h, w), ks, stride)
    length = ly * lx
    crops = unfold2d(x, ks, stride)  # [B, L, kh, kw, C]
    out = fn(crops.reshape((b * length,) + crops.shape[2:]))
    okh, okw = ks[0] * uf // df, ks[1] * uf // df
    assert out.shape[1:3] == (okh, okw), (out.shape, (okh, okw))
    wgt = compute_weighting(okh, okw, ly, lx, params).astype(out.dtype)  # [L,okh,okw,1]
    out = out.reshape((b, length) + out.shape[1:]) * wgt[None]
    out_hw = (h * uf // df, w * uf // df)
    ostride = (stride[0] * uf // df, stride[1] * uf // df)
    folded = fold2d(out, out_hw, (okh, okw), ostride)
    norm = fold2d(
        jnp.broadcast_to(wgt[None], (1, length, okh, okw, 1)),
        out_hw,
        (okh, okw),
        ostride,
    )
    return folded / norm
