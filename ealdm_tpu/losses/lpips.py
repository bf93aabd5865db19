"""LPIPS perceptual loss (VGG16 features + learned linear heads), flax/NHWC.

Capability parity with the `taming` LPIPS the reference imports
(`/root/reference/ldm/modules/losses/contperceptual.py:4`): scaling layer ->
VGG16 relu1_2/2_2/3_3/4_3/5_3 features -> unit-normalize -> 1x1 "lin" heads
-> spatial mean -> sum over layers.

This environment has no network access, so pretrained VGG/lin weights cannot
be downloaded; `load_torch_lpips_weights` maps a locally provided torch
checkpoint into the param tree for strict parity runs. With random init the
loss is still a valid multi-scale feature-matching objective (and tests use
it as such) — parity of VALUES requires the pretrained weights.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# ImageNet channel statistics used by the reference ScalingLayer.
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_VGG16_CFG = (
    (64, 64),            # -> relu1_2
    (128, 128),          # -> relu2_2
    (256, 256, 256),     # -> relu3_3
    (512, 512, 512),     # -> relu4_3
    (512, 512, 512),     # -> relu5_3
)


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the five LPIPS tap activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        for b, widths in enumerate(_VGG16_CFG):
            for i, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=1, name=f"conv{b}_{i}", dtype=self.dtype)(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_VGG16_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance d(x, y) per batch element, inputs in [-1, 1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        vgg = VGG16Features(name="vgg", dtype=self.dtype)
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = jnp.square(_normalize_tensor(a) - _normalize_tensor(b))
            # 1x1 no-bias "lin" head, non-negative weights convention
            lin = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}", dtype=self.dtype,
                kernel_init=nn.initializers.constant(1.0 / diff.shape[-1]),
            )
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total  # [B]


def load_torch_lpips_weights(params: Any, state_dict: dict) -> Any:
    """Map a torch LPIPS state_dict into the flax param tree.

    Accepts BOTH layouts that occur in the wild:
      * taming `vgg_lpips` checkpoints (`taming/modules/losses/lpips.py`,
        the layout the reference loads via contperceptual.py:4): the vgg16
        wrapper keeps torchvision `features` indices inside per-tap slices,
        so conv keys are `net.slice{1..5}.{orig_idx}.weight`, and the heads
        are `lin{i}.model.1.weight` (model.0 is the dropout).
      * a raw torchvision VGG16 state_dict: `features.{idx}.weight`.

    Conv kernels transpose OIHW -> HWIO. Returns an updated copy.
    """
    import numpy as np

    from ..utils.torch_import import to_numpy as to_np

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    # torchvision VGG16 'features' conv indices, and the taming slice each
    # index lives in (slice boundaries: 4, 9, 16, 23, 30).
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    slice_of = lambda i: 1 + sum(i >= b for b in (4, 9, 16, 23))
    names = [
        f"conv{b}_{i}" for b, ws in enumerate(_VGG16_CFG) for i in range(len(ws))
    ]
    for idx, name in zip(conv_idx, names):
        for fmt in (f"net.slice{slice_of(idx)}.{idx}", f"features.{idx}"):
            w = state_dict.get(f"{fmt}.weight")
            b = state_dict.get(f"{fmt}.bias")
            if w is not None:
                params["vgg"][name]["kernel"] = jnp.asarray(
                    np.transpose(to_np(w), (2, 3, 1, 0))
                )
            if b is not None:
                params["vgg"][name]["bias"] = jnp.asarray(to_np(b))
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            w = state_dict.get(key)
            if w is not None:
                params[f"lin{i}"]["kernel"] = jnp.asarray(
                    np.transpose(to_np(w), (2, 3, 1, 0))
                )
    return params


import jax  # noqa: E402  (used by load_torch_lpips_weights)
