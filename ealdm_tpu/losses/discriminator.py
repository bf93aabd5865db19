"""PatchGAN discriminator (pix2pix NLayerDiscriminator), flax/NHWC.

Capability parity with the `taming` NLayerDiscriminator used by the VAE GAN
losses (`/root/reference/ldm/modules/losses/contperceptual.py:28`): ndf-wide
stride-2 4x4 conv pyramid with leaky-ReLU, 1-channel logit map output, and
the normal(0, 0.02) weights_init convention.

TPU-first deviation (documented): the reference defaults to BatchNorm2d,
whose running statistics need cross-replica sync under SPMD; GroupNorm is
used instead (stateless, same normalize+affine role — the modern VQGAN
ports make the same substitution).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import resolve_num_groups


def _gan_init(scale=0.02):
    return nn.initializers.normal(stddev=scale)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 1
        x = nn.Conv(
            self.ndf, (kw, kw), strides=(2, 2), padding=padw,
            kernel_init=_gan_init(), name="conv_in", dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            ch = self.ndf * nf_mult
            x = nn.Conv(
                ch, (kw, kw), strides=(2, 2), padding=padw, use_bias=False,
                kernel_init=_gan_init(), name=f"conv_{n}", dtype=self.dtype,
            )(x)
            x = nn.GroupNorm(num_groups=resolve_num_groups(ch, 32), name=f"norm_{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        nf_mult = min(2**self.n_layers, 8)
        ch = self.ndf * nf_mult
        x = nn.Conv(
            ch, (kw, kw), strides=(1, 1), padding=padw, use_bias=False,
            kernel_init=_gan_init(), name=f"conv_{self.n_layers}", dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=resolve_num_groups(ch, 32), name=f"norm_{self.n_layers}")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(
            1, (kw, kw), padding=padw, kernel_init=_gan_init(),
            name="conv_out", dtype=self.dtype,
        )(x)
