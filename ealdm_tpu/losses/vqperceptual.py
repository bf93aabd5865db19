"""VQ-GAN loss: pixel + LPIPS + codebook + adaptive GAN (+ perplexity).

Parity target: `VQLPIPSWithDiscriminator`
(`/root/reference/ldm/modules/losses/vqperceptual.py:43-167`): generator
branch = mean NLL + d_weight*disc_factor*g_loss + codebook_weight*codebook
loss with optional perplexity logging; discriminator branch identical in
shape to the KL variant.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .discriminator import NLayerDiscriminator
from .gan import adopt_weight, hinge_d_loss, measure_perplexity, vanilla_d_loss
from .lpips import LPIPS


class VQLPIPSWithDiscriminator(nn.Module):
    disc_start: int
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_conditional: bool = False
    disc_ndf: int = 64
    disc_loss: str = "hinge"
    n_classes: Optional[int] = None
    pixel_loss: str = "l1"
    dtype: Any = jnp.float32

    def setup(self):
        assert self.disc_loss in ("hinge", "vanilla")
        assert self.pixel_loss in ("l1", "l2")
        self.perceptual = LPIPS(name="perceptual", dtype=self.dtype)
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels,
            n_layers=self.disc_num_layers,
            ndf=self.disc_ndf,
            name="discriminator",
            dtype=self.dtype,
        )
        self._d_loss = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss

    def _pixel(self, a, b):
        return jnp.abs(a - b) if self.pixel_loss == "l1" else jnp.square(a - b)

    def nll_loss(self, inputs, reconstructions):
        rec = self._pixel(inputs, reconstructions) * self.pixelloss_weight
        if self.perceptual_weight > 0:
            p = self.perceptual(inputs, reconstructions)
            rec = rec + self.perceptual_weight * p[:, None, None, None]
        return jnp.mean(rec), jnp.mean(rec)

    def g_loss(self, reconstructions, cond=None):
        if cond is None:
            logits = self.discriminator(reconstructions)
        else:
            logits = self.discriminator(jnp.concatenate([reconstructions, cond], -1))
        return -jnp.mean(logits)

    def generator_loss(
        self,
        codebook_loss,
        inputs,
        reconstructions,
        global_step,
        d_weight,
        cond=None,
        predicted_indices=None,
        split: str = "train",
    ):
        nll, rec_mean = self.nll_loss(inputs, reconstructions)
        g = self.g_loss(reconstructions, cond)
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss = nll + d_weight * disc_factor * g + self.codebook_weight * jnp.mean(
            codebook_loss
        )
        log = {
            f"{split}/total_loss": loss,
            f"{split}/quant_loss": jnp.mean(codebook_loss),
            f"{split}/nll_loss": nll,
            f"{split}/rec_loss": rec_mean,
            f"{split}/d_weight": d_weight,
            f"{split}/disc_factor": disc_factor,
            f"{split}/g_loss": g,
        }
        if predicted_indices is not None and self.n_classes is not None:
            perplexity, usage = measure_perplexity(predicted_indices, self.n_classes)
            log[f"{split}/perplexity"] = perplexity
            log[f"{split}/cluster_usage"] = usage
        return loss, log

    def discriminator_loss(
        self, inputs, reconstructions, global_step, cond=None, split: str = "train"
    ):
        inputs = jax.lax.stop_gradient(inputs)
        reconstructions = jax.lax.stop_gradient(reconstructions)
        if cond is None:
            logits_real = self.discriminator(inputs)
            logits_fake = self.discriminator(reconstructions)
        else:
            logits_real = self.discriminator(jnp.concatenate([inputs, cond], -1))
            logits_fake = self.discriminator(jnp.concatenate([reconstructions, cond], -1))
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        d_loss = disc_factor * self._d_loss(logits_real, logits_fake)
        log = {
            f"{split}/disc_loss": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake": jnp.mean(logits_fake),
        }
        return d_loss, log

    def __call__(self, codebook_loss, inputs, reconstructions, global_step, d_weight=1.0):
        gl, _ = self.generator_loss(
            codebook_loss, inputs, reconstructions, global_step, d_weight
        )
        dl, _ = self.discriminator_loss(inputs, reconstructions, global_step)
        return gl + dl
