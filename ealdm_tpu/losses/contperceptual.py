"""KL-VAE loss: L1 + LPIPS + learnable-logvar NLL + KL + adaptive GAN.

Parity target: `LPIPSWithDiscriminator`
(`/root/reference/ldm/modules/losses/contperceptual.py:7-110`): generator
branch = weighted NLL + kl_weight*KL + d_weight*disc_factor*g_loss with the
adaptive d_weight = ||grad(nll)|| / (||grad(g)|| + 1e-4) clamp [0, 1e4]
(`:32-43`); discriminator branch = hinge/vanilla on real/fake logits with
disc-start warm-up.

JAX formulation: the module exposes the loss pieces as pure functions; the
adaptive-weight gradients are taken w.r.t. the RECONSTRUCTION tensor (the
shared final-conv Jacobian factor appears in both norms and cancels to first
order) — the standard functional substitution for torch's
autograd.grad(..., last_layer) used by the JAX VQGAN ports. Both updates run
in one fused jitted step (see training/vae_trainer.py).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.distributions import DiagonalGaussian
from .discriminator import NLayerDiscriminator
from .gan import adopt_weight, hinge_d_loss, vanilla_d_loss
from .lpips import LPIPS


class LPIPSWithDiscriminator(nn.Module):
    disc_start: int
    logvar_init: float = 0.0
    kl_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_conditional: bool = False
    disc_loss: str = "hinge"
    dtype: Any = jnp.float32

    def setup(self):
        assert self.disc_loss in ("hinge", "vanilla")
        self.logvar = self.param(
            "logvar", lambda rng: jnp.asarray(self.logvar_init, jnp.float32)
        )
        self.perceptual = LPIPS(name="perceptual", dtype=self.dtype)
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels,
            n_layers=self.disc_num_layers,
            name="discriminator",
            dtype=self.dtype,
        )
        self._d_loss = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss

    # ---- pieces -----------------------------------------------------------
    def nll_loss(self, inputs, reconstructions, weights=None):
        rec = jnp.abs(inputs - reconstructions) * self.pixelloss_weight
        if self.perceptual_weight > 0:
            p = self.perceptual(inputs, reconstructions)
            rec = rec + self.perceptual_weight * p[:, None, None, None]
        nll = rec / jnp.exp(self.logvar) + self.logvar
        weighted = nll if weights is None else weights * nll
        b = nll.shape[0]
        return jnp.sum(weighted) / b, jnp.sum(nll) / b, jnp.mean(rec)

    def g_loss(self, reconstructions, cond=None):
        if cond is None:
            assert not self.disc_conditional
            logits = self.discriminator(reconstructions)
        else:
            assert self.disc_conditional
            logits = self.discriminator(jnp.concatenate([reconstructions, cond], -1))
        return -jnp.mean(logits)

    def generator_loss(
        self,
        inputs,
        reconstructions,
        posterior: DiagonalGaussian,
        global_step,
        d_weight,
        cond=None,
        weights=None,
        split: str = "train",
    ):
        weighted_nll, nll, rec_mean = self.nll_loss(inputs, reconstructions, weights)
        kl = jnp.sum(posterior.kl()) / posterior.mean.shape[0]
        g = self.g_loss(reconstructions, cond)
        disc_factor = adopt_weight(
            self.disc_factor, global_step, self.discriminator_iter_start
        )
        loss = weighted_nll + self.kl_weight * kl + d_weight * disc_factor * g
        log = {
            f"{split}/total_loss": loss,
            f"{split}/logvar": self.logvar,
            f"{split}/kl_loss": kl,
            f"{split}/nll_loss": nll,
            f"{split}/rec_loss": rec_mean,
            f"{split}/d_weight": d_weight,
            f"{split}/disc_factor": disc_factor,
            f"{split}/g_loss": g,
        }
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
        disc_factor = adopt_weight(
            self.disc_factor, global_step, self.discriminator_iter_start
        )
        d_loss = disc_factor * self._d_loss(logits_real, logits_fake)
        log = {
            f"{split}/disc_loss": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake": jnp.mean(logits_fake),
        }
        return d_loss, log

    @property
    def discriminator_iter_start(self):
        return self.disc_start

    def __call__(self, inputs, reconstructions, posterior, global_step, d_weight=1.0):
        """Init-path entry touching every submodule."""
        gl, _ = self.generator_loss(
            inputs, reconstructions, posterior, global_step, d_weight
        )
        dl, _ = self.discriminator_loss(inputs, reconstructions, global_step)
        return gl + dl


def adaptive_d_weight(nll_grad_rec, g_grad_rec, disc_weight: float):
    """d_weight from gradient norms w.r.t. the reconstruction (see module
    docstring), clamped to [0, 1e4] and scaled by disc_weight."""
    num = jnp.linalg.norm(nll_grad_rec)
    den = jnp.linalg.norm(g_grad_rec) + 1e-4
    return jnp.clip(num / den, 0.0, 1e4) * disc_weight
