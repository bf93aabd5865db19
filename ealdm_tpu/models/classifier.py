"""Noisy-latent classifier (guided-diffusion style).

Parity target: `NoisyLatentImageClassifier`
(`/root/reference/ldm/models/diffusion/classifier.py:28-267`): an
EncoderUNetModel trained to classify q_sample-noised latents of a frozen
LatentDiffusion at random timesteps, usable for classifier guidance.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.schedules import DiffusionSchedule
from .unet import EncoderUNetModel


class NoisyLatentImageClassifier(nn.Module):
    """EncoderUNet over noised latents; loss = xent vs labels at random t."""

    classifier_config: Dict[str, Any]
    num_classes: int
    diffusion_timesteps: int = 1000
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    label_key: str = "class_label"
    dtype: Any = jnp.float32

    def setup(self):
        cfg = dict(self.classifier_config)
        cfg.setdefault("out_channels", self.num_classes)
        self.classifier = EncoderUNetModel(**cfg, dtype=self.dtype)
        self.schedule = DiffusionSchedule.create(
            timesteps=self.diffusion_timesteps,
            linear_start=self.linear_start,
            linear_end=self.linear_end,
        )

    def q_sample(self, z, t, noise):
        from ..ops.schedules import extract

        s = self.schedule
        return (
            extract(s.sqrt_alphas_cumprod, t, z.ndim) * z
            + extract(s.sqrt_one_minus_alphas_cumprod, t, z.ndim) * noise
        )

    def logits(self, z_noisy, t, *, deterministic=True):
        return self.classifier(z_noisy, t, deterministic=deterministic)

    def __call__(self, z, labels, rng, *, train: bool = False):
        """Latent z [B,h,w,c] + int labels [B] -> (loss, metrics)."""
        r_t, r_n = jax.random.split(rng)
        t = jax.random.randint(r_t, (z.shape[0],), 0, self.diffusion_timesteps)
        noise = jax.random.normal(r_n, z.shape, z.dtype)
        z_noisy = self.q_sample(z, t, noise)
        logits = self.logits(z_noisy, t, deterministic=not train)
        onehot = jax.nn.one_hot(labels, self.num_classes)
        loss = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc}

    def classifier_gradient(self, params, z_noisy, t, target_class):
        """d log p(y|z_t) / d z_t for classifier guidance."""

        def logp(z):
            logits = self.apply({"params": params}, z, t, method=self.logits)
            return jnp.sum(
                jax.nn.log_softmax(logits)[jnp.arange(z.shape[0]), target_class]
            )

        return jax.grad(logp)(z_noisy)
