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


def compute_top_k(logits, labels, k: int, reduction: str = "mean"):
    """Top-k accuracy (`compute_top_k`, classifier.py:150-155): fraction of
    rows whose label appears in the k highest logits."""
    top_ks = jax.lax.top_k(logits, k)[1]
    hit = jnp.sum((top_ks == labels[:, None]).astype(jnp.float32), axis=-1)
    if reduction == "mean":
        return jnp.mean(hit)
    if reduction == "none":
        return hit
    raise ValueError(f"unknown reduction {reduction!r}")


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
        # write_logs (classifier.py:162-171): acc@1 / acc@5 per step.
        k5 = min(5, self.num_classes)
        metrics = {
            "loss": loss,
            "accuracy": compute_top_k(logits, labels, 1),
            "acc@1": compute_top_k(logits, labels, 1),
            "acc@5": compute_top_k(logits, labels, k5),
        }
        return loss, metrics

    def noisy_accuracy(self, z, labels, noise, log_every_t: int = 100):
        """Per-timestep acc@1/acc@5 sweep over t = 0, log_every_t, ...
        (`reset_noise_accs` + `validation_step`, classifier.py:203-218).
        The reference loops one forward pass per grid point; here the grid is
        folded into the batch axis so the whole sweep is a single large
        MXU-friendly forward."""
        b = z.shape[0]
        ts = jnp.arange(0, self.diffusion_timesteps, log_every_t)
        n_t = ts.shape[0]
        t_rep = jnp.repeat(ts, b)  # [n_t*b]
        z_rep = jnp.tile(z, (n_t,) + (1,) * (z.ndim - 1))
        noise_rep = jnp.tile(noise, (n_t,) + (1,) * (noise.ndim - 1))
        logits = self.logits(self.q_sample(z_rep, t_rep, noise_rep), t_rep)
        labels_rep = jnp.tile(labels, (n_t,))
        k5 = min(5, self.num_classes)
        acc1 = compute_top_k(logits, labels_rep, 1, "none").reshape(n_t, b)
        acc5 = compute_top_k(logits, labels_rep, k5, "none").reshape(n_t, b)
        return {"t": ts, "acc@1": acc1.mean(axis=1), "acc@5": acc5.mean(axis=1)}

    def classifier_gradient(self, params, z_noisy, t, target_class):
        """d log p(y|z_t) / d z_t for classifier guidance."""

        def logp(z):
            logits = self.apply({"params": params}, z, t, method=self.logits)
            return jnp.sum(
                jax.nn.log_softmax(logits)[jnp.arange(z.shape[0]), target_class]
            )

        return jax.grad(logp)(z_noisy)
