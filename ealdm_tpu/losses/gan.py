"""GAN loss primitives shared by the VAE losses.

Parity targets: taming's hinge_d_loss / vanilla_d_loss / adopt_weight as
used by `/root/reference/ldm/modules/losses/{contperceptual,vqperceptual}.py`.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(nn_relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn_relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """Zero the weight until global_step reaches threshold (disc warm-up).

    jit-safe: global_step may be a traced scalar.
    """
    return jnp.where(jnp.asarray(global_step) < threshold, value, weight)


def measure_perplexity(indices, n_classes):
    one_hot = jax.nn.one_hot(indices.reshape(-1), n_classes, dtype=jnp.float32)
    probs = jnp.mean(one_hot, axis=0)
    perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
    cluster_usage = jnp.sum(probs > 0)
    return perplexity, cluster_usage


def hinge_d_loss_with_exemplar_weights(logits_real, logits_fake, weights):
    """Per-exemplar-weighted hinge discriminator loss (reference
    `vqperceptual.py:11-18`): per-sample spatial means, weighted-averaged by
    `weights` over the batch."""
    assert weights.shape[0] == logits_real.shape[0] == logits_fake.shape[0]
    axes = tuple(range(1, logits_real.ndim))
    loss_real = jnp.mean(nn_relu(1.0 - logits_real), axis=axes)
    loss_fake = jnp.mean(nn_relu(1.0 + logits_fake), axis=axes)
    wsum = jnp.sum(weights)
    return 0.5 * (
        jnp.sum(weights * loss_real) / wsum + jnp.sum(weights * loss_fake) / wsum
    )
