"""Vector quantizer (VQ-GAN codebook), TPU-native.

Capability parity with the external `taming` VectorQuantizer2 the reference
imports (`/root/reference/ldm/models/autoencoder.py:6`): nearest-codebook
lookup with straight-through gradients, beta-weighted commitment loss, and
perplexity stats. The distance argmin is expressed as one [N, K] matmul so it
lands on the MXU (||z||^2 terms fold into the reduction), not a gather loop.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class VectorQuantizer(nn.Module):
    """Codebook of `n_embed` x `embed_dim`; input NHWC with C == embed_dim."""

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    def setup(self):
        # matches the uniform(-1/K, 1/K) codebook init convention
        scale = 1.0 / self.n_embed
        self.embedding = self.param(
            "embedding",
            lambda rng: jax.random.uniform(
                rng, (self.n_embed, self.embed_dim), jnp.float32, -scale, scale
            ),
        )

    def __call__(self, z: jnp.ndarray):
        """Return (z_q straight-through, codebook_loss, (perplexity, None, indices))."""
        b, h, w, c = z.shape
        assert c == self.embed_dim
        flat = z.reshape(-1, c).astype(jnp.float32)
        # jnp.asarray: params may arrive as host numpy (e.g. after
        # device_get); numpy[tracer] indexing would fail below.
        codebook = jnp.asarray(self.embedding, jnp.float32)

        # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 ; the z.e term is one MXU matmul.
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        indices = jnp.argmin(dist, axis=1)
        z_q = codebook[indices].reshape(b, h, w, c).astype(z.dtype)

        loss = self.beta * jnp.mean(
            jnp.square(jax.lax.stop_gradient(z_q) - z)
        ) + jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z)))

        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)

        one_hot_mean = jnp.mean(
            jax.nn.one_hot(indices, self.n_embed, dtype=jnp.float32), axis=0
        )
        perplexity = jnp.exp(-jnp.sum(one_hot_mean * jnp.log(one_hot_mean + 1e-10)))

        return z_q, loss, (perplexity, None, indices.reshape(b, h, w))

    def embed_code(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Decode integer codes [..., ] -> embeddings [..., embed_dim]."""
        return jnp.asarray(self.embedding)[indices]
