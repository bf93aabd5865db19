"""Sinusoidal embeddings (timestep + DDPM-VAE style).

Parity targets: `timestep_embedding`
(`/root/reference/ldm/modules/diffusionmodules/util.py:151-171`, cos-then-sin
ordering) and `get_timestep_embedding`
(`/root/reference/ldm/modules/diffusionmodules/model.py:12-30`, sin-then-cos
fairseq ordering with a (half_dim-1) denominator) — the two conventions differ
and both are preserved exactly.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["timestep_embedding", "fairseq_timestep_embedding"]


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    repeat_only: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """UNet timestep embedding: [N] -> [N, dim], cos||sin ordering."""
    if repeat_only:
        return jnp.broadcast_to(
            timesteps.astype(dtype)[:, None], (timesteps.shape[0], dim)
        )
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


def fairseq_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """DDPM-VAE timestep embedding: [N] -> [N, dim], sin||cos ordering."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)
