"""Latent distributions for the KL autoencoder.

Parity target: `DiagonalGaussianDistribution` / `normal_kl`
(`/root/reference/ldm/modules/distributions/distributions.py:24-92`), with
channel-last moment layout (NHWC: mean/logvar stacked on the last axis).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    """Factored Gaussian parameterised by [..., 2C] moments (mean || logvar)."""

    mean: jnp.ndarray
    logvar: jnp.ndarray
    deterministic: bool = False

    @classmethod
    def from_moments(cls, parameters: jnp.ndarray, deterministic: bool = False):
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar, deterministic=deterministic)

    @property
    def std(self):
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        """KL to standard normal (or to `other`), summed over non-batch dims."""
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray, axes=None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        if axes is None:
            axes = tuple(range(1, self.mean.ndim))
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Elementwise KL between two diagonal Gaussians (broadcasting)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


class AbstractDistribution:
    """Distribution interface (`distributions.py:1-10`)."""

    def sample(self):
        raise NotImplementedError()

    def mode(self):
        raise NotImplementedError()


class DiracDistribution(AbstractDistribution):
    """Point mass (`distributions.py:13-21`): sample == mode == value."""

    def __init__(self, value):
        self.value = value

    def sample(self):
        return self.value

    def mode(self):
        return self.value
