"""Diffusion noise schedules and DDIM/PLMS sampling parameter math.

Pure functions, computed in float64 NumPy for accuracy and then frozen into
jnp.float32 tables that live on device for the whole run (they are scanned
constants of the sampler programs).

Capability parity with the reference schedule math
(`/root/reference/ldm/modules/diffusionmodules/util.py:21-99` and
`/root/reference/ldm/models/diffusion/ddpm.py:119-171`): linear / cosine /
sqrt_linear / sqrt beta schedules, the full set of derived alpha/posterior
tables, lvlb weights, and the DDIM timestep-subset + sigma tables
(`/root/reference/ldm/models/diffusion/ddim.py:24-53`).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "DiffusionSchedule",
    "DDIMSchedule",
    "extract",
]


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return betas (float64, shape [n_timestep]) for the named schedule."""
    if schedule == "linear":
        # linear in sqrt-beta space
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        angles = steps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(angles) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """Select the subset of DDPM timesteps used by a DDIM run (int64 array).

    Mirrors the reference's convention of adding one to the selected indices
    so the final alpha lines up with the data distribution.
    """
    if ddim_discr_method == "uniform":
        # clamp: more DDIM steps than DDPM steps degrades to the full chain
        # (tiny-timestep smoke configs; reference would ZeroDivisionError)
        c = max(1, num_ddpm_timesteps // num_ddim_timesteps)
        ddim_timesteps = np.arange(0, num_ddpm_timesteps, c)
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(f"unknown ddim discretization: {ddim_discr_method}")
    # the +1 index shift can reach num_ddpm_timesteps when c == 1; clamp
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-step (sigma, alpha, alpha_prev) tables (eq. 16, arXiv 2010.02502)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([[alphacums[0]], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


def _to_f32(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, dtype=np.float32))


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All derived DDPM tables, each shape [T], as frozen f32 device arrays.

    Parity: the buffer set registered by the reference DDPM
    (`/root/reference/ldm/models/diffusion/ddpm.py:119-171`).
    """

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
    ) -> "DiffusionSchedule":
        betas = (
            np.asarray(given_betas, dtype=np.float64)
            if given_betas is not None
            else make_beta_schedule(
                beta_schedule, timesteps, linear_start, linear_end, cosine_s
            )
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        (t,) = betas.shape

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas

        if parameterization == "eps":
            # posterior_variance[0] == 0 -> inf at index 0; overwritten below
            # (the reference copies index 1 over index 0 the same way).
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif parameterization == "x0":
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        else:
            raise NotImplementedError(f"parameterization {parameterization}")
        lvlb_weights = np.asarray(lvlb_weights)
        lvlb_weights[0] = lvlb_weights[1]
        assert not np.isnan(lvlb_weights).any()

        return cls(
            num_timesteps=int(t),
            betas=_to_f32(betas),
            alphas_cumprod=_to_f32(alphas_cumprod),
            alphas_cumprod_prev=_to_f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=_to_f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=_to_f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=_to_f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=_to_f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=_to_f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=_to_f32(posterior_variance),
            posterior_log_variance_clipped=_to_f32(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=_to_f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=_to_f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            lvlb_weights=_to_f32(lvlb_weights),
        )


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Per-step DDIM tables, ordered t=low..high (index 0 = final denoise step).

    The sampler scans these reversed; all arrays have shape [S].
    """

    timesteps: jnp.ndarray  # int32 [S] — DDPM timestep fed to the model
    alphas: jnp.ndarray
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        method: str = "uniform",
    ) -> "DDIMSchedule":
        ddim_ts = make_ddim_timesteps(method, num_steps, schedule.num_timesteps)
        alphacums = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            alphacums, ddim_ts, eta
        )
        return cls(
            timesteps=jnp.asarray(ddim_ts, dtype=jnp.int32),
            alphas=_to_f32(alphas),
            alphas_prev=_to_f32(alphas_prev),
            sqrt_one_minus_alphas=_to_f32(np.sqrt(1.0 - alphas)),
            sigmas=_to_f32(sigmas),
        )

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch entries of a [T] table and reshape to [B, 1, ..., 1].

    TPU-native equivalent of the reference's `extract_into_tensor`
    (`diffusionmodules/util.py:96`): a gather that XLA fuses into the
    consuming elementwise op.
    """
    out = jnp.take(table, t, axis=-1)
    return out.reshape(out.shape + (1,) * (ndim - 1))


def betas_for_alpha_bar(num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas (reference
    `diffusionmodules/util.py:77-93`): beta_i = 1 - abar((i+1)/T)/abar(i/T),
    clipped at max_beta."""
    t = np.arange(num_diffusion_timesteps, dtype=np.float64)
    a1 = np.asarray([alpha_bar(x) for x in t / num_diffusion_timesteps])
    a2 = np.asarray([alpha_bar(x) for x in (t + 1) / num_diffusion_timesteps])
    return np.minimum(1.0 - a2 / a1, max_beta)
