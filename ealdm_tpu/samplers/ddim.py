"""DDIM sampler as one lax.scan program.

Parity target: `/root/reference/ldm/models/diffusion/ddim.py` — timestep
subsetting, per-step x_prev = sqrt(a_prev)*pred_x0 + dir_xt + sigma*noise
(`ddim.py:164-204`), classifier-free guidance as a 2N-batched model call
(`ddim.py:170-178`), mask-based inpainting re-noising (`ddim.py:143-146`).

TPU design: the whole S-step loop is a single `jax.lax.scan` over the
per-step (timestep, alpha, alpha_prev, sigma) table — one XLA executable,
zero host round-trips. CFG is one batched call, not two.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.schedules import DDIMSchedule, DiffusionSchedule, extract

# eps_fn(x, t, context) -> predicted noise; context may be None.
EpsFn = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]


class DDIMConfig(NamedTuple):
    num_steps: int = 50
    eta: float = 0.0
    temperature: float = 1.0
    noise_dropout: float = 0.0
    unconditional_guidance_scale: float = 1.0
    parameterization: str = "eps"  # "eps" or "x0" (reference ddpm.py:431)
    clip_denoised: bool = False
    quantize_x0: bool = False
    unroll: int = 1  # lax.scan unroll factor (scheduling experiment knob)


_NO_EXTRA = object()  # sentinel: "no per-step extra tables" (None is valid)


def _guided_eps(
    eps_fn: EpsFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond,
    uncond,
    scale: float,
    extra=_NO_EXTRA,
) -> jnp.ndarray:
    """CFG: single batched forward over [uncond; cond] (reference order).

    cond/uncond may be arbitrary pytrees of batch-leading arrays (e.g. the
    hoisted per-site cross-attn K/V of inference.hoist_invariants) — leaves
    are concatenated batchwise, and XLA's loop-invariant code motion hoists
    the constant concat out of the sampling scan. `extra` (if given) is this
    step's slice of the caller's extra_tables, passed through as a fourth
    eps_fn argument."""
    args = () if extra is _NO_EXTRA else (extra,)
    if uncond is None or scale == 1.0:
        return eps_fn(x, t, cond, *args)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = jax.tree_util.tree_map(
        lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond
    )
    e_uncond, e_cond = jnp.split(eps_fn(x_in, t_in, c_in, *args), 2, axis=0)
    return e_uncond + scale * (e_cond - e_uncond)


def ddim_step(
    x, e_t, a_t, a_prev, sigma_t, noise, cfg: DDIMConfig, quantize_fn=None
):
    """One DDIM update given the model output and per-step scalars
    (reference ddim.py:166-205 p_sample_ddim)."""
    sqrt_one_minus_at = jnp.sqrt(1.0 - a_t)
    if cfg.parameterization == "x0":
        # model predicts x0 directly (reference ddpm.py:431 target switch);
        # recover eps for the direction term
        pred_x0 = e_t
        e_t = (x - jnp.sqrt(a_t) * pred_x0) / sqrt_one_minus_at
    else:
        pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    if cfg.clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    if cfg.quantize_x0 and quantize_fn is not None:
        pred_x0 = quantize_fn(pred_x0)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise * cfg.temperature
    return x_prev, pred_x0


def ddim_sample(
    eps_fn: EpsFn,
    rng: jax.Array,
    shape,
    ddim: DDIMSchedule,
    cfg: DDIMConfig = DDIMConfig(),
    cond=None,
    uncond=None,
    x_T: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    schedule: Optional[DiffusionSchedule] = None,
    quantize_fn=None,
    return_pred_x0: bool = False,
    return_intermediates: bool = False,
    score_corrector=None,
    extra_tables=None,
):
    """Run the full DDIM chain. Returns final x (and optionally last pred_x0,
    or all per-step (x_inter, pred_x0) stacks when return_intermediates).

    mask/x0: inpainting — at each step the known region is re-noised from x0
    and composited (mask==1 keeps the known region, as in the reference).
    score_corrector: optional `fn(e_t, x, t, cond) -> e_t` hook applied to
    the (guided) model score (reference ddim.py:180-182 modify_score).
    extra_tables: optional pytree of [S, ...] per-step tables in the SAME
    low->high order as ddim.timesteps (e.g. the hoisted timestep-embedding
    tables of inference.hoist_invariants); reversed alongside the alpha/sigma
    tables, sliced per step, and passed to eps_fn as a fourth argument.
    """
    b = shape[0]
    rng, init_rng = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(init_rng, shape)

    steps = ddim.num_steps
    # scan runs t = high -> low: reverse the low->high tables once.
    tables = (
        ddim.timesteps[::-1],
        ddim.alphas[::-1],
        ddim.alphas_prev[::-1],
        ddim.sigmas[::-1],
        jax.random.split(rng, steps),
    )
    extra_rev = jax.tree_util.tree_map(lambda a: a[::-1], extra_tables)

    def body(carry, xs_t):
        x, _ = carry
        per_step, extra_t = xs_t
        ts, a_t, a_prev, sigma_t, step_rng = per_step
        t_vec = jnp.full((b,), ts, jnp.int32)

        if mask is not None:
            assert x0 is not None and schedule is not None
            k_noise, step_rng = jax.random.split(step_rng)
            img_orig = (
                extract(schedule.sqrt_alphas_cumprod, t_vec, x.ndim) * x0
                + extract(schedule.sqrt_one_minus_alphas_cumprod, t_vec, x.ndim)
                * jax.random.normal(k_noise, x.shape)
            )
            x = img_orig * mask + (1.0 - mask) * x

        e_t = _guided_eps(
            eps_fn, x, t_vec, cond, uncond, cfg.unconditional_guidance_scale,
            extra=_NO_EXTRA if extra_tables is None else extra_t,
        )
        if score_corrector is not None:
            e_t = score_corrector(e_t, x, t_vec, cond)
        k_drop, step_rng = jax.random.split(step_rng)
        noise = jax.random.normal(step_rng, x.shape)
        if cfg.noise_dropout > 0.0:
            keep = jax.random.bernoulli(
                k_drop, 1.0 - cfg.noise_dropout, x.shape
            )
            noise = noise * keep / (1.0 - cfg.noise_dropout)
        x_prev, pred_x0 = ddim_step(
            x, e_t, a_t, a_prev, sigma_t, noise, cfg, quantize_fn
        )
        ys = (x_prev, pred_x0) if return_intermediates else None
        return (x_prev, pred_x0), ys

    (x, pred_x0), ys = jax.lax.scan(
        body, (x, x), (tables, extra_rev), unroll=cfg.unroll
    )
    if return_intermediates:
        return x, ys  # ([S, B, ...] x_inter, [S, B, ...] pred_x0)
    if return_pred_x0:
        return x, pred_x0
    return x


def ancestral_sample(
    eps_fn: EpsFn,
    rng: jax.Array,
    shape,
    schedule: DiffusionSchedule,
    cond=None,
    uncond=None,
    guidance_scale: float = 1.0,
    clip_denoised: bool = True,
):
    """Full-T ancestral (DDPM) sampling loop as one scan
    (reference `p_sample_loop`, ddpm.py:255-268)."""
    b = shape[0]
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape)
    T = schedule.num_timesteps

    def body(x, per_step):
        i, step_rng = per_step
        t_vec = jnp.full((b,), i, jnp.int32)
        e_t = _guided_eps(eps_fn, x, t_vec, cond, uncond, guidance_scale)
        x_recon = (
            extract(schedule.sqrt_recip_alphas_cumprod, t_vec, x.ndim) * x
            - extract(schedule.sqrt_recipm1_alphas_cumprod, t_vec, x.ndim) * e_t
        )
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (
            extract(schedule.posterior_mean_coef1, t_vec, x.ndim) * x_recon
            + extract(schedule.posterior_mean_coef2, t_vec, x.ndim) * x
        )
        log_var = extract(schedule.posterior_log_variance_clipped, t_vec, x.ndim)
        noise = jax.random.normal(step_rng, x.shape)
        nonzero = (i > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return x, None

    steps = jnp.arange(T - 1, -1, -1)
    x, _ = jax.lax.scan(body, x, (steps, jax.random.split(rng, T)))
    return x
