"""PLMS (pseudo linear multistep) sampler as one lax.scan program.

Parity target: `/root/reference/ldm/models/diffusion/plms.py` — Adams-
Bashforth orders 1-4 over the eps history (`plms.py:218-232`), with the
first step using a pseudo improved-Euler (second model call at t_next).
eta must be 0 (reference asserts this, `plms.py:30`).

TPU design: the 4-deep eps history rides in the scan carry as a fixed
[4, ...] buffer with a step counter selecting the multistep order via
`lax.switch` — fully static shapes, one XLA executable.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.schedules import DDIMSchedule, DiffusionSchedule, extract
from .ddim import DDIMConfig, EpsFn, _guided_eps, ddim_step


def plms_sample(
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
    score_corrector=None,
):
    """mask/x0: inpainting — at each step the known region is re-noised from
    x0 via q_sample and composited before the model call (mask==1 keeps the
    known region), exactly as the DDIM mask path; parity target
    `/root/reference/ldm/models/diffusion/plms.py:147-150`. Requires
    ``schedule`` (the full-T DiffusionSchedule) when mask is given."""
    assert cfg.eta == 0.0, "PLMS requires eta == 0"
    b = shape[0]
    rng, init_rng = jax.random.split(rng)
    x = x_T if x_T is not None else jax.random.normal(init_rng, shape)

    steps = ddim.num_steps
    ts_rev = ddim.timesteps[::-1]
    # t_next for step i is the following (lower) timestep; last repeats itself.
    ts_next = jnp.concatenate([ts_rev[1:], ts_rev[-1:]])
    tables = (
        ts_rev,
        ts_next,
        ddim.alphas[::-1],
        ddim.alphas_prev[::-1],
        ddim.sigmas[::-1],
        jnp.arange(steps),
        jax.random.split(rng, steps),
    )

    scale = cfg.unconditional_guidance_scale

    def model_eps(x, t_vec):
        e_t = _guided_eps(eps_fn, x, t_vec, cond, uncond, scale)
        if score_corrector is not None:
            e_t = score_corrector(e_t, x, t_vec, cond)
        return e_t

    def body(carry, per_step):
        x, old_eps = carry  # old_eps: [4, ...] ring buffer, newest at index 3
        ts, ts_nxt, a_t, a_prev, sigma_t, i, step_rng = per_step
        t_vec = jnp.full((b,), ts, jnp.int32)
        tn_vec = jnp.full((b,), ts_nxt, jnp.int32)
        zeros = jnp.zeros_like(x)

        if mask is not None:
            assert x0 is not None and schedule is not None
            img_orig = (
                extract(schedule.sqrt_alphas_cumprod, t_vec, x.ndim) * x0
                + extract(schedule.sqrt_one_minus_alphas_cumprod, t_vec, x.ndim)
                * jax.random.normal(step_rng, x.shape)
            )
            x = img_orig * mask + (1.0 - mask) * x

        e_t = model_eps(x, t_vec)

        def order1(_):
            # pseudo improved Euler: second eval at (x_prev, t_next)
            x_prev, _ = ddim_step(x, e_t, a_t, a_prev, sigma_t, zeros, cfg)
            e_next = model_eps(x_prev, tn_vec)
            return (e_t + e_next) / 2

        def order2(_):
            return (3 * e_t - old_eps[3]) / 2

        def order3(_):
            return (23 * e_t - 16 * old_eps[3] + 5 * old_eps[2]) / 12

        def order4(_):
            return (
                55 * e_t - 59 * old_eps[3] + 37 * old_eps[2] - 9 * old_eps[1]
            ) / 24

        order = jnp.minimum(i, 3)
        e_prime = jax.lax.switch(order, [order1, order2, order3, order4], None)

        x_prev, _ = ddim_step(x, e_prime, a_t, a_prev, sigma_t, zeros, cfg)
        old_eps = jnp.concatenate([old_eps[1:], e_t[None]], axis=0)
        return (x_prev, old_eps), None

    old_eps0 = jnp.zeros((4,) + tuple(shape), x.dtype)
    (x, _), _ = jax.lax.scan(body, (x, old_eps0), tables)
    return x
