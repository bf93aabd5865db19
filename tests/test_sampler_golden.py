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


def test_score_corrector_hook_applies():
    """score_corrector fn(e_t, x, t, cond) replaces the model score
    (reference ddim.py:180-182 modify_score)."""
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample
    from ealdm_tpu.ops.schedules import DDIMSchedule

    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5, eta=0.0)
    cfg = DDIMConfig(num_steps=5, eta=0.0)
    rng = jax.random.PRNGKey(0)
    base = ddim_sample(
        lambda x, t, c: 0.1 * x, rng, (1, 4, 4, 1), ddim, cfg
    )
    # corrector that zeroes the score ==> pure x0 = x/sqrt(a) telescoping
    corrected = ddim_sample(
        lambda x, t, c: 0.1 * x, rng, (1, 4, 4, 1), ddim, cfg,
        score_corrector=lambda e, x, t, c: jnp.zeros_like(e),
    )
    zero_eps = ddim_sample(
        lambda x, t, c: jnp.zeros_like(x), rng, (1, 4, 4, 1), ddim, cfg
    )
    assert not np.allclose(np.asarray(base), np.asarray(corrected))
    np.testing.assert_allclose(
        np.asarray(corrected), np.asarray(zero_eps), rtol=1e-5, atol=1e-6
    )


def test_x0_parameterization_matches_eps():
    """A model predicting x0 must produce the same chain as the equivalent
    eps model under parameterization='x0' (reference ddpm.py:431)."""
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample
    from ealdm_tpu.ops.schedules import DDIMSchedule

    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5, eta=0.0)
    rng = jax.random.PRNGKey(3)

    # ground-truth latent the model "knows"
    x0_true = jnp.full((1, 4, 4, 1), 0.37)
    steps_rev = np.asarray(ddim.timesteps[::-1])
    a_by_t = {int(t): float(a) for t, a in
              zip(steps_rev, np.asarray(ddim.alphas[::-1]))}

    def eps_model(x, t, c):
        a_t = jnp.asarray([a_by_t[int(np.asarray(t)[0])]], jnp.float32)
        a_t = a_t.reshape((1, 1, 1, 1))
        return (x - jnp.sqrt(a_t) * x0_true) / jnp.sqrt(1.0 - a_t)

    def x0_model(x, t, c):
        return jnp.broadcast_to(x0_true, x.shape)

    with jax.disable_jit():
        out_eps = ddim_sample(
            eps_model, rng, (1, 4, 4, 1), ddim,
            DDIMConfig(num_steps=5, eta=0.0),
        )
        out_x0 = ddim_sample(
            x0_model, rng, (1, 4, 4, 1), ddim,
            DDIMConfig(num_steps=5, eta=0.0, parameterization="x0"),
        )
    np.testing.assert_allclose(
        np.asarray(out_eps), np.asarray(out_x0), rtol=1e-4, atol=1e-5
    )


def test_noise_dropout_zero_keeps_mask_free_path():
    """noise_dropout=0 must not alter results beyond rng bookkeeping, and
    dropout>0 changes eta>0 chains (reference ddim.py:201-202)."""
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample
    from ealdm_tpu.ops.schedules import DDIMSchedule

    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5, eta=1.0)
    rng = jax.random.PRNGKey(1)
    f = lambda x, t, c: 0.05 * x
    a = ddim_sample(f, rng, (1, 4, 4, 1), ddim, DDIMConfig(num_steps=5, eta=1.0))
    b = ddim_sample(f, rng, (1, 4, 4, 1), ddim,
                    DDIMConfig(num_steps=5, eta=1.0, noise_dropout=0.5))
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))
