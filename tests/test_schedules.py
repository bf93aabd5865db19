"""Schedule math golden tests: fp64 closed-form oracles + torch cross-check."""
import numpy as np
import pytest

from ealdm_tpu.ops import schedules as S


def test_linear_beta_schedule_endpoints():
    betas = S.make_beta_schedule("linear", 1000, 0.0015, 0.0195)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(0.0015)
    assert betas[-1] == pytest.approx(0.0195)
    # linear in sqrt space: sqrt(betas) is affine
    d = np.diff(np.sqrt(betas))
    assert np.allclose(d, d[0])


def test_cosine_schedule_monotone_clip():
    betas = S.make_beta_schedule("cosine", 1000)
    assert betas.max() <= 0.999 and betas.min() >= 0
    assert np.all(np.diff(betas[:-1]) >= -1e-12)


def test_sqrt_variants():
    b1 = S.make_beta_schedule("sqrt_linear", 10, 1e-4, 2e-2)
    assert np.allclose(b1, np.linspace(1e-4, 2e-2, 10))
    b2 = S.make_beta_schedule("sqrt", 10, 1e-4, 2e-2)
    assert np.allclose(b2, np.linspace(1e-4, 2e-2, 10) ** 0.5)


def test_ddpm_tables_identities():
    sched = S.DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.0015, linear_end=0.0195
    )
    betas = np.asarray(sched.betas, dtype=np.float64)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    assert np.allclose(np.asarray(sched.sqrt_alphas_cumprod) ** 2, ac, atol=1e-6)
    assert np.allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, atol=1e-6
    )
    # posterior mean coefs sum to <= 1-ish sanity and match closed form
    acp = np.append(1.0, ac[:-1])
    c1 = betas * np.sqrt(acp) / (1 - ac)
    assert np.allclose(np.asarray(sched.posterior_mean_coef1), c1, rtol=1e-5)
    # lvlb first entry duplicated
    lv = np.asarray(sched.lvlb_weights)
    assert lv[0] == lv[1]
    assert np.isfinite(lv).all()


def test_ddim_timesteps_uniform():
    ts = S.make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[1] == 21 and ts[-1] == 981


def test_ddim_sampling_parameters_eta():
    sched = S.DiffusionSchedule.create(timesteps=1000)
    ddim = S.DDIMSchedule.create(sched, 50, eta=0.0)
    assert np.allclose(np.asarray(ddim.sigmas), 0.0)
    ddim1 = S.DDIMSchedule.create(sched, 50, eta=1.0)
    a = np.asarray(ddim1.alphas, dtype=np.float64)
    ap = np.asarray(ddim1.alphas_prev, dtype=np.float64)
    sig = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    assert np.allclose(np.asarray(ddim1.sigmas), sig, rtol=1e-5)
    # alphas_prev[0] is alphacums[0]
    assert ap[0] == pytest.approx(float(np.asarray(sched.alphas_cumprod)[0]))


def test_extract_shapes():
    import jax.numpy as jnp

    table = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = S.extract(table, t, ndim=4)
    assert out.shape == (3, 1, 1, 1)
    assert float(out[1, 0, 0, 0]) == 3.0
