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


def test_schedule_tables_parity_vs_reference():
    """Beta schedules (all four types), DDIM timestep selection (uniform +
    quad), and the DDIM sigma/alpha tables match the reference
    (`ldm/modules/diffusionmodules/util.py:21-74`) exactly."""
    import sys
    import types

    import pytest
    torch = pytest.importorskip("torch")
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        om.ListConfig = ListConfig
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ldm.modules.diffusionmodules import util as ref_util

    from ealdm_tpu.ops.schedules import (
        make_beta_schedule,
        make_ddim_sampling_parameters,
        make_ddim_timesteps,
    )

    for sched in ("linear", "cosine", "sqrt_linear", "sqrt"):
        ref = ref_util.make_beta_schedule(sched, 100, 0.0015, 0.0195)
        ours = make_beta_schedule(sched, 100, 0.0015, 0.0195)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-12, atol=1e-12)

    for method in ("uniform", "quad"):
        ref_ts = ref_util.make_ddim_timesteps(method, 50, 1000, verbose=False)
        ours_ts = make_ddim_timesteps(method, 50, 1000)
        np.testing.assert_array_equal(ours_ts, ref_ts)

    acp = np.cumprod(1.0 - ref_util.make_beta_schedule("linear", 1000))
    ref_sig, ref_a, ref_ap = ref_util.make_ddim_sampling_parameters(
        acp, ref_ts, eta=1.0, verbose=False
    )
    sig, a, ap = make_ddim_sampling_parameters(acp, ours_ts, eta=1.0)
    np.testing.assert_allclose(sig, ref_sig, rtol=1e-12)
    np.testing.assert_allclose(a, ref_a, rtol=1e-12)
    np.testing.assert_allclose(ap, ref_ap, rtol=1e-12)


def test_diagonal_gaussian_parity_vs_reference():
    """DiagonalGaussian kl/nll/mode match the reference
    DiagonalGaussianDistribution (`ldm/modules/distributions/
    distributions.py:24-61`) on the same moments."""
    import sys

    import pytest
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    import jax.numpy as jnp

    from ealdm_tpu.models.distributions import DiagonalGaussian

    rng = np.random.RandomState(0)
    moments = rng.randn(2, 8, 8, 6).astype(np.float32)  # mean||logvar on C
    ref = DiagonalGaussianDistribution(
        torch.from_numpy(np.transpose(moments, (0, 3, 1, 2)).copy())
    )
    ours = DiagonalGaussian.from_moments(jnp.asarray(moments))

    np.testing.assert_allclose(
        np.asarray(ours.kl()), ref.kl().numpy(), rtol=1e-5, atol=1e-5
    )
    other_m = rng.randn(2, 8, 8, 6).astype(np.float32)
    ref_o = DiagonalGaussianDistribution(
        torch.from_numpy(np.transpose(other_m, (0, 3, 1, 2)).copy())
    )
    ours_o = DiagonalGaussian.from_moments(jnp.asarray(other_m))
    np.testing.assert_allclose(
        np.asarray(ours.kl(ours_o)), ref.kl(ref_o).numpy(), rtol=1e-5, atol=1e-5
    )
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.nll(jnp.asarray(x))),
        ref.nll(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy(),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours.mode()),
        np.transpose(ref.mode().numpy(), (0, 2, 3, 1)),
        rtol=1e-6,
    )
