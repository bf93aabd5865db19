"""LatentDiffusion core + samplers + train step (tiny shapes, CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.models.ddpm import DDPM, LatentDiffusion
from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.samplers import DDIMConfig, ancestral_sample, ddim_sample, plms_sample

TINY_UNET = dict(
    image_size=8, in_channels=3, model_channels=16, out_channels=3,
    num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
    num_heads=2,
)

TINY_UNET_COND = dict(
    image_size=8, in_channels=4, model_channels=16, out_channels=4,
    num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
    num_head_channels=8, use_spatial_transformer=True, transformer_depth=1,
    context_dim=32,
)

TINY_VQ_FS = {
    "target": "ldm.models.autoencoder.VQModelInterface",
    "params": {
        "embed_dim": 4, "n_embed": 32,
        "ddconfig": dict(
            double_z=False, z_channels=4, resolution=32, in_channels=3,
            out_ch=3, ch=16, ch_mult=[1, 2], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0,
        ),
    },
}

COND_ARGS = {
    "type": "fourier", "dequant": "gauss", "noise": 0, "noise_f_int": [],
    "noise_f": [], "dims": 6, "lr": 1, "lin_lr": 0.01,
    "f_manual": [1.84, 672], "include_lin": True,
}

STDIFF_COND = {
    "target": "STDiff.models.UnetCond",
    "params": {
        "mid_dim": 4, "emb_dim": 16, "out_dim": 32, "w_dim": 5, "f_dim": 1,
        "hidden_dim": 8, "cond_args": COND_ARGS,
    },
}


def _mixed_batch(b=2):
    r = np.random.RandomState(0)
    return {
        "img": jnp.asarray(r.randn(b, 32, 32, 3).astype(np.float32)),
        "mixed": {
            "img": jnp.asarray(r.randn(b, 32, 32, 3).astype(np.float32)),
            "img_random": jnp.asarray(r.randn(b, 32, 32, 3).astype(np.float32)),
            "flow": jnp.asarray(r.randn(b, 1, 1).astype(np.float32)),
            "weather": jnp.asarray(r.randn(b, 1, 5).astype(np.float32)),
            "time": jnp.asarray(r.rand(b, 1).astype(np.float32)),
        },
    }


@pytest.fixture(scope="module")
def stdiff_model():
    model = LatentDiffusion(
        unet_config=TINY_UNET_COND,
        first_stage_config=TINY_VQ_FS,
        cond_stage_config=STDIFF_COND,
        timesteps=20,
        linear_start=0.0015,
        linear_end=0.0195,
        conditioning_key="crossattn",
        cond_stage_key="mixed",
        cond_stage_trainable=True,
        scale_factor=1.0,
        unconditional_guidance_scale=2.0,
    )
    batch = _mixed_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, jax.random.PRNGKey(2), method=model.full_init,
    )["params"]
    return model, {"params": params}, batch


def test_ddpm_pixel_space_loss():
    model = DDPM(unet_config=TINY_UNET, timesteps=10)
    batch = {"img": jnp.ones((2, 8, 8, 3)) * 0.3}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1)
    )
    loss, metrics = model.apply(variables, batch, jax.random.PRNGKey(2))
    # at init the UNet outputs zeros -> loss_simple == E[noise^2] ~ 1
    assert 0.5 < float(metrics["loss_simple"]) < 2.0
    assert np.isfinite(float(loss))


def test_latent_stdiff_training_cfg_loss(stdiff_model):
    model, params, batch = stdiff_model
    loss, metrics = model.apply(
        params, batch, jax.random.PRNGKey(3), train=True,
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(loss))
    assert set(metrics) >= {"loss", "loss_simple", "loss_vlb"}
    # grads flow to unet and cond tower; first stage is stop_gradient'ed.
    # (At exact init the zero-init proj_out convs make d loss/d context == 0 —
    # same as the reference — so perturb away from init first.)
    params_p = jax.tree_util.tree_map(lambda p: p + 0.01, params)

    def lf(p):
        l, _ = model.apply(p, batch, jax.random.PRNGKey(3), train=False)
        return l

    grads = jax.grad(lf)(params_p)["params"]

    def l1(tree):
        return float(
            jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), tree, 0.0)
        )

    gnorm_unet = l1(grads["model"])
    gnorm_cond = l1(grads["cond_stage_model"])
    gnorm_fs = l1(grads["first_stage_model"])
    assert gnorm_unet > 0 and gnorm_cond > 0
    assert gnorm_fs == 0.0


def test_q_sample_statistics():
    model = DDPM(unet_config=TINY_UNET, timesteps=100)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        {"img": jnp.zeros((1, 8, 8, 3))}, jax.random.PRNGKey(1),
    )

    def qs(x, t, n):
        return model.apply(variables, x, t, n, method=model.q_sample)

    x = jnp.ones((4, 8, 8, 3))
    noise = jnp.zeros_like(x)
    t0 = jnp.zeros((4,), jnp.int32)
    y = qs(x, t0, noise)
    sched = DiffusionSchedule.create(timesteps=100)
    np.testing.assert_allclose(
        np.asarray(y)[0, 0, 0, 0], float(sched.sqrt_alphas_cumprod[0]), rtol=1e-5
    )


def test_ddim_sampler_runs_and_cfg():
    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5, eta=0.0)

    calls = {"n": 0}

    def eps_fn(x, t, ctx):
        calls["n"] += 1
        return x * 0.1

    out = ddim_sample(
        eps_fn, jax.random.PRNGKey(0), (2, 8, 8, 3), ddim,
        DDIMConfig(num_steps=5, eta=0.0),
    )
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()

    # CFG path: cond/uncond contexts halve/duplicate the batch internally
    cond = jnp.ones((2, 4, 32))
    uncond = jnp.zeros((2, 4, 32))

    def eps_cfg(x, t, ctx):
        assert x.shape[0] == 4  # 2N batched call
        return x * 0.1 + jnp.mean(ctx) * 0.01

    out2 = ddim_sample(
        eps_cfg, jax.random.PRNGKey(0), (2, 8, 8, 3), ddim,
        DDIMConfig(num_steps=5, eta=0.0, unconditional_guidance_scale=3.0),
        cond=cond, uncond=uncond,
    )
    assert out2.shape == (2, 8, 8, 3)


def test_ddim_deterministic_eta0():
    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5, eta=0.0)
    eps_fn = lambda x, t, c: x * 0.05
    x_T = jnp.ones((1, 4, 4, 2))
    a = ddim_sample(eps_fn, jax.random.PRNGKey(1), (1, 4, 4, 2), ddim,
                    DDIMConfig(eta=0.0), x_T=x_T)
    b = ddim_sample(eps_fn, jax.random.PRNGKey(2), (1, 4, 4, 2), ddim,
                    DDIMConfig(eta=0.0), x_T=x_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_inpainting_mask_keeps_known_region():
    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 5, eta=0.0)
    eps_fn = lambda x, t, c: jnp.zeros_like(x)
    x0 = jnp.ones((1, 8, 8, 1)) * 0.7
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half known
    out = ddim_sample(
        eps_fn, jax.random.PRNGKey(0), (1, 8, 8, 1), ddim, DDIMConfig(),
        mask=mask, x0=x0, schedule=sched,
    )
    assert out.shape == (1, 8, 8, 1)


def test_plms_multistep_runs():
    sched = DiffusionSchedule.create(timesteps=20)
    ddim = DDIMSchedule.create(sched, 6, eta=0.0)
    eps_fn = lambda x, t, c: x * 0.05
    out = plms_sample(eps_fn, jax.random.PRNGKey(0), (1, 8, 8, 3), ddim,
                      DDIMConfig(eta=0.0))
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ancestral_sampler_runs():
    sched = DiffusionSchedule.create(timesteps=10)
    eps_fn = lambda x, t, c: x * 0.05
    out = ancestral_sample(eps_fn, jax.random.PRNGKey(0), (1, 4, 4, 3), sched)
    assert out.shape == (1, 4, 4, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_first_stage_cond_sentinel_encodes_condition():
    """cond_stage_config='__is_first_stage__' (inpainting/SR, reference
    instantiate_cond_stage ddpm.py:516-518): get_learned_conditioning must
    route the raw conditioning image through the FIRST-STAGE encoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ealdm_tpu.models.ddpm import LatentDiffusion

    fs = dict(
        target="AutoencoderKL",
        params=dict(
            embed_dim=3,
            ddconfig=dict(
                double_z=True, z_channels=3, resolution=16, in_channels=3,
                out_ch=3, ch=8, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[], dropout=0.0,
            ),
        ),
    )
    unet = dict(
        image_size=8, in_channels=6, out_channels=3, model_channels=8,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
    )
    m = LatentDiffusion(
        unet_config=unet, first_stage_config=fs,
        cond_stage_config="__is_first_stage__", conditioning_key="concat",
        cond_stage_key="LR_image", timesteps=8,
        unconditional_guidance_scale=1.0,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)

    def both(mdl, img):
        c = mdl.get_learned_conditioning(img)
        z = mdl.encode_first_stage(img, None, False)
        return c, z

    params = m.init(jax.random.PRNGKey(0), x, method=both)
    c, z = m.apply(params, x, method=both)
    # encoded to latent resolution, not passed through raw
    assert c.shape == (2, 8, 8, 3), c.shape
    assert c.shape == z.shape


def test_hybrid_conditioning_dict_context():
    """'hybrid' takes {"c_concat","c_crossattn"} and routes both streams
    into the DiffusionWrapper (reference ddpm.py:1030-1038)."""
    import jax
    import jax.numpy as jnp

    from ealdm_tpu.models.ddpm import DiffusionWrapper

    unet = dict(
        image_size=8, in_channels=8, out_channels=4, model_channels=16,
        attention_resolutions=[1], num_res_blocks=1, channel_mult=[1],
        num_head_channels=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=32,
    )
    wrapper = DiffusionWrapper(unet_config=unet, conditioning_key="hybrid")
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    cc = jnp.zeros((2, 8, 8, 4))
    ca = jnp.zeros((2, 3, 32))
    v = wrapper.init(jax.random.PRNGKey(0), x, t, c_concat=[cc],
                     c_crossattn=[ca])
    out = wrapper.apply(v, x, t, c_concat=[cc], c_crossattn=[ca])
    assert out.shape == (2, 8, 8, 4)


def test_apply_model_hybrid_dense_and_guard():
    """LatentDiffusion.apply_model dispatches hybrid dict contexts and
    rejects a bare-array hybrid context with a clear error."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from ealdm_tpu.config import model_from_config

    cfg = {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "timesteps": 10,
            "conditioning_key": "hybrid",
            "cond_stage_key": "masked_image",
            "unet_config": {
                "target": "x.UNetModel",
                "params": dict(
                    image_size=8, in_channels=8, out_channels=4,
                    model_channels=16, attention_resolutions=[1],
                    num_res_blocks=1, channel_mult=[1], num_head_channels=8,
                    use_spatial_transformer=True, transformer_depth=1,
                    context_dim=32,
                ),
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {
                    "embed_dim": 4, "n_embed": 16,
                    "ddconfig": dict(
                        double_z=False, z_channels=4, resolution=16,
                        in_channels=3, out_ch=3, ch=8, ch_mult=[1, 2],
                        num_res_blocks=1, attn_resolutions=[], dropout=0.0,
                    ),
                },
            },
            "cond_stage_config": "__is_first_stage__",
        },
    }
    model, _ = model_from_config(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = {"c_concat": jnp.zeros((2, 8, 8, 4)),
           "c_crossattn": jnp.zeros((2, 3, 32))}
    v = model.init(jax.random.PRNGKey(0), x, t, ctx,
                   method=model.apply_model)
    out = model.apply(v, x, t, ctx, method=model.apply_model)
    assert out.shape == (2, 8, 8, 4)
    with _pytest.raises(ValueError, match="hybrid conditioning"):
        model.apply(v, x, t, jnp.zeros((2, 3, 32)), method=model.apply_model)


def test_prior_bpd_golden():
    """prior_bpd == KL(q(x_T|x_0) || N(0,I)) in bits/dim, fp64 closed form
    (ddpm.py:1022-1034)."""
    T = 10
    model = DDPM(unet_config=TINY_UNET, timesteps=T,
                 linear_start=0.0015, linear_end=0.0195)
    batch = {"img": jnp.ones((2, 8, 8, 3)) * 0.3}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1)
    )
    x = np.random.RandomState(3).randn(2, 8, 8, 3).astype(np.float32)
    got = np.asarray(
        model.apply(variables, jnp.asarray(x), method=model.prior_bpd)
    )

    betas = np.linspace(0.0015 ** 0.5, 0.0195 ** 0.5, T, dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas)[-1]
    mean = np.sqrt(acp) * x.astype(np.float64)
    logvar = np.log(1.0 - acp)
    kl = 0.5 * (-1.0 - logvar + np.exp(logvar) + mean ** 2)
    want = kl.reshape(2, -1).mean(axis=1) / np.log(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_predict_eps_roundtrip_and_dirac():
    """predict_eps_from_xstart inverts predict_start_from_noise
    (ddpm.py:1018-1020); DiracDistribution is a point mass."""
    from ealdm_tpu.models.distributions import DiracDistribution

    model = DDPM(unet_config=TINY_UNET, timesteps=10)
    batch = {"img": jnp.ones((2, 8, 8, 3)) * 0.3}
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1))
    x_t = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))
    eps = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3).astype(np.float32))
    t = jnp.array([3, 7])
    x0 = model.apply(v, x_t, t, eps, method=model.predict_start_from_noise)
    eps_back = model.apply(v, x_t, t, x0, method=model.predict_eps_from_xstart)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps), rtol=1e-4, atol=1e-4)

    d = DiracDistribution(x_t)
    assert d.sample() is x_t and d.mode() is x_t
