"""Hoisted step-invariant sampling == the plain per-step path, exactly.

The DDIM/PLMS scans re-execute two step-invariant computations in the
reference per step: the cross-attn K/V projections of the constant CFG
context (`ldm/modules/attention.py:152-193`) and the timestep-embedding
MLP + per-ResBlock emb projections (`openaimodel.py:184-205,468-473`).
`inference.hoist_invariants` precomputes both outside the scan; these tests
pin that the hoisted program is numerically identical to the per-step one
on every supported path (CFG, scale==1, streams-split, PLMS) and that the
site plan mirrors the real module tree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_diffusion import _mixed_batch, stdiff_model  # noqa: F401

from ealdm_tpu.inference import (
    encode_cfg_conditioning,
    hoist_invariants,
    make_eps_fn,
    sample_images,
    split_streams,
)
from ealdm_tpu.models.ddpm import build_unet
from ealdm_tpu.models.unet import (
    precompute_context_kv,
    precompute_emb_tables,
    unet_site_plan,
)
from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.samplers import DDIMConfig, ddim_sample


def _setup(stdiff_model, steps=4):
    model, variables, batch = stdiff_model
    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, linear_start=model.linear_start,
        linear_end=model.linear_end,
    )
    ddim = DDIMSchedule.create(sched, steps, eta=1.0)
    uncond, cond = encode_cfg_conditioning(model, variables, batch["mixed"])
    return model, variables, sched, ddim, cond, uncond


def test_site_plan_matches_param_tree(stdiff_model):  # noqa: F811
    model, variables, _ = stdiff_model
    unet = build_unet(model.unet_config, dtype=model.dtype)
    params = variables["params"]["model"]["diffusion_model"]
    res_sites, attn_sites = unet_site_plan(unet)
    for site in res_sites:
        assert "emb_proj" in params[site], site
    for site in attn_sites:
        assert "attn2" in params[site]["block_0"], site
    # the plan is exhaustive: every emb_proj/attn2 site in the tree is listed
    tree_res = {k for k, v in params.items() if "emb_proj" in v}
    tree_attn = {k for k, v in params.items()
                 if isinstance(v, dict) and "block_0" in v}
    assert set(res_sites) == tree_res
    assert set(attn_sites) == tree_attn


def test_precomputed_kv_matches_dense(stdiff_model):  # noqa: F811
    model, variables, _, ddim, cond, _ = _setup(stdiff_model)
    unet = build_unet(model.unet_config, dtype=model.dtype)
    params = variables["params"]["model"]["diffusion_model"]
    kv = precompute_context_kv(unet, params, cond)
    _, attn_sites = unet_site_plan(unet)
    site = attn_sites[0]
    w_k = params[site]["block_0"]["attn2"]["to_k"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(kv[site][0][0]), np.asarray(cond @ w_k), rtol=1e-6
    )


def test_hoisted_ddim_matches_plain(stdiff_model):  # noqa: F811
    model, variables, sched, ddim, cond, uncond = _setup(stdiff_model)
    cfg = DDIMConfig(num_steps=ddim.num_steps, eta=1.0,
                     unconditional_guidance_scale=2.0)
    shape = (cond.shape[0], 16, 16, 4)
    rng = jax.random.PRNGKey(7)

    plain = ddim_sample(
        make_eps_fn(model, variables), rng, shape, ddim, cfg,
        cond=cond, uncond=uncond,
    )
    eps_fn, cond_h, uncond_h, extra = hoist_invariants(
        model, variables, ddim, cond, uncond
    )
    assert extra is not None  # crossattn stdiff model is hoistable
    hoisted = ddim_sample(
        eps_fn, rng, shape, ddim, cfg, cond=cond_h, uncond=uncond_h,
        extra_tables=extra,
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(plain), rtol=1e-5, atol=1e-5
    )


def test_hoisted_ddim_scale1_and_jit(stdiff_model):  # noqa: F811
    """scale==1 single-branch path, under jit (the deployed form)."""
    model, variables, sched, ddim, cond, _ = _setup(stdiff_model)
    cfg = DDIMConfig(num_steps=ddim.num_steps, eta=0.0,
                     unconditional_guidance_scale=1.0)
    shape = (cond.shape[0], 16, 16, 4)
    rng = jax.random.PRNGKey(3)

    plain = ddim_sample(
        make_eps_fn(model, variables), rng, shape, ddim, cfg, cond=cond
    )
    eps_fn, cond_h, _, extra = hoist_invariants(model, variables, ddim, cond)

    @jax.jit
    def run(c, e):
        return ddim_sample(eps_fn, rng, shape, ddim, cfg, cond=c,
                           extra_tables=e)

    hoisted = run(cond_h, extra)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(plain), rtol=1e-5, atol=1e-5
    )


def test_hoisted_with_streams(stdiff_model):  # noqa: F811
    """split_streams slices the hoisted K/V pytree per chain and passes the
    batch-free emb rows through unchanged."""
    model, variables, sched, ddim, cond, uncond = _setup(stdiff_model)
    cfg = DDIMConfig(num_steps=ddim.num_steps, eta=1.0,
                     unconditional_guidance_scale=2.0)
    shape = (cond.shape[0], 16, 16, 4)
    rng = jax.random.PRNGKey(11)

    eps_fn, cond_h, uncond_h, extra = hoist_invariants(
        model, variables, ddim, cond, uncond
    )
    one = ddim_sample(eps_fn, rng, shape, ddim, cfg, cond=cond_h,
                      uncond=uncond_h, extra_tables=extra)
    two = ddim_sample(split_streams(eps_fn, 2), rng, shape, ddim, cfg,
                      cond=cond_h, uncond=uncond_h, extra_tables=extra)
    np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                               rtol=1e-5, atol=1e-5)


def test_sample_images_hoist_flag(stdiff_model):  # noqa: F811
    model, variables, batch = stdiff_model
    mixed = {k: v[:2] for k, v in batch["mixed"].items()}
    kw = dict(steps=3, eta=1.0, mixed=mixed)
    rng = jax.random.PRNGKey(5)
    imgs_h, _ = sample_images(model, variables, rng, 2, (16, 16, 4),
                              hoist=True, **kw)
    imgs_p, _ = sample_images(model, variables, rng, 2, (16, 16, 4),
                              hoist=False, **kw)
    np.testing.assert_allclose(np.asarray(imgs_h), np.asarray(imgs_p),
                               rtol=1e-5, atol=1e-5)


def test_hoisted_plms_kv_only(stdiff_model):  # noqa: F811
    """PLMS rides the hoisted K/V (step-constant) but not the emb tables."""
    model, variables, batch = stdiff_model
    mixed = {k: v[:2] for k, v in batch["mixed"].items()}
    kw = dict(steps=4, eta=0.0, mixed=mixed, sampler="plms")
    rng = jax.random.PRNGKey(9)
    imgs_h, _ = sample_images(model, variables, rng, 2, (16, 16, 4),
                              hoist=True, **kw)
    imgs_p, _ = sample_images(model, variables, rng, 2, (16, 16, 4),
                              hoist=False, **kw)
    np.testing.assert_allclose(np.asarray(imgs_h), np.asarray(imgs_p),
                               rtol=1e-5, atol=1e-5)


def test_emb_tables_match_per_step(stdiff_model):  # noqa: F811
    """A hoisted table row equals the in-module Dense on the same timestep."""
    model, variables, sched, ddim, cond, _ = _setup(stdiff_model)
    unet = build_unet(model.unet_config, dtype=model.dtype)
    params = variables["params"]["model"]["diffusion_model"]
    tables = precompute_emb_tables(unet, params, ddim.timesteps)
    res_sites, _ = unet_site_plan(unet)
    b = 2
    t0 = int(ddim.timesteps[1])
    t_vec = jnp.full((b,), t0, jnp.int32)
    x = jnp.zeros((b, 16, 16, 4))
    # plain and hoisted UNet calls must agree on the SAME timestep
    y_plain = model.apply(variables, x, t_vec, cond[:b],
                          method=model.apply_model)
    rows = {s: tables[s][1] for s in res_sites}
    kv = precompute_context_kv(unet, params, cond[:b])
    y_hoist = model.apply(variables, x, t_vec, None, context_kv=kv,
                          emb_tables=rows, method=model.apply_model)
    np.testing.assert_allclose(np.asarray(y_hoist), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-6)


def test_want_emb_tables_false_skips_tables(stdiff_model):  # noqa: F811
    """want_emb_tables=False (the PLMS caller) skips the per-step table
    precompute but still returns the hoisted K/V conditioning."""
    model, variables, _, ddim, cond, uncond = _setup(stdiff_model)
    eps_fn, cond_h, uncond_h, extra = hoist_invariants(
        model, variables, ddim, cond, uncond, want_emb_tables=False
    )
    assert extra is None
    # cond/uncond came back as K/V pytrees, not raw context arrays
    assert isinstance(cond_h, dict) and isinstance(uncond_h, dict)
    # the K/V-only eps_fn still evaluates (emb rows computed in-module)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.full((2,), int(ddim.timesteps[0]), jnp.int32)
    y = eps_fn(x, t, jax.tree_util.tree_map(lambda a: a[:2], cond_h))
    assert np.isfinite(np.asarray(y)).all()


def test_hoist_fallback_non_crossattn():
    """concat-key models fall back to the plain eps_fn (no hoist)."""
    from ealdm_tpu.models.ddpm import LatentDiffusion
    from tests.test_diffusion import TINY_UNET

    unet_cfg = dict(TINY_UNET)
    unet_cfg["in_channels"] = 6
    model = LatentDiffusion(
        unet_config=unet_cfg, first_stage_config=None,
        cond_stage_config="__is_unconditional__", timesteps=10,
        conditioning_key="concat", cond_stage_key="img",
    )
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x,
        jnp.zeros((1,), jnp.int32), x, method=model.apply_model,
    )
    sched = DiffusionSchedule.create(timesteps=10)
    ddim = DDIMSchedule.create(sched, 2)
    eps_fn, cond, uncond, extra = hoist_invariants(
        model, variables, ddim, cond=x
    )
    assert extra is None
    assert cond is x  # passthrough
