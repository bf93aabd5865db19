"""split_input fold/unfold patched inference.

Oracles: torch.nn.Unfold / torch.nn.Fold (the reference builds its patched
paths directly on these, ddpm.py:609-659) plus exact-identity properties.
"""
import numpy as np
import torch

import jax.numpy as jnp

from ealdm_tpu.ops.patching import (
    compute_weighting,
    delta_border,
    fold2d,
    grid_shape,
    patched_apply,
    unfold2d,
)

P = {
    "ks": (8, 8),
    "stride": (4, 4),
    "vqf": 2,
    "patch_distributed_vq": True,
    "tie_braker": True,
    "clip_max_weight": 0.5,
    "clip_min_weight": 0.01,
    "clip_max_tie_weight": 0.5,
    "clip_min_tie_weight": 0.01,
}


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_unfold_matches_torch():
    x = _rand((2, 16, 12, 3))
    ours = unfold2d(jnp.asarray(x), (8, 6), (4, 3))  # [B, L, kh, kw, C]
    t = torch.nn.Unfold(kernel_size=(8, 6), stride=(4, 3))(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    )  # [B, C*kh*kw, L]
    b, _, length = t.shape
    t = t.view(b, 3, 8, 6, length).permute(0, 4, 2, 3, 1).numpy()  # [B,L,kh,kw,C]
    np.testing.assert_allclose(np.asarray(ours), t, rtol=0, atol=0)


def test_fold_matches_torch():
    ly, lx = grid_shape((16, 12), (8, 6), (4, 3))
    patches = _rand((2, ly * lx, 8, 6, 3), seed=1)
    ours = fold2d(jnp.asarray(patches), (16, 12), (8, 6), (4, 3))
    t_in = (
        torch.from_numpy(patches)
        .permute(0, 4, 2, 3, 1)  # [B,C,kh,kw,L]
        .reshape(2, 3 * 8 * 6, ly * lx)
    )
    t = torch.nn.Fold(output_size=(16, 12), kernel_size=(8, 6), stride=(4, 3))(t_in)
    np.testing.assert_allclose(
        np.asarray(ours), t.numpy().transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-5
    )


def test_weighting_matches_reference_formula():
    # reference get_weighting (ddpm.py:593-607) re-derived inline with torch
    h, w, ly, lx = 8, 8, 3, 3

    def t_delta_border(hh, ww):
        y = torch.arange(0, hh).view(hh, 1, 1).repeat(1, ww, 1)
        x = torch.arange(0, ww).view(1, ww, 1).repeat(hh, 1, 1)
        arr = torch.cat([y, x], dim=-1) / torch.tensor([hh - 1, ww - 1]).view(1, 1, 2)
        d1 = torch.min(arr, dim=-1, keepdims=True)[0]
        d2 = torch.min(1 - arr, dim=-1, keepdims=True)[0]
        return torch.min(torch.cat([d1, d2], dim=-1), dim=-1)[0]

    ref = torch.clip(t_delta_border(h, w), P["clip_min_weight"], P["clip_max_weight"])
    ref = ref.view(1, h * w, 1).repeat(1, 1, ly * lx)
    tie = torch.clip(
        t_delta_border(ly, lx), P["clip_min_tie_weight"], P["clip_max_tie_weight"]
    ).view(1, 1, ly * lx)
    ref = (ref * tie).numpy()[0]  # [h*w, L]

    ours = np.asarray(compute_weighting(h, w, ly, lx, P))  # [L, h, w, 1]
    np.testing.assert_allclose(
        ours.reshape(ly * lx, h * w).T, ref, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(delta_border(h, w)), t_delta_border(h, w).numpy(), atol=1e-6
    )


def test_patched_identity_reconstructs_exactly():
    # fn = identity -> every output pixel is a weighted average of identical
    # crop values, so the stitch must reproduce the input bit-for-bit (up to
    # float division).
    x = jnp.asarray(_rand((2, 16, 16, 4), seed=2))
    out = patched_apply(lambda c: c, x, P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_patched_upsample_uf():
    # fn = 2x nearest upsample; constant input must stitch to the constant.
    x = jnp.full((1, 16, 16, 2), 3.5, jnp.float32)
    fn = lambda c: jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
    out = patched_apply(fn, x, P, uf=2)
    assert out.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_patched_downsample_df():
    x = jnp.asarray(_rand((1, 16, 16, 2), seed=3))
    fn = lambda c: c[:, ::2, ::2, :]
    out = patched_apply(fn, x, P, df=2)
    assert out.shape == (1, 8, 8, 2)
    # strided subsample commutes with the crop grid -> exact reconstruction
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x)[:, ::2, ::2, :], rtol=1e-5, atol=1e-5
    )


def test_latent_diffusion_patched_apply_model():
    """Single-crop patched apply_model == dense apply_model; multi-crop runs."""
    import jax

    from ealdm_tpu.models.ddpm import LatentDiffusion

    unet = dict(
        image_size=16, in_channels=3, out_channels=3, model_channels=16,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2,
    )
    common = dict(
        unet_config=unet, first_stage_config=None,
        cond_stage_config="__is_unconditional__", timesteps=8,
        unconditional_guidance_scale=1.0,
    )
    full = {**P, "ks": (16, 16), "stride": (16, 16)}  # one crop == whole input
    m_dense = LatentDiffusion(**common)
    m_one = LatentDiffusion(**common, split_input_params=full)
    m_multi = LatentDiffusion(**common, split_input_params={**P, "ks": (16, 16), "stride": (8, 8)})

    x = jnp.asarray(_rand((2, 24, 24, 3), seed=4))
    t = jnp.array([3, 5], jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = m_dense.init(rng, x, t, None, method=m_dense.apply_model)

    dense = m_dense.apply(params, x, t, None, method=m_dense.apply_model)
    one = m_one.apply(params, x, t, None, method=m_one.apply_model)
    # 24x24 with ks=stride=16 clamps to a (1,1)... actually (24-16)//16+1 = 1
    # crop covering [0:16]; use 16x16 input for the exact-equality check.
    x16 = x[:, :16, :16]
    dense16 = m_dense.apply(params, x16, t, None, method=m_dense.apply_model)
    one16 = m_one.apply(params, x16, t, None, method=m_one.apply_model)
    np.testing.assert_allclose(np.asarray(one16), np.asarray(dense16), rtol=1e-4, atol=1e-4)

    multi = m_multi.apply(params, x, t, None, method=m_multi.apply_model)
    assert multi.shape == x.shape and np.isfinite(np.asarray(multi)).all()
    assert one.shape == x.shape and dense.shape == x.shape


def test_latent_diffusion_patched_first_stage_roundtrip():
    """Patched encode (df=vqf) and decode (uf=vqf) with an identity-ish VQ-free
    first stage: shapes follow the vq factor and values stay finite."""
    import jax

    from ealdm_tpu.models.ddpm import LatentDiffusion

    fs = dict(
        target="AutoencoderKL",
        params=dict(
            embed_dim=4,
            ddconfig=dict(
                double_z=True, z_channels=4, resolution=32, in_channels=3,
                out_ch=3, ch=8, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[], dropout=0.0,
            ),
        ),
    )
    unet = dict(
        image_size=16, in_channels=4, out_channels=4, model_channels=8,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
    )
    m = LatentDiffusion(
        unet_config=unet, first_stage_config=fs,
        cond_stage_config="__is_unconditional__", timesteps=8,
        unconditional_guidance_scale=1.0,
        split_input_params={**P, "ks": (16, 16), "stride": (8, 8), "vqf": 2},
    )
    x = jnp.asarray(_rand((1, 32, 32, 3), seed=5))
    rng = jax.random.PRNGKey(0)

    def roundtrip(mdl, img):
        return mdl.decode_first_stage(mdl.encode_first_stage(img, None, False))

    params = m.init(rng, x, method=roundtrip)
    z = m.apply(params, x, None, False, method=m.encode_first_stage)
    assert z.shape == (1, 16, 16, 4)
    dec = m.apply(params, z, method=m.decode_first_stage)
    assert dec.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(dec)).all()
