"""Model-level shape/behaviour tests on tiny configs (1-core-CPU friendly)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.models import (
    AutoencoderKL,
    UNetModel,
    UnetCond,
    VQModel,
    VectorQuantizer,
)
from ealdm_tpu.models.distributions import DiagonalGaussian

TINY_DD = dict(
    double_z=True, z_channels=3, resolution=32, in_channels=3, out_ch=3,
    ch=16, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[8], dropout=0.0,
)


def test_unet_shapes_uncond():
    m = UNetModel(
        image_size=16, in_channels=3, model_channels=16, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 99])
    params = m.init(jax.random.PRNGKey(0), x, t)
    y = m.apply(params, x, t)
    assert y.shape == (2, 16, 16, 3)
    # zero-init output conv => zero output at init
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_unet_crossattn_context():
    m = UNetModel(
        image_size=8, in_channels=4, model_channels=16, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=8, use_spatial_transformer=True, transformer_depth=1,
        context_dim=32,
    )
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([5, 10])
    ctx = jnp.ones((2, 4, 32))
    params = m.init(jax.random.PRNGKey(0), x, t, ctx)
    # break the zero-inits so the output can respond to the context
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    y = m.apply(params, x, t, ctx)
    assert y.shape == (2, 8, 8, 4)
    # context must influence the output (cross-attention wired through)
    y2 = m.apply(params, x, t, ctx * -3.0)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_unet_class_conditional():
    m = UNetModel(
        image_size=8, in_channels=3, model_channels=16, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_heads=2, num_classes=10,
    )
    x = jnp.ones((2, 8, 8, 3))
    t = jnp.array([1, 2])
    y_cls = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t, None, y_cls)
    out = m.apply(params, x, t, None, y_cls)
    assert out.shape == (2, 8, 8, 3)


def test_autoencoder_kl_roundtrip():
    m = AutoencoderKL(ddconfig=TINY_DD, embed_dim=3)
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    params = m.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    rec, posterior = m.apply(params, x, jax.random.PRNGKey(2))
    assert rec.shape == (1, 32, 32, 3)
    assert isinstance(posterior, DiagonalGaussian)
    assert posterior.mean.shape == (1, 16, 16, 3)
    kl = posterior.kl()
    assert kl.shape == (1,) and np.isfinite(np.asarray(kl)).all()


def test_vq_model_roundtrip_and_quantize():
    dd = dict(TINY_DD, double_z=False, z_channels=4)
    m = VQModel(ddconfig=dd, n_embed=32, embed_dim=4)
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    params = m.init(jax.random.PRNGKey(0), x)
    dec, diff, idx = m.apply(params, x)
    assert dec.shape == (1, 32, 32, 3)
    assert idx.shape == (1, 16, 16)
    assert np.isfinite(float(diff))
    # interface path: prequant encode + decode with quantization
    h = m.apply(params, x, method=m.encode_prequant)
    assert h.shape == (1, 16, 16, 4)
    rec = m.apply(params, h, method=m.decode_interface)
    assert rec.shape == (1, 32, 32, 3)


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_embed=8, embed_dim=4)
    z = jnp.asarray(np.random.RandomState(0).randn(1, 2, 2, 4).astype(np.float32))
    params = vq.init(jax.random.PRNGKey(0), z)

    def loss(z):
        zq, l, _ = vq.apply(params, z)
        return jnp.sum(zq * 2.0) + l

    g = jax.grad(loss)(z)
    # straight-through: dz of sum(2*zq) flows as 2 (+ commitment term)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 1.0


def test_stdiff_unetcond_shapes_and_cfg_branch():
    cond_args = {
        "type": "fourier", "dequant": "gauss", "noise": 0,
        "noise_f_int": [], "noise_f": [263.2, 7.79, 0], "dims": 6,
        "lr": 1, "lin_lr": 0.01, "f_manual": [1.8398, 672], "include_lin": True,
    }
    m = UnetCond(mid_dim=4, emb_dim=16, out_dim=32, w_dim=5, f_dim=1,
                 t_dim=6, hidden_dim=8, cond_args=cond_args)
    feat = jnp.ones((2, 8, 8, 4))
    flow = jnp.ones((2, 1, 1))
    weather = jnp.ones((2, 1, 5))
    time = jnp.full((2, 1), 0.3)
    params = m.init(jax.random.PRNGKey(0), feat, flow, weather, time)
    ctx = m.apply(params, feat, flow, weather, time, True)
    assert ctx.shape == (2, 4, 32)
    # negative branch skips fusion: different output, same shape, same params
    ctx_neg = m.apply(params, feat, flow, weather, time, False)
    assert ctx_neg.shape == (2, 4, 32)
    assert not np.allclose(np.asarray(ctx), np.asarray(ctx_neg))


def test_conditioning_transform_fourier():
    from ealdm_tpu.models import ConditioningTransform

    ca = {"type": "fourier", "dims": 6, "f_manual": [2.0, 10.0],
          "include_lin": True, "lin_lr": 0.01}
    xf = ConditioningTransform(ca, num_ws=1)
    c = jnp.array([[0.25], [0.5]])
    out = xf(c)
    assert out.shape == (2, 1, 6)
    o = np.asarray(out)[0, 0]
    # explicit lin slot: cos=1, sin=lin_lr*c
    assert o[0] == pytest.approx(1.0)
    assert o[1] == pytest.approx(0.01 * 0.25)
    # remaining slots are cos/sin pairs of 2*pi*f*c
    assert o[2] == pytest.approx(np.cos(2 * np.pi * 2.0 * 0.25), abs=1e-5)
    assert o[3] == pytest.approx(np.sin(2 * np.pi * 2.0 * 0.25), abs=1e-5)


def test_equalized_dense_and_condscale_dc_init():
    from ealdm_tpu.models import CondScale

    ca = {"type": "fourier", "lr": 1}
    m = CondScale(channels=8, cond_args=ca)
    c = jnp.concatenate([jnp.ones((3, 1)), jnp.zeros((3, 5))], axis=1)
    params = m.init(jax.random.PRNGKey(0), c=c)
    out = m.apply(params, c=c)
    # DC init: output ~ c[:,0] * 1/sqrt(c_dim) within 1e-4
    np.testing.assert_allclose(
        np.asarray(out), 1.0 / np.sqrt(6), rtol=1e-3
    )


def test_vae_attn_type_linear_and_none():
    """make_attn dispatch (model.py:205-214) plumbed through Encoder:
    'linear' builds VaeLinAttnBlock params, 'none' materialises none."""
    from ealdm_tpu.models.vae import Encoder

    x = jnp.ones((1, 16, 16, 3))
    kw = dict(ch=8, z_channels=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), resolution=16)

    p_lin = Encoder(attn_type="linear", **kw).init(jax.random.PRNGKey(0), x)["params"]
    assert "to_qkv" in p_lin["mid_attn_1"], sorted(p_lin["mid_attn_1"])

    enc_none = Encoder(attn_type="none", **kw)
    p_none = enc_none.init(jax.random.PRNGKey(0), x)["params"]
    assert not any("attn" in k for k in p_none), sorted(p_none)
    out = enc_none.apply({"params": p_none}, x)
    assert out.shape == (1, 8, 8, 6)


def test_vae_attn_type_from_ddconfig():
    """use_linear_attn in ddconfig forces linear (model.py:219-221)."""
    dd = dict(TINY_DD, use_linear_attn=True)
    m = AutoencoderKL(ddconfig=dd, embed_dim=3)
    p = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
               rng=jax.random.PRNGKey(1))["params"]
    assert "to_qkv" in p["encoder"]["mid_attn_1"]
