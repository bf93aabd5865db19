"""HWNC compute-layout equivalence + stream-split batching.

The UNet computes internally in logical HWNC on TPU (see
ealdm_tpu/models/unet.py UNetModel.data_format); these tests pin the
contract that layout and stream-splitting are pure performance knobs:
outputs are identical to the NHWC / unsplit paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.models.unet import UNetModel
from ealdm_tpu.ops import norms


UNET_CFG = dict(
    image_size=8, in_channels=4, out_channels=4, model_channels=32,
    attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
    num_head_channels=16, use_spatial_transformer=True,
    transformer_depth=1, context_dim=64,
)


def _data():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([3, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 64))
    return x, t, ctx


def test_unet_hwnc_matches_nhwc():
    x, t, ctx = _data()
    m_h = UNetModel(**UNET_CFG, data_format="HWNC")
    m_n = UNetModel(**UNET_CFG, data_format="NHWC")
    v = m_h.init({"params": jax.random.PRNGKey(0)}, x, t, ctx)
    y_h = m_h.apply(v, x, t, ctx)
    y_n = m_n.apply(v, x, t, ctx)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_n),
                               rtol=0, atol=2e-5)


def test_unet_hwnc_matches_nhwc_adm_scale_shift_updown():
    x, t, _ = _data()
    cfg = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=4, resblock_updown=True, num_classes=5,
        use_scale_shift_norm=True,
    )
    y_lab = jnp.array([1, 3])
    m_h = UNetModel(**cfg, data_format="HWNC")
    m_n = UNetModel(**cfg, data_format="NHWC")
    v = m_h.init({"params": jax.random.PRNGKey(0)}, x, t, None, y_lab)
    np.testing.assert_allclose(
        np.asarray(m_h.apply(v, x, t, None, y_lab)),
        np.asarray(m_n.apply(v, x, t, None, y_lab)),
        rtol=0, atol=2e-5,
    )


def test_unet_hwnc_gradients_match():
    x, t, ctx = _data()
    m_h = UNetModel(**UNET_CFG, data_format="HWNC")
    m_n = UNetModel(**UNET_CFG, data_format="NHWC")
    v = m_h.init({"params": jax.random.PRNGKey(0)}, x, t, ctx)

    def loss(variables, m):
        return jnp.sum(jnp.square(m.apply(variables, x, t, ctx)))

    g_h = jax.grad(lambda v_: loss(v_, m_h))(v)
    g_n = jax.grad(lambda v_: loss(v_, m_n))(v)
    flat_h = jax.tree_util.tree_leaves(g_h)
    flat_n = jax.tree_util.tree_leaves(g_n)
    for a, b in zip(flat_h, flat_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_group_norm_hwnc_jnp_path_matches_nhwc():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 64), jnp.float32)
    s = jnp.asarray(rng.randn(64), jnp.float32)
    b = jnp.asarray(rng.randn(64), jnp.float32)
    pb = jnp.asarray(rng.randn(4, 64), jnp.float32)
    y_n = norms.group_norm(x, s, b, 32, 1e-5, act=norms.silu,
                           data_format="NHWC", pre_bias=pb)
    y_h = norms.group_norm(jnp.transpose(x, (1, 2, 0, 3)), s, b, 32, 1e-5,
                           act=norms.silu, data_format="HWNC", pre_bias=pb)
    np.testing.assert_allclose(
        np.asarray(y_n), np.asarray(jnp.transpose(y_h, (2, 0, 1, 3))),
        rtol=0, atol=1e-5,
    )


def test_split_streams_identical_outputs():
    from ealdm_tpu.inference import split_streams

    calls = []

    def eps_fn(x, t, ctx):
        calls.append(x.shape[0])
        return x * 2.0 + ctx.sum(axis=(1, 2), keepdims=True)[:, :, None]

    x = jax.random.normal(jax.random.PRNGKey(0), (6, 4, 4, 2))
    t = jnp.arange(6)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (6, 3, 5))
    base = eps_fn(x, t, ctx)
    calls.clear()
    split = split_streams(eps_fn, 3)(x, t, ctx)
    assert calls == [2, 2, 2]
    np.testing.assert_allclose(np.asarray(base), np.asarray(split), rtol=1e-6)
    # streams=1 returns the function unchanged
    assert split_streams(eps_fn, 1) is eps_fn
