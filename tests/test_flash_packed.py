"""Golden tests for the packed-layout flash attention (round-5 formatting
experiment): head split/merge via kernel indexing instead of HBM transposes.
Runs the Pallas kernel in interpret mode (hermetic CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.ops.attention import _flash_packed_forward, sdpa


def _dense_packed(q, k, v, heads, scale=None):
    b, n, hd = q.shape
    m = k.shape[1]
    d = hd // heads
    qs = q.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    ks = k.reshape(b, m, heads, d).transpose(0, 2, 1, 3)
    vs = v.reshape(b, m, heads, d).transpose(0, 2, 1, 3)
    o = sdpa(qs, ks, vs, scale)
    return o.transpose(0, 2, 1, 3).reshape(b, n, hd)


@pytest.mark.parametrize("b,n,heads,d", [(2, 256, 8, 32), (1, 512, 4, 32),
                                         (2, 256, 2, 64)])
def test_flash_packed_matches_dense(rng, b, n, heads, d):
    hd = heads * d
    q = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    ref = _dense_packed(q, k, v, heads)
    out = _flash_packed_forward(q, k, v, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_packed_blocked_q(rng):
    """block_q smaller than n exercises the grid over query tiles."""
    b, n, heads, d = 1, 512, 8, 32
    hd = heads * d
    q = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    ref = _dense_packed(q, k, v, heads)
    out = _flash_packed_forward(q, k, v, heads, block_q=128, block_k=256,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,n,m,heads,d", [(2, 256, 4, 8, 32),
                                            (1, 1024, 16, 8, 32),
                                            (2, 256, 4, 2, 64)])
def test_tiny_ctx_packed_matches_dense(rng, b, n, m, heads, d):
    """Block-diagonal tiny-context cross-attention == per-head sdpa."""
    from ealdm_tpu.ops.attention import tiny_ctx_attention_packed

    hd = heads * d
    q = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, m, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, m, hd).astype(np.float32))
    ref = _dense_packed(q, k, v, heads)
    out = tiny_ctx_attention_packed(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_packed_grad_matches_dense(rng):
    """The rematerialized dense backward: grads equal the dense path's."""
    from ealdm_tpu.ops import attention as A

    b, n, heads, d = 1, 256, 4, 32
    hd = heads * d
    q = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, n, hd).astype(np.float32))

    # route the custom-vjp forward through interpret mode on CPU
    orig = A._flash_packed_forward
    A.__dict__["_flash_packed_forward"] = (
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    try:
        g_packed = jax.grad(
            lambda q_: A.flash_attention_packed(q_, k, v, heads).sum()
        )(q)
    finally:
        A.__dict__["_flash_packed_forward"] = orig
    g_dense = jax.grad(
        lambda q_: _dense_packed(q_, k, v, heads).sum()
    )(q)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_dense),
                               rtol=2e-5, atol=2e-5)


def test_unet_flash_packed_mode_matches_dense(rng):
    """Full tiny-UNet forward under set_attention_impl('flash_packed') ==
    the dense default. On CPU the packed Pallas branch stays off (TPU-only
    guard) but the tiny-context block-diagonal cross-attention engages at
    n>=256 sites — the end-to-end wiring equivalence this pins."""
    from ealdm_tpu.models import UNetModel
    from ealdm_tpu.ops.attention import set_attention_impl

    cfg = dict(
        image_size=16, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[1], num_res_blocks=1, channel_mult=[1],
        num_head_channels=16, use_spatial_transformer=True,
        transformer_depth=1, context_dim=32,
    )
    m = UNetModel(**cfg)
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))  # n=256
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.asarray(rng.randn(2, 4, 32).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    ref = m.apply({"params": params}, x, t, ctx)
    set_attention_impl("flash_packed")
    try:
        out = m.apply({"params": params}, x, t, ctx)
    finally:
        set_attention_impl("dense")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
