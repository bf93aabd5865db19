"""Golden tests for ops.winograd vs lax.conv_general_dilated.

The Winograd path is a recorded perf experiment (docs/PERF.md): it must be
numerically right even though the default impl stays "xla".
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealdm_tpu.ops.winograd import (
    conv2d, set_conv_impl, winograd_conv2d, winograd_eligible,
)


def _direct(x, w, data_format="NHWC"):
    dn = (("NHWC", "HWIO", "NHWC") if data_format == "NHWC"
          else ("HWNC", "HWIO", "HWNC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn)


@pytest.mark.parametrize("m", [2, 4])
@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 7, 9, 8), (3, 4, 4, 4)])
def test_winograd_matches_direct_fp32(m, shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, shape[-1], 12) / 8.0, jnp.float32)
    ref = _direct(x, w)
    got = winograd_conv2d(x, w, m=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("m", [2, 4])
def test_winograd_hwnc_matches_nhwc(m):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 10, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) / 8.0, jnp.float32)
    ref = winograd_conv2d(x, w, m=m, data_format="NHWC")
    got = winograd_conv2d(jnp.transpose(x, (1, 2, 0, 3)), w, m=m,
                          data_format="HWNC")
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (2, 0, 1, 3))), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


def test_winograd_bf16_error_bounded():
    """bf16 matmul staging: error stays within the documented envelope."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 32, 32) / np.sqrt(9 * 32), jnp.float32)
    ref = np.asarray(_direct(x, w))
    scale = np.abs(ref).mean()
    got2 = np.asarray(
        winograd_conv2d(x.astype(jnp.bfloat16), w, m=2), np.float32)
    got4 = np.asarray(
        winograd_conv2d(x.astype(jnp.bfloat16), w, m=4), np.float32)
    assert np.abs(got2 - ref).mean() / scale < 2e-2
    assert np.abs(got4 - ref).mean() / scale < 6e-2


def test_dispatch_switch_and_eligibility():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 8, 8) / 8.0, jnp.float32)
    w1 = jnp.asarray(rng.randn(1, 1, 8, 8) / 8.0, jnp.float32)
    ref = np.asarray(_direct(x, w3))
    try:
        set_conv_impl("winograd2")
        got = conv2d(x, w3)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)
        # 1x1 and strided convs must fall back to XLA
        assert not winograd_eligible(x.shape, w1.shape, (1, 1), "SAME", "NHWC")
        assert not winograd_eligible(x.shape, w3.shape, (2, 2), "SAME", "NHWC")
        np.testing.assert_allclose(
            np.asarray(conv2d(x, w3, strides=(2, 2))),
            np.asarray(jax.lax.conv_general_dilated(
                x, w3, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))),
            rtol=1e-6)
    finally:
        set_conv_impl("xla")


def test_winograd_grads_flow():
    """The einsum chain is differentiable — training under winograd works."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 4) / 6.0, jnp.float32)

    def loss_w(fn):
        return lambda w_: jnp.sum(fn(x, w_) ** 2)

    g_ref = jax.grad(loss_w(_direct))(w)
    g_win = jax.grad(loss_w(lambda a, b: winograd_conv2d(a, b, m=2)))(w)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_conv2d_module_under_winograd():
    """Conv2D produces the same output under both impls (fp32)."""
    from ealdm_tpu.models.layers import Conv2D

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
    mod = Conv2D(16, (3, 3), padding=1)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    try:
        set_conv_impl("winograd2")
        got = mod.apply(params, x)
    finally:
        set_conv_impl("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int8_im2col_close_to_direct():
    from ealdm_tpu.ops.im2col_int8 import int8_eligible, int8_im2col_conv

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) / np.sqrt(9 * 128), jnp.float32)
    ref = np.asarray(_direct(x, w))
    got = np.asarray(int8_im2col_conv(x, w))
    scale = np.abs(ref).mean()
    # int8 W8A8: ~1% relative error envelope
    assert np.abs(got - ref).mean() / scale < 3e-2
    # HWNC path matches NHWC
    got_h = np.asarray(int8_im2col_conv(
        jnp.transpose(x, (1, 2, 0, 3)), w, data_format="HWNC"))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(jnp.asarray(got_h), (2, 0, 1, 3))), got,
        rtol=1e-5, atol=1e-6)
    assert not int8_eligible((1, 8, 8, 32), (3, 3, 32, 32), (1, 1), "SAME",
                             "NHWC")
    # dispatch integration
    from ealdm_tpu.ops.winograd import conv2d, set_conv_impl
    try:
        set_conv_impl("int8")
        got_d = np.asarray(conv2d(x, w))
    finally:
        set_conv_impl("xla")
    np.testing.assert_allclose(got_d, got, rtol=1e-5, atol=1e-6)
