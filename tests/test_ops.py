"""Op-layer parity tests against torch oracles (torch built-ins only)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ealdm_tpu.ops import (
    bias_act_ref,
    downsample2d,
    filter2d,
    filtered_lrelu,
    group_norm,
    instance_norm_2d,
    layer_norm,
    sdpa,
    setup_filter,
    timestep_embedding,
    fairseq_timestep_embedding,
    upfirdn2d,
    upsample2d,
)


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


# ---------------------------------------------------------------- bias_act
@pytest.mark.parametrize(
    "act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu", "softplus", "swish"]
)
def test_bias_act_matches_torch(act, rng):
    x = rng.randn(4, 64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    y = np.asarray(bias_act_ref(jnp.asarray(x), jnp.asarray(b), act=act))

    tx = torch.from_numpy(x) + torch.from_numpy(b)
    tfuncs = {
        "linear": lambda t: t,
        "relu": torch.relu,
        "lrelu": lambda t: F.leaky_relu(t, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "elu": F.elu,
        "selu": F.selu,
        "softplus": F.softplus,
        "swish": lambda t: t * torch.sigmoid(t),
    }
    gains = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}
    expected = (tfuncs[act](tx) * gains.get(act, 1.0)).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


def test_bias_act_clamp_and_gain():
    x = jnp.array([[-3.0, 0.5, 3.0]])
    y = bias_act_ref(x, None, act="linear", gain=2.0, clamp=4.0)
    np.testing.assert_allclose(np.asarray(y), [[-4.0, 1.0, 4.0]])


def test_bias_act_grad_2nd_order():
    from ealdm_tpu.ops import bias_act

    x = jnp.linspace(-2, 2, 8).reshape(2, 4)
    b = jnp.arange(4.0) * 0.1

    def f(x, b):
        return jnp.sum(bias_act(x, b, act="swish") ** 2)

    g = jax.grad(f)(x, b)
    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x, b) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(gg)).all()


# ---------------------------------------------------------------- upfirdn2d
def torch_upfirdn2d_ref(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Oracle reimplementation of the zero-insert/pad/FIR/decimate pipeline
    using torch built-ins (matching the documented semantics)."""
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    elif len(padding) == 2:
        padding = (padding[0], padding[0], padding[1], padding[1])
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = padding
    if f is None:
        f = torch.ones(1, 1, dtype=torch.float32)
    b, c, ih, iw = x.shape
    # zero-insert upsample
    z = x.reshape(b, c, ih, 1, iw, 1)
    z = F.pad(z, [0, upx - 1, 0, 0, 0, upy - 1])
    z = z.reshape(b, c, ih * upy, iw * upx)
    # pad / crop
    z = F.pad(z, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    z = z[
        :,
        :,
        max(-pady0, 0) : z.shape[2] - max(-pady1, 0),
        max(-padx0, 0) : z.shape[3] - max(-padx1, 0),
    ]
    ff = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        ff = ff.flip(list(range(ff.ndim)))
    if ff.ndim == 1:
        # separable: f scaled by gain^(1/2), applied once per axis => gain total
        k1 = ff[None, None, None, :].repeat(c, 1, 1, 1)
        z = F.conv2d(z, k1, groups=c)
        k2 = ff[None, None, :, None].repeat(c, 1, 1, 1)
        z = F.conv2d(z, k2, groups=c)
    else:
        k = ff[None, None].repeat(c, 1, 1, 1)
        z = F.conv2d(z, k, groups=c)
    return z[:, :, ::downy, ::downx]


@pytest.mark.parametrize(
    "up,down,pad,sep",
    [
        (1, 1, 0, False),
        (2, 1, 1, False),
        (1, 2, 1, False),
        (2, 2, (1, 2, 0, 1), False),
        (2, 1, 2, True),
        (1, 2, 2, True),
        (1, 1, (-1, -1, -1, -1), False),
    ],
)
def test_upfirdn2d_vs_torch(up, down, pad, sep, rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    if sep:
        f_np = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
        f_t = torch.from_numpy(f_np)
    else:
        f_np = np.array([[1.0, 2.0], [2.0, 4.0]], dtype=np.float32)
        f_t = torch.from_numpy(f_np)
    y = upfirdn2d(jnp.asarray(x), jnp.asarray(f_np), up=up, down=down, padding=pad, gain=1.5)
    expected = torch_upfirdn2d_ref(
        torch.from_numpy(nchw(x)), f_t, up=up, down=down, padding=pad, gain=1.5
    ).numpy()
    np.testing.assert_allclose(nchw(y), expected, rtol=1e-4, atol=1e-5)


def test_filter2d_preserves_shape(rng):
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = filter2d(jnp.asarray(x), f)
    assert y.shape == x.shape


def test_upsample_downsample_roundtrip_dc(rng):
    x = jnp.ones((1, 8, 8, 2), jnp.float32) * 5.0
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f, up=2)
    assert up.shape == (1, 16, 16, 2)
    # DC gain preserved away from borders
    np.testing.assert_allclose(np.asarray(up)[0, 4:12, 4:12, 0], 5.0, rtol=1e-5)
    down = downsample2d(up, f, down=2)
    assert down.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(down)[0, 2:6, 2:6, 0], 5.0, rtol=1e-5)


def test_filtered_lrelu_shape_and_values(rng):
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    fu = setup_filter([1, 3, 3, 1], gain=1)
    y = filtered_lrelu(jnp.asarray(x), fu, fu, jnp.asarray(b), up=2, down=2, padding=3)
    assert y.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(y)).all()


# ---------------------------------------------------------------- norms
def test_group_norm_vs_torch(rng):
    x = rng.randn(2, 4, 4, 32).astype(np.float32)
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)
    y = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), num_groups=8, eps=1e-6)
    gn = torch.nn.GroupNorm(8, 32, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
    expected = gn(torch.from_numpy(nchw(x))).detach().numpy()
    np.testing.assert_allclose(nchw(y), expected, rtol=1e-4, atol=1e-5)


def test_instance_norm_vs_torch(rng):
    x = rng.randn(2, 6, 5, 3).astype(np.float32)
    y = instance_norm_2d(jnp.asarray(x))
    expected = F.instance_norm(torch.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(nchw(y), expected, rtol=1e-4, atol=1e-5)


def test_layer_norm_vs_torch(rng):
    x = rng.randn(2, 7, 16).astype(np.float32)
    s = rng.randn(16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    y = layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b))
    expected = F.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(s), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- attention
def test_sdpa_vs_torch(rng):
    q = rng.randn(2, 4, 16, 8).astype(np.float32)
    k = rng.randn(2, 4, 16, 8).astype(np.float32)
    v = rng.randn(2, 4, 16, 8).astype(np.float32)
    y = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    expected = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- embeddings
def test_timestep_embedding_structure():
    t = jnp.array([0, 10, 999])
    emb = timestep_embedding(t, 128)
    assert emb.shape == (3, 128)
    # t=0: cos half all ones, sin half all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :64]), 1.0)
    np.testing.assert_allclose(np.asarray(emb[0, 64:]), 0.0)


def test_fairseq_embedding_structure():
    t = jnp.array([0, 5])
    emb = fairseq_timestep_embedding(t, 64)
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 0.0)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), 1.0)
