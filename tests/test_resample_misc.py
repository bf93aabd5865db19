"""conv2d_resample/grid_sample vs torch oracles, misc helpers, CLIP encoders."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ealdm_tpu.ops import conv2d_resample, grid_sample, setup_filter
from ealdm_tpu.misc import InfiniteSampler, assert_shape


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_conv2d_resample_plain_matches_torch(rng):
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)  # HWIO
    y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), padding=1)
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    expected = F.conv2d(torch.from_numpy(nchw(x)), tw, padding=1).numpy()
    np.testing.assert_allclose(nchw(y), expected, rtol=1e-4, atol=1e-4)


def test_conv2d_resample_downsample_shapes(rng):
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, down=2, padding=1)
    assert y.shape == (1, 8, 8, 8)
    y2 = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, up=2, padding=1)
    assert y2.shape == (1, 32, 32, 8)


def test_grid_sample_matches_torch(rng):
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    gy, gx = np.meshgrid(
        np.linspace(-0.8, 0.8, 6), np.linspace(-0.9, 0.9, 5), indexing="ij"
    )
    grid = np.stack([gx, gy], axis=-1)[None].repeat(2, 0).astype(np.float32)
    y = grid_sample(jnp.asarray(x), jnp.asarray(grid))
    expected = F.grid_sample(
        torch.from_numpy(nchw(x)), torch.from_numpy(grid),
        mode="bilinear", align_corners=False, padding_mode="zeros",
    ).numpy()
    np.testing.assert_allclose(nchw(y), expected, rtol=1e-4, atol=1e-4)


def test_grid_sample_second_order_grads(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 1).astype(np.float32))
    grid = jnp.zeros((1, 2, 2, 2))

    def f(g):
        return jnp.sum(grid_sample(x, g) ** 2)

    gg = jax.grad(lambda g: jnp.sum(jax.grad(f)(g) ** 2))(grid)
    assert np.isfinite(np.asarray(gg)).all()


def test_assert_shape():
    assert_shape(np.zeros((2, 3, 4)), (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), (2, 4))
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), (2, 3, 1))


def test_infinite_sampler_rank_sharding():
    it0 = iter(InfiniteSampler(10, rank=0, num_replicas=2, seed=1))
    it1 = iter(InfiniteSampler(10, rank=1, num_replicas=2, seed=1))
    a = [next(it0) for _ in range(10)]
    b = [next(it1) for _ in range(10)]
    assert all(0 <= i < 10 for i in a + b)
    # deterministic given the seed
    it0b = iter(InfiniteSampler(10, rank=0, num_replicas=2, seed=1))
    assert [next(it0b) for _ in range(10)] == a


def test_clip_style_encoders(rng):
    from ealdm_tpu.models.encoders import FrozenCLIPTextEmbedder, FrozenClipImageEmbedder

    te = FrozenCLIPTextEmbedder(n_embed=32, n_layer=1, vocab_size=512,
                                max_seq_len=8, n_repeat=2)
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = te.init(jax.random.PRNGKey(0), tokens)
    z = te.apply(params, tokens)
    assert z.shape == (2, 2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z[:, 0]), axis=-1), 1.0,
                               rtol=1e-4)

    ie = FrozenClipImageEmbedder(out_dim=16, image_size=32)
    x = jnp.asarray(rng.rand(1, 24, 24, 3).astype(np.float32)) * 2 - 1
    params = ie.init(jax.random.PRNGKey(0), x)
    z = ie.apply(params, x)
    assert z.shape == (1, 16)


def test_stdiff_convblock(rng):
    from ealdm_tpu.models.stdiff import ConvBlock

    m = ConvBlock(out_ch=8)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 8)
