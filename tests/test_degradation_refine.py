"""BSRGAN degradation chain + third-stage refinement components."""
import numpy as np
import pytest

from ealdm_tpu.data.degradation import (
    add_blur,
    add_gaussian_noise,
    add_jpeg_noise,
    add_poisson_noise,
    degradation_fn_bsr,
    degradation_fn_bsr_light,
)


def test_degradation_shapes_and_range(rng):
    img = rng.rand(64, 64, 3).astype(np.float32)
    for fn in (degradation_fn_bsr, degradation_fn_bsr_light):
        lr, hr = fn(img, sf=4, rng=np.random.RandomState(3))
        assert lr.shape == (16, 16, 3)
        assert hr.shape == (64, 64, 3)
        assert 0.0 <= lr.min() and lr.max() <= 1.0


def test_degradation_deterministic_per_seed(rng):
    img = rng.rand(32, 32, 3).astype(np.float32)
    a, _ = degradation_fn_bsr(img, sf=2, rng=np.random.RandomState(5))
    b, _ = degradation_fn_bsr(img, sf=2, rng=np.random.RandomState(5))
    np.testing.assert_allclose(a, b)


def test_individual_degradations(rng):
    img = rng.rand(32, 32, 3).astype(np.float32)
    r = np.random.RandomState(0)
    assert add_blur(img, r).shape == img.shape
    assert add_gaussian_noise(img, r).shape == img.shape
    assert add_poisson_noise(img, r).shape == img.shape
    out = add_jpeg_noise(img, r)
    assert out.shape == img.shape and out.dtype == np.float32


def test_sr_dataset_bsrgan_mode(tmp_path, rng):
    from ealdm_tpu.data import ImageSRDataset

    d = tmp_path / "imgs"
    d.mkdir()
    np.save(d / "a.npy", (rng.rand(64, 64, 3) * 255).astype(np.uint8))
    ds = ImageSRDataset(str(d), size=64, downscale_f=4, degradation="bsrgan_light")
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["LR_image"].shape == (16, 16, 3)
    assert -1.0 <= item["LR_image"].min() and item["LR_image"].max() <= 1.0


def test_refinement_module_zero_init(rng):
    import jax.numpy as jnp

    from ealdm_tpu.third_stage import Refinement

    ref = Refinement(channels=4)
    z = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    out = ref(z)
    # zero-init delta: identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), atol=1e-6)
