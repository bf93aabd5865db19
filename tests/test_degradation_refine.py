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


# ---------------------------------------------------------- widened pipeline
def test_kernel_menu_shapes_and_mass():
    from ealdm_tpu.data.degradation import (
        anisotropic_gaussian_kernel, gen_kernel, generalized_gaussian_kernel,
        plateau_kernel, shifted_gaussian_kernel,
    )

    rng = np.random.RandomState(0)
    ks = [
        anisotropic_gaussian_kernel(9, 1.5, 0.5, 0.7),
        generalized_gaussian_kernel(9, 1.5, 0.5, 0.7, beta=0.8),
        plateau_kernel(9, 1.5, 0.5, 0.7, beta=1.5),
        gen_kernel(rng, 15, sf=4),
        shifted_gaussian_kernel(25, 1.2, sf=4),
    ]
    for k in ks:
        assert k.ndim == 2 and np.isclose(k.sum(), 1.0) and (k >= 0).all()
    # the three profiles are genuinely different shapes
    g = anisotropic_gaussian_kernel(9, 1.5, 1.5, 0.0)
    gg = generalized_gaussian_kernel(9, 1.5, 1.5, 0.0, beta=0.8)
    p = plateau_kernel(9, 1.5, 1.5, 0.0, beta=2.0)
    assert not np.allclose(g, gg, atol=1e-3)
    assert not np.allclose(g, p, atol=1e-3)


def test_shifted_kernel_center_offset():
    from ealdm_tpu.data.degradation import shifted_gaussian_kernel

    k = shifted_gaussian_kernel(25, 1.0, sf=4)
    cy, cx = np.unravel_index(np.argmax(k), k.shape)
    # center moved by ~0.5*(sf-1) toward the origin-sampled grid
    assert (cy, cx) != (12, 12)


def test_pipeline_output_grid_and_pairing():
    from ealdm_tpu.data.degradation import degradation_fn_bsr

    rng = np.random.RandomState(3)
    img = rng.rand(96, 96, 3).astype(np.float32)
    lr, hr = degradation_fn_bsr(img, sf=4, rng=np.random.RandomState(0))
    assert lr.shape == (24, 24, 3) and hr.shape == (96, 96, 3)
    # paired random crop mode
    lr2, hr2 = degradation_fn_bsr(
        img, sf=4, rng=np.random.RandomState(0), lq_patchsize=16
    )
    assert lr2.shape == (16, 16, 3) and hr2.shape == (64, 64, 3)


def test_pipeline_deterministic_and_variant_divergence():
    from ealdm_tpu.data.degradation import degradation_fn_bsr, degradation_fn_bsr_light

    img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    a1, _ = degradation_fn_bsr(img, sf=4, rng=np.random.RandomState(7))
    a2, _ = degradation_fn_bsr(img, sf=4, rng=np.random.RandomState(7))
    np.testing.assert_array_equal(a1, a2)
    b, _ = degradation_fn_bsr_light(img, sf=4, rng=np.random.RandomState(7))
    assert not np.array_equal(a1, b)
    # light degrades less on average (narrower kernels, lower noise)
    heavy_err = np.abs(a1 - img[::4, ::4]).mean()
    light_err = np.abs(b - img[::4, ::4]).mean()
    assert np.isfinite(heavy_err) and np.isfinite(light_err)
