"""Native C++ loader: build, probe, single + batch loads vs Python oracle."""
import os

import numpy as np
import pytest

from ealdm_tpu.data import native_loader


@pytest.fixture(scope="module")
def npy_images(tmp_path_factory, n=4, size=24):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        p = str(d / f"im{i}.npy")
        np.save(p, arr)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_loader.native_available(), "g++ build of libealdm_loader.so failed"


def test_probe(npy_images):
    import ctypes

    lib = native_loader.get_lib()
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.ealdm_probe_npy(npy_images[0].encode(), h, w, c)
    assert rc == 0 and (h.value, w.value, c.value) == (24, 24, 3)


def test_load_matches_python_at_native_size(npy_images):
    # identity-size load: native == exact (u8/255*2-1), no resampling involved
    out = native_loader.load_image(npy_images[0], 24)
    assert out is not None and out.shape == (24, 24, 3)
    ref = np.load(npy_images[0]).astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_load_resized_close_to_python(npy_images):
    out = native_loader.load_image(npy_images[0], 12)
    assert out is not None and out.shape == (12, 12, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_batch_load(npy_images):
    out = native_loader.load_batch(npy_images, 16, threads=2)
    assert out is not None and out.shape == (4, 16, 16, 3)
    single = native_loader.load_image(npy_images[2], 16)
    np.testing.assert_allclose(out[2], single)


def test_missing_file_fails_cleanly(tmp_path):
    out = native_loader.load_image(str(tmp_path / "nope.npy"), 8)
    assert out is None


def test_float32_npy(tmp_path):
    arr = np.random.RandomState(1).rand(10, 10, 3).astype(np.float32)
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    out = native_loader.load_image(p, 10)
    np.testing.assert_allclose(out, arr * 2 - 1, atol=1e-6)


def test_grayscale_npy(tmp_path):
    arr = (np.random.RandomState(2).rand(8, 8) * 255).astype(np.uint8)
    p = str(tmp_path / "g.npy")
    np.save(p, arr)
    out = native_loader.load_image(p, 8)
    assert out.shape == (8, 8, 3)
    # all three channels identical
    np.testing.assert_allclose(out[..., 0], out[..., 1])
