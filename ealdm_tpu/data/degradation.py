"""BSRGAN-style image degradation for super-resolution training data.

Parity target: `/root/reference/ldm/modules/image_degradation/` (bsrgan.py /
bsrgan_light.py, ~2.3k LoC built on cv2/scipy): randomly-ordered chains of
(an)isotropic Gaussian blur, multi-mode downsampling, Gaussian/Poisson/
speckle noise, JPEG compression, and final sf-resize. Re-implemented on
numpy/PIL/scipy (no cv2 in this image) with the same degradation classes
and shuffle-order convention; exports `degradation_fn_bsr` and
`degradation_fn_bsr_light` like the reference `image_degradation/__init__`.
"""
from __future__ import annotations

import io
from typing import Optional

import numpy as np


def _gaussian_kernel2d(ksize: int, sigma_x: float, sigma_y: float, theta: float) -> np.ndarray:
    """Rotated anisotropic Gaussian kernel [ksize, ksize], unit sum."""
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    c, s = np.cos(theta), np.sin(theta)
    xr = c * xx + s * yy
    yr = -s * xx + c * yy
    k = np.exp(-0.5 * ((xr / max(sigma_x, 1e-6)) ** 2 + (yr / max(sigma_y, 1e-6)) ** 2))
    return k / k.sum()


def _filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    out = np.empty_like(img)
    for ch in range(img.shape[2]):
        out[..., ch] = ndimage.convolve(img[..., ch], kernel, mode="mirror")
    return out


def add_blur(img, rng, sf=4, light=False):
    wd = 2.0 + 0.2 * sf if not light else 1.0 + 0.2 * sf
    ksize = 2 * rng.randint(2, 6) + 3
    if rng.rand() < 0.5:
        sx, sy = wd * rng.rand(), wd * rng.rand()
        theta = rng.rand() * np.pi
    else:
        sx = sy = wd * rng.rand()
        theta = 0.0
    return _filter2d(img, _gaussian_kernel2d(ksize, max(sx, 0.1), max(sy, 0.1), theta))


def add_resize(img, rng, sf=4):
    from PIL import Image

    modes = [Image.NEAREST, Image.BILINEAR, Image.BICUBIC]
    mode = modes[rng.randint(len(modes))]
    scale = rng.uniform(0.5 / sf, 1.0) if rng.rand() < 0.75 else 1.0
    h, w = img.shape[:2]
    nh, nw = max(int(h * scale), 8), max(int(w * scale), 8)
    im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    im = im.resize((nw, nh), mode).resize((w, h), Image.BICUBIC)
    return np.asarray(im).astype(np.float32) / 255.0


def add_gaussian_noise(img, rng, noise_level1=2, noise_level2=25):
    level = rng.randint(noise_level1, noise_level2) / 255.0
    mode = rng.rand()
    if mode < 0.6:  # per-channel iid
        img = img + rng.randn(*img.shape) * level
    elif mode < 0.8:  # gray noise
        img = img + rng.randn(*img.shape[:2], 1) * level
    else:  # correlated channel noise
        L = level * np.abs(rng.randn(3, 3)) / 3.0
        cov = L @ L.T + np.eye(3) * (level / 10) ** 2
        noise = rng.multivariate_normal(np.zeros(3), cov, img.shape[:2])
        img = img + noise
    return np.clip(img, 0.0, 1.0)


def add_poisson_noise(img, rng):
    vals = 10 ** (2 + rng.rand() * 2)
    img = np.clip(img, 0, 1)
    return np.clip(rng.poisson(img * vals) / vals, 0.0, 1.0)


def add_speckle_noise(img, rng, noise_level1=2, noise_level2=25):
    level = rng.randint(noise_level1, noise_level2) / 255.0
    img = np.clip(img, 0, 1)
    return np.clip(img + img * rng.randn(*img.shape) * level, 0.0, 1.0)


def add_jpeg_noise(img, rng, quality_range=(30, 95)):
    from PIL import Image

    q = int(rng.uniform(*quality_range))
    buf = io.BytesIO()
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        buf, format="JPEG", quality=q
    )
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB")).astype(np.float32) / 255.0


def _final_resize(img, sf):
    from PIL import Image

    h, w = img.shape[:2]
    im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    im = im.resize((w // sf, h // sf), Image.BICUBIC)
    return np.asarray(im).astype(np.float32) / 255.0


def degradation_bsrgan(
    img: np.ndarray, sf: int = 4, rng: Optional[np.random.RandomState] = None,
    light: bool = False,
):
    """img: float32 [H, W, 3] in [0, 1] -> (LR [H/sf, W/sf, 3], HR)."""
    rng = rng or np.random.RandomState(0)
    hr = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    x = hr.copy()

    stages = list(range(5))
    rng.shuffle(stages)
    for s in stages:
        if s == 0 and rng.rand() < 0.8:
            x = add_blur(x, rng, sf=sf, light=light)
        elif s == 1 and rng.rand() < 0.6:
            x = add_resize(x, rng, sf=sf)
        elif s == 2:
            r = rng.rand()
            if r < 0.5:
                x = add_gaussian_noise(
                    x, rng, noise_level2=8 if light else 25
                )
            elif r < 0.75:
                x = add_poisson_noise(x, rng)
            else:
                x = add_speckle_noise(x, rng)
        elif s == 3 and rng.rand() < 0.5 and not light:
            x = add_blur(x, rng, sf=sf, light=light)
        elif s == 4 and rng.rand() < 0.9:
            x = add_jpeg_noise(x, rng, (40, 95) if light else (30, 95))
    lr = _final_resize(x, sf)
    return lr, hr


def degradation_fn_bsr(img, sf=4, rng=None):
    return degradation_bsrgan(img, sf=sf, rng=rng, light=False)


def degradation_fn_bsr_light(img, sf=4, rng=None):
    return degradation_bsrgan(img, sf=sf, rng=rng, light=True)
