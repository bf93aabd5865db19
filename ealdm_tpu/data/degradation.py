"""BSRGAN-style image degradation for super-resolution training data.

Parity target: `/root/reference/ldm/modules/image_degradation/` (bsrgan.py /
bsrgan_light.py, ~2.3k LoC built on cv2/scipy). Re-implemented on
numpy/PIL/scipy (no cv2 in this image) with the reference pipeline
structure:

  * 7-stage shuffled order with the downsample2-before-downsample3
    constraint (`bsrgan.py:472-476`), double blur in the heavy variant,
  * scale2 pre-downsample for sf=4 with prob 0.25 (`bsrgan.py:464-470`),
  * downsample2 = random-factor resize OR shifted-Gaussian-kernel + nearest
    subsample (`bsrgan.py:487-499`), downsample3 back to the pre-stage-2
    dims over 1/sf (`bsrgan.py:501-504`),
  * probabilistic mid-pipeline JPEG (0.9) plus the MANDATORY final JPEG —
    the double-JPEG signature (`bsrgan.py:511-522`),
  * kernel menu: isotropic/anisotropic Gaussian (`anisotropic_Gaussian`,
    `fspecial`), noisy random anisotropic (`gen_kernel`), plus generalized-
    Gaussian and plateau profiles (Real-ESRGAN menu backing the light
    variant's family),
  * paired random crop to (lq_patchsize, sf*lq_patchsize)
    (`bsrgan.py:427-436`).

Exports `degradation_fn_bsr` / `degradation_fn_bsr_light` like the
reference `image_degradation/__init__`.
"""
from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np


# ------------------------------------------------------------------ kernels
def _mesh(ksize: int):
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    return np.meshgrid(ax, ax)


def _rotated_quad(ksize: int, sigma_x: float, sigma_y: float, theta: float):
    """(r^T Sigma^-1 r) field for a rotated anisotropic profile."""
    xx, yy = _mesh(ksize)
    c, s = np.cos(theta), np.sin(theta)
    xr = c * xx + s * yy
    yr = -s * xx + c * yy
    return (xr / max(sigma_x, 1e-6)) ** 2 + (yr / max(sigma_y, 1e-6)) ** 2


def anisotropic_gaussian_kernel(
    ksize: int, sigma_x: float, sigma_y: float, theta: float
) -> np.ndarray:
    """Rotated anisotropic Gaussian (`bsrgan.py anisotropic_Gaussian:65`)."""
    k = np.exp(-0.5 * _rotated_quad(ksize, sigma_x, sigma_y, theta))
    return k / k.sum()


def generalized_gaussian_kernel(
    ksize: int, sigma_x: float, sigma_y: float, theta: float, beta: float
) -> np.ndarray:
    """exp(-0.5 * q^beta): beta<1 heavy-tailed, beta>1 boxier than Gaussian."""
    q = _rotated_quad(ksize, sigma_x, sigma_y, theta)
    k = np.exp(-0.5 * np.power(q, beta))
    return k / k.sum()


def plateau_kernel(
    ksize: int, sigma_x: float, sigma_y: float, theta: float, beta: float
) -> np.ndarray:
    """1 / (1 + q^beta): flat-topped profile."""
    q = _rotated_quad(ksize, sigma_x, sigma_y, theta)
    k = 1.0 / (1.0 + np.power(q, beta))
    return k / k.sum()


def gen_kernel(
    rng, k_size: int = 15, sf: int = 4, min_var: float = 0.6,
    max_var: float = 10.0, noise_level: float = 0.25,
) -> np.ndarray:
    """Noisy random anisotropic kernel with the sf-dependent center shift
    (`bsrgan.py gen_kernel:145-184`): random covariance -> Gaussian field ->
    multiplicative noise -> shift so nearest-subsampling aligns pixels."""
    lambda_1 = min_var + rng.rand() * (max_var - min_var)
    lambda_2 = min_var + rng.rand() * (max_var - min_var)
    theta = rng.rand() * np.pi
    c, s = np.cos(theta), np.sin(theta)
    Q = np.array([[c, -s], [s, c]])
    sigma = Q @ np.diag([lambda_1, lambda_2]) @ Q.T
    inv_sigma = np.linalg.inv(sigma)
    # the reference centers at (k//2) - 0.5*(sf - k%2) (shift for subsampling)
    mu = (k_size - 1) / 2.0 - 0.5 * (sf - (k_size % 2))
    xx, yy = np.meshgrid(np.arange(k_size), np.arange(k_size))
    zz = np.stack([xx - mu, yy - mu], -1)[..., None]
    zzt = np.swapaxes(zz, -1, -2)
    k = np.exp(-0.5 * np.squeeze(zzt @ inv_sigma @ zz))
    k = k * (1.0 + noise_level * (rng.rand(k_size, k_size) * 2 - 1))
    k = np.clip(k, 0, None)
    return k / k.sum()


def shifted_gaussian_kernel(ksize: int, sigma: float, sf: int) -> np.ndarray:
    """fspecial('gaussian') + shift_pixel(sf) (`bsrgan.py:494-496`): an
    isotropic Gaussian whose center is offset by 0.5*(sf-1) so that
    `k * x` followed by x[0::sf] samples pixel centers."""
    shift = 0.5 * (sf - 1)
    ax = np.arange(ksize) - (ksize - 1) / 2.0 - shift
    xx, yy = np.meshgrid(ax, ax)
    k = np.exp(-(xx**2 + yy**2) / (2 * max(sigma, 1e-6) ** 2))
    return k / k.sum()


def random_kernel(rng, sf: int = 4, light: bool = False) -> np.ndarray:
    """Kernel menu. Heavy variant mirrors `bsrgan.add_blur:325-338`
    (aniso/iso Gaussians) plus the gen_kernel/generalized/plateau families;
    light variant uses the same menu at 1/4 width (`bsrgan_light`)."""
    wd2 = (4.0 + sf) / (4.0 if light else 1.0)
    wd = (2.0 + 0.2 * sf) / (4.0 if light else 1.0)
    r = rng.rand()
    if r < 0.4:  # anisotropic Gaussian
        ksize = 2 * rng.randint(1, 6) + 3
        return anisotropic_gaussian_kernel(
            ksize, max(wd2 * rng.rand(), 0.1), max(wd2 * rng.rand(), 0.1),
            rng.rand() * np.pi,
        )
    if r < 0.7:  # isotropic Gaussian
        ksize = 2 * rng.randint(1, 3) + 3
        sig = max(wd * rng.rand(), 0.1)
        return anisotropic_gaussian_kernel(ksize, sig, sig, 0.0)
    if r < 0.8:  # noisy random anisotropic
        return gen_kernel(rng, k_size=15, sf=sf)
    if r < 0.9:  # generalized Gaussian
        ksize = 2 * rng.randint(1, 6) + 3
        return generalized_gaussian_kernel(
            ksize, max(wd2 * rng.rand(), 0.1), max(wd2 * rng.rand(), 0.1),
            rng.rand() * np.pi, 0.5 + rng.rand() * 3.5,
        )
    # plateau
    ksize = 2 * rng.randint(1, 6) + 3
    return plateau_kernel(
        ksize, max(wd2 * rng.rand(), 0.1), max(wd2 * rng.rand(), 0.1),
        rng.rand() * np.pi, 1.0 + rng.rand() * 2.0,
    )


def _filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    out = np.empty_like(img)
    for ch in range(img.shape[2]):
        out[..., ch] = ndimage.convolve(img[..., ch], kernel, mode="mirror")
    return out


def add_blur(img, rng, sf=4, light=False):
    return _filter2d(img, random_kernel(rng, sf=sf, light=light))


# ------------------------------------------------------------------ resizing
def _resize(img, nh, nw, rng=None, mode=None):
    from PIL import Image

    if mode is None:
        modes = [Image.NEAREST, Image.BILINEAR, Image.BICUBIC]
        mode = modes[rng.randint(len(modes))]
    im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    im = im.resize((max(nw, 1), max(nh, 1)), mode)
    return np.asarray(im).astype(np.float32) / 255.0


def add_resize(img, rng, sf=4):
    """Random up/down/identity rescale (`bsrgan.add_resize:339-352`)."""
    r = rng.rand()
    if r > 0.8:
        sf1 = rng.uniform(1, 2)
    elif r < 0.7:
        sf1 = rng.uniform(0.5 / sf, 1)
    else:
        return img
    h, w = img.shape[:2]
    return np.clip(_resize(img, int(sf1 * h), int(sf1 * w), rng), 0.0, 1.0)


# ------------------------------------------------------------------- noises
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


def random_crop(
    lq: np.ndarray, hq: np.ndarray, sf: int, lq_patchsize: int, rng
) -> Tuple[np.ndarray, np.ndarray]:
    """Paired crop (`bsrgan.random_crop:427-436`)."""
    h, w = lq.shape[:2]
    rnd_h = rng.randint(0, max(h - lq_patchsize, 0) + 1)
    rnd_w = rng.randint(0, max(w - lq_patchsize, 0) + 1)
    lq = lq[rnd_h : rnd_h + lq_patchsize, rnd_w : rnd_w + lq_patchsize]
    rh, rw = rnd_h * sf, rnd_w * sf
    hq = hq[rh : rh + lq_patchsize * sf, rw : rw + lq_patchsize * sf]
    return lq, hq


# ----------------------------------------------------------------- pipeline
def degradation_bsrgan(
    img: np.ndarray,
    sf: int = 4,
    rng: Optional[np.random.RandomState] = None,
    light: bool = False,
    lq_patchsize: Optional[int] = None,
):
    """img: float32 [H, W, 3] in [0, 1] -> (LR ~[H/sf, W/sf, 3], HR).

    Mirrors the reference stage semantics (`bsrgan.py:438-527` /
    `bsrgan_light.py degradation_bsrgan_variant`): mod-crop, optional sf=4
    pre-halving, 7-stage shuffle with downsample2 kept before downsample3,
    double JPEG, optional paired crop. The light variant drops the second
    blur and uses noise_level2=8 / narrower kernels, as upstream."""
    rng = rng or np.random.RandomState(0)
    jpeg_prob, scale2_prob = 0.9, 0.25
    sf_ori = sf

    x = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    h1, w1 = x.shape[:2]
    x = x[: h1 - h1 % sf, : w1 - w1 % sf]
    hq = x.copy()

    if sf == 4 and rng.rand() < scale2_prob:  # downsample1
        h, w = x.shape[:2]
        x = np.clip(_resize(x, h // 2, w // 2, rng), 0.0, 1.0)
        sf = 2

    order = list(rng.permutation(7))
    i2, i3 = order.index(2), order.index(3)
    if i2 > i3:  # keep downsample3 after downsample2
        order[i2], order[i3] = order[i3], order[i2]

    a, b = x.shape[1], x.shape[0]  # pre-downsample2 dims fallback
    for i in order:
        if i == 0:
            x = add_blur(x, rng, sf=sf, light=light)
        elif i == 1:
            if not light:  # the light variant drops the second blur
                x = add_blur(x, rng, sf=sf, light=light)
        elif i == 2:
            a, b = x.shape[1], x.shape[0]
            if rng.rand() < (0.8 if light else 0.75):
                sf1 = rng.uniform(1, 2 * sf)
                x = _resize(x, int(x.shape[0] / sf1), int(x.shape[1] / sf1), rng)
            else:
                k = shifted_gaussian_kernel(25, rng.uniform(0.1, 0.6 * sf), sf)
                x = _filter2d(x, k)[0::sf, 0::sf]
            x = np.clip(x, 0.0, 1.0)
        elif i == 3:
            x = np.clip(_resize(x, int(b / sf), int(a / sf), rng), 0.0, 1.0)
        elif i == 4:
            x = add_gaussian_noise(
                x, rng,
                noise_level1=1 if light else 2,
                noise_level2=8 if light else 25,
            )
        elif i == 5:
            if rng.rand() < jpeg_prob:
                x = add_jpeg_noise(x, rng, (40, 95) if light else (30, 95))
        elif i == 6:
            pass  # camera ISP hook: no isp_model in this environment

    # mandatory final JPEG (the reference's double-JPEG signature)
    x = add_jpeg_noise(x, rng, (40, 95) if light else (30, 95))

    # normalize to the exact target grid (interp choices above can drift 1px)
    th, tw = hq.shape[0] // sf_ori, hq.shape[1] // sf_ori
    if x.shape[:2] != (th, tw):
        x = _resize(x, th, tw, rng)

    if lq_patchsize is not None:
        x, hq = random_crop(x, hq, sf_ori, lq_patchsize, rng)
    return x, hq


def degradation_fn_bsr(img, sf=4, rng=None, lq_patchsize=None):
    return degradation_bsrgan(img, sf=sf, rng=rng, light=False,
                              lq_patchsize=lq_patchsize)


def degradation_fn_bsr_light(img, sf=4, rng=None, lq_patchsize=None):
    return degradation_bsrgan(img, sf=sf, rng=rng, light=True,
                              lq_patchsize=lq_patchsize)


# --------------------------------------------------- matlab-bicubic imresize
def cubic(x):
    """MATLAB's bicubic interpolation kernel (a = -0.5, support 2);
    `utils_image.cubic` parity target."""
    ax = np.abs(np.asarray(x, np.float64))
    ax2, ax3 = ax * ax, ax * ax * ax
    inner = 1.5 * ax3 - 2.5 * ax2 + 1.0
    outer = -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _resize_weights(in_len: int, scale: float, antialiasing: bool):
    """Dense [out_len, in_len] row-stochastic weight matrix for one axis of
    MATLAB `imresize` (symmetric boundary, antialiased cubic on downscale)."""
    out_len = int(np.ceil(in_len * scale))
    # MATLAB source-space coordinate of each (1-based) output sample.
    u = (np.arange(1, out_len + 1, dtype=np.float64)) / scale + 0.5 * (
        1.0 - 1.0 / scale
    )
    kernel_width = 4.0
    if scale < 1.0 and antialiasing:
        kernel_width /= scale
    p = int(np.ceil(kernel_width)) + 2
    left = np.floor(u - kernel_width / 2.0)
    # 1-based candidate source indices [out_len, p] and cubic weights.
    idx = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - idx
    if scale < 1.0 and antialiasing:
        w = scale * cubic(scale * dist)
    else:
        w = cubic(dist)
    w = w / w.sum(axis=1, keepdims=True)
    # symmetric boundary (edge-inclusive mirror) with MULTI-reflection:
    # period-2n fold handles kernels wider than the image (extreme
    # downscales of small inputs), where a single reflection would leave
    # indices out of range.
    j = idx.astype(np.int64) - 1
    period = 2 * in_len
    j = np.mod(j, period)
    j = np.where(j >= in_len, period - 1 - j, j)
    mat = np.zeros((out_len, in_len), np.float64)
    np.add.at(mat, (np.arange(out_len)[:, None] * np.ones_like(j), j), w)
    return mat


def imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True):
    """MATLAB-semantics bicubic resize of an HWC/HW [0,1] numpy image
    (`utils_image.imresize_np:839-907` parity — re-derived as separable
    weight-matrix products rather than the reference's unfold loops)."""
    squeeze = img.ndim == 2
    x = np.asarray(img, np.float64)
    if squeeze:
        x = x[:, :, None]
    wh = _resize_weights(x.shape[0], scale, antialiasing)
    ww = _resize_weights(x.shape[1], scale, antialiasing)
    out = np.einsum("oh,hwc->owc", wh, x)
    out = np.einsum("ow,hwc->hoc", ww, out)
    if squeeze:
        out = out[:, :, 0]
    return out.astype(np.asarray(img).dtype, copy=False)


# ------------------------------------------------ named degradation variants
def modcrop_np(img: np.ndarray, sf: int) -> np.ndarray:
    """Crop H/W down to multiples of sf (`bsrgan.modcrop_np:29-43`)."""
    h, w = img.shape[:2]
    return np.copy(img[: h - h % sf, : w - w % sf, ...])


def _wrap_blur(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    return ndimage.convolve(x, k[..., None] if x.ndim == 3 else k, mode="wrap")


def bicubic_degradation(x, sf=3):
    """Bicubic LR (`bsrgan.bicubic_degradation:228-237`)."""
    return imresize_np(x, 1.0 / sf)


def srmd_degradation(x, k, sf=3):
    """Blur then bicubic downsample (`bsrgan.srmd_degradation:240-259`)."""
    return bicubic_degradation(_wrap_blur(x, k), sf=sf)


def dpsr_degradation(x, k, sf=3):
    """Bicubic downsample then blur (`bsrgan.dpsr_degradation:262-281`)."""
    return _wrap_blur(bicubic_degradation(x, sf=sf), k)


def classical_degradation(x, k, sf=3):
    """Blur then stride-sf subsample (`bsrgan.classical_degradation:284-297`)."""
    return _wrap_blur(x, k)[0::sf, 0::sf, ...]


def analytic_kernel(k: np.ndarray) -> np.ndarray:
    """X4 kernel from an X2 kernel (`bsrgan.analytic_kernel:49-62`): the
    stride-2-dilated kernel convolved with itself (the reference sums shifted
    copies k[r,c]*k at stride-2 offsets — same operator), edge-cropped and
    renormalised."""
    from scipy.signal import convolve2d

    k_size = k.shape[0]
    dilated = np.zeros((2 * k_size - 1, 2 * k_size - 1), np.float64)
    dilated[::2, ::2] = k
    big = convolve2d(dilated, k, mode="full")  # (3*k_size-2)^2
    crop = k_size // 2
    cropped = big[crop:-crop, crop:-crop]
    return cropped / cropped.sum()


def _gaussian_blur_cv(img: np.ndarray, ksize: int) -> np.ndarray:
    """cv2.GaussianBlur(img, (ksize,ksize), 0) semantics: sigma derived from
    ksize, reflect-101 borders, per-channel separable filter."""
    from scipy import ndimage

    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    r = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    g = np.exp(-(r * r) / (2.0 * sigma * sigma))
    g /= g.sum()
    src = np.asarray(img, np.float64)
    if src.ndim == 2:
        src = src[:, :, None]
    out = np.empty_like(src)
    for ch in range(src.shape[2]):
        tmp = ndimage.correlate1d(src[:, :, ch], g, axis=0, mode="mirror")
        out[:, :, ch] = ndimage.correlate1d(tmp, g, axis=1, mode="mirror")
    return out.reshape(np.asarray(img).shape).astype(
        np.asarray(img).dtype, copy=False
    )


def add_sharpening(img, weight=0.5, radius=50, threshold=10):
    """USM sharpening (`bsrgan.add_sharpening:299-322`): residual-masked
    unsharp mask with a soft (blurred) mask."""
    if radius % 2 == 0:
        radius += 1
    blur = _gaussian_blur_cv(img, radius)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft_mask = _gaussian_blur_cv(mask, radius)
    k = np.clip(img + weight * residual, 0, 1)
    return soft_mask * k + (1 - soft_mask) * img


def degradation_bsrgan_plus(
    img: np.ndarray,
    sf: int = 4,
    shuffle_prob: float = 0.5,
    use_sharp: bool = True,
    lq_patchsize: int = 64,
    rng: Optional[np.random.RandomState] = None,
):
    """BSRGAN+Real-ESRGAN combined pipeline
    (`bsrgan.degradation_bsrgan_plus:617-703`): optional pre-sharpening, 13
    stages under full or grouped-local shuffle (noise stages 2-5 and 9-12
    shuffle locally, JPEG always last), final resize + JPEG, paired crop."""
    rng = rng or np.random.RandomState(0)
    h1, w1 = img.shape[:2]
    x = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    # (the reference mod-crops with swapped h/w bounds; honest mod-crop here)
    x = modcrop_np(x, sf)
    h, w = x.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(f"img size ({h1}X{w1}) is too small!")

    if use_sharp:
        x = add_sharpening(x)
    hq = x.copy()

    if rng.rand() < shuffle_prob:
        order = list(rng.permutation(13))
    else:
        order = list(range(13))
        order[2:6] = list(np.asarray(order[2:6])[rng.permutation(4)])
        order[9:13] = list(np.asarray(order[9:13])[rng.permutation(4)])

    poisson_prob, speckle_prob = 0.1, 0.1
    for i in order:
        if i in (0, 7):
            x = add_blur(x, rng, sf=sf)
        elif i in (1, 8):
            x = add_resize(x, rng, sf=sf)
        elif i in (2, 9):
            x = add_gaussian_noise(x, rng, noise_level1=2, noise_level2=25)
        elif i in (3, 10):
            if rng.rand() < poisson_prob:
                x = add_poisson_noise(x, rng)
        elif i in (4, 11):
            if rng.rand() < speckle_prob:
                x = add_speckle_noise(x, rng)
        elif i in (5, 12):
            pass  # camera ISP hook: no isp_model in this environment
        elif i == 6:
            x = add_jpeg_noise(x, rng)

    th, tw = int(hq.shape[0] / sf), int(hq.shape[1] / sf)
    x = _resize(x, th, tw, rng)
    x = add_jpeg_noise(x, rng)
    return random_crop(x, hq, sf, lq_patchsize, rng)


# ------------------------------------------------------------ image metrics
def calculate_psnr(img1, img2, border=0):
    """PSNR on [0,255] images (`utils_image.calculate_psnr:621-637`)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    h, w = img1.shape[:2]
    a = np.asarray(img1, np.float64)[border : h - border, border : w - border]
    b = np.asarray(img2, np.float64)[border : h - border, border : w - border]
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _ssim_single(img1, img2):
    """MATLAB-style SSIM of one [0,255] channel (`utils_image.ssim:669-690`):
    11x11 sigma-1.5 Gaussian window, valid-cropped moment maps."""
    from scipy import ndimage

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    a = np.asarray(img1, np.float64)
    b = np.asarray(img2, np.float64)
    r = np.arange(11, dtype=np.float64) - 5.0
    g = np.exp(-(r * r) / (2.0 * 1.5 * 1.5))
    g /= g.sum()

    def filt(x):
        y = ndimage.correlate1d(x, g, axis=0, mode="mirror")
        return ndimage.correlate1d(y, g, axis=1, mode="mirror")[5:-5, 5:-5]

    mu1, mu2 = filt(a), filt(b)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(a * a) - mu1s
    s2 = filt(b * b) - mu2s
    s12 = filt(a * b) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
    return m.mean()


def calculate_ssim(img1, img2, border=0):
    """Mean per-channel SSIM (`utils_image.calculate_ssim:642-666`)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    h, w = img1.shape[:2]
    a = np.asarray(img1)[border : h - border, border : w - border]
    b = np.asarray(img2)[border : h - border, border : w - border]
    if a.ndim == 2:
        return _ssim_single(a, b)
    if a.ndim == 3 and a.shape[2] == 3:
        return float(np.mean([_ssim_single(a[:, :, i], b[:, :, i]) for i in range(3)]))
    if a.ndim == 3 and a.shape[2] == 1:
        return _ssim_single(a[:, :, 0], b[:, :, 0])
    raise ValueError("Wrong input image dimensions.")


def _ycbcr_convert(img, matrix, offset):
    """Shared MATLAB-style colourspace transform core. Unlike the reference
    (`utils_image.py:529-600`, which mutates float inputs in place via
    `img *= 255.`), this never modifies the caller's array."""
    in_type = np.asarray(img).dtype
    x = np.asarray(img, np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    out = x @ np.asarray(matrix, np.float64) + np.asarray(offset, np.float64)
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def rgb2ycbcr(img, only_y: bool = True):
    """MATLAB rgb2ycbcr (`utils_image.rgb2ycbcr:529-550`)."""
    if only_y:
        in_type = np.asarray(img).dtype
        x = np.asarray(img, np.float64)
        if in_type != np.uint8:
            x = x * 255.0
        out = x @ np.asarray([65.481, 128.553, 24.966]) / 255.0 + 16.0
        out = out.round() if in_type == np.uint8 else out / 255.0
        return out.astype(in_type)
    m = np.asarray(
        [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786],
         [24.966, 112.0, -18.214]]
    ) / 255.0
    return _ycbcr_convert(img, m, [16.0, 128.0, 128.0])


def bgr2ycbcr(img, only_y: bool = True):
    """MATLAB-style conversion for BGR layouts
    (`utils_image.bgr2ycbcr:573-594`): rgb2ycbcr with reversed rows."""
    if only_y:
        return rgb2ycbcr(np.asarray(img)[..., ::-1], only_y=True)
    m = np.asarray(
        [[24.966, 112.0, -18.214], [128.553, -74.203, -93.786],
         [65.481, -37.797, 112.0]]
    ) / 255.0
    return _ycbcr_convert(img, m, [16.0, 128.0, 128.0])


def ycbcr2rgb(img):
    """MATLAB ycbcr2rgb (`utils_image.ycbcr2rgb:553-570`)."""
    m = np.asarray(
        [[0.00456621, 0.00456621, 0.00456621],
         [0.0, -0.00153632, 0.00791071],
         [0.00625893, -0.00318811, 0.0]]
    ) * 255.0
    return _ycbcr_convert(img, m, [-222.921, 135.576, -276.836])


def augment_img(img, mode: int = 0):
    """Kai-Zhang 8-mode flip/rotate augmentation (reference
    `utils_image.py:380-398`), numpy HWC."""
    ops = {
        0: lambda x: x,
        1: lambda x: np.flipud(np.rot90(x)),
        2: lambda x: np.flipud(x),
        3: lambda x: np.rot90(x, k=3),
        4: lambda x: np.flipud(np.rot90(x, k=2)),
        5: lambda x: np.rot90(x),
        6: lambda x: np.rot90(x, k=2),
        7: lambda x: np.flipud(np.rot90(x, k=3)),
    }
    return ops[mode](img)
