"""Generic image datasets (file-list / folder) + SR degradation.

Parity targets: `/root/reference/ldm/data/lsun.py` (file-list dataset with
center-crop + resize + [-1,1] normalize), `ldm/data/base.py`
(Txt2ImgIterableBaseDataset sharding contract) and the
`ldm/modules/image_degradation` BSRGAN pipeline used by ImageNetSR —
implemented here as a light blur/resize/noise/JPEG chain
(`degradation_fn_bsr_light` capability) with numpy/PIL only.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .pipeline import Dataset


def center_crop_resize(arr: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    h, w = arr.shape[:2]
    crop = min(h, w)
    top, left = (h - crop) // 2, (w - crop) // 2
    arr = arr[top : top + crop, left : left + crop]
    im = Image.fromarray(arr)
    return np.asarray(im.resize((size, size), Image.BICUBIC))


class ImageFolderDataset(Dataset):
    """LSUN-style dataset from a file list or directory of images."""

    def __init__(
        self,
        data_root: str,
        txt_file: Optional[str] = None,
        size: int = 256,
        flip_p: float = 0.0,
        key: str = "image",
        seed: int = 0,
    ):
        self.data_root = data_root
        if txt_file:
            with open(txt_file) as f:
                rel = [line.strip() for line in f if line.strip()]
        else:
            exts = (".png", ".jpg", ".jpeg", ".webp", ".npy")
            rel = sorted(
                fn for fn in os.listdir(data_root) if fn.lower().endswith(exts)
            )
        self.paths = [os.path.join(data_root, r) for r in rel]
        self.size = size
        self.flip_p = flip_p
        self.key = key
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.paths)

    def _load(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            arr = np.load(path)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            return arr
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))

    def __getitem__(self, idx):
        arr = center_crop_resize(self._load(self.paths[idx]), self.size)
        if self.flip_p > 0 and self._rng.rand() < self.flip_p:
            arr = arr[:, ::-1]
        img = arr.astype(np.float32) / 127.5 - 1.0
        return {self.key: img, "file_path_": self.paths[idx]}


def degrade_sr_light(
    hr: np.ndarray, sf: int = 4, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """Light SR degradation: gaussian blur -> downscale -> noise -> JPEG.

    hr: uint8 [H, W, 3]; returns uint8 [H/sf, W/sf, 3].
    """
    import io

    from PIL import Image, ImageFilter

    rng = rng or np.random.RandomState(0)
    im = Image.fromarray(hr)
    if rng.rand() < 0.8:
        im = im.filter(ImageFilter.GaussianBlur(radius=float(rng.uniform(0.4, 2.0))))
    lo = im.resize((hr.shape[1] // sf, hr.shape[0] // sf), Image.BICUBIC)
    arr = np.asarray(lo).astype(np.float32)
    if rng.rand() < 0.5:
        arr = arr + rng.randn(*arr.shape) * rng.uniform(1.0, 8.0)
    arr = np.clip(arr, 0, 255).astype(np.uint8)
    if rng.rand() < 0.5:
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=int(rng.uniform(40, 95)))
        buf.seek(0)
        arr = np.asarray(Image.open(buf).convert("RGB"))
    return arr


class ImageSRDataset(ImageFolderDataset):
    """Super-resolution pairs (ImageNetSR capability): HR + degraded LR."""

    def __init__(self, *args, downscale_f: int = 4, degradation: str = "light", **kw):
        super().__init__(*args, **kw)
        self.sf = downscale_f
        self.degradation = degradation

    def __getitem__(self, idx):
        arr = center_crop_resize(self._load(self.paths[idx]), self.size)
        if self.degradation.startswith("pil"):
            from PIL import Image

            lr = np.asarray(
                Image.fromarray(arr).resize(
                    (self.size // self.sf, self.size // self.sf), Image.NEAREST
                )
            ).astype(np.float32) / 255.0
        elif self.degradation in ("bsrgan", "bsrgan_light"):
            from .degradation import degradation_fn_bsr, degradation_fn_bsr_light

            fn = (
                degradation_fn_bsr_light
                if self.degradation.endswith("light")
                else degradation_fn_bsr
            )
            lr, _ = fn(arr.astype(np.float32) / 255.0, sf=self.sf, rng=self._rng)
        elif self.degradation == "bsrgan_plus":
            from .degradation import degradation_bsrgan_plus

            # the plus pipeline PRE-SHARPENS the HQ before degrading, so the
            # training GT must be its returned hq, not the raw crop
            # (Real-ESRGAN trains against the sharpened GT)
            lr, hq = degradation_bsrgan_plus(
                arr.astype(np.float32) / 255.0, sf=self.sf,
                lq_patchsize=self.size // self.sf, rng=self._rng,
            )
            return {
                "image": hq.astype(np.float32) * 2.0 - 1.0,
                "LR_image": lr.astype(np.float32) * 2.0 - 1.0,
            }
        elif self.degradation == "matlab_bicubic":
            from .degradation import imresize_np

            lr = np.clip(
                imresize_np(arr.astype(np.float32) / 255.0, 1.0 / self.sf),
                0.0, 1.0,
            )
        else:
            lr = degrade_sr_light(arr, self.sf, self._rng).astype(np.float32) / 255.0
        return {
            "image": arr.astype(np.float32) / 127.5 - 1.0,
            "LR_image": lr.astype(np.float32) * 2.0 - 1.0,
        }
