"""Layout-to-image conditioning: bbox tokenization + synthetic layout data.

Capability parity with the reference's Layout2ImgDiffusion path
(`/root/reference/ldm/models/diffusion/ddpm.py:1472-1493`, zoo config
`models/ldm/layout2img-openimages256/config.yaml`): layouts arrive as token
sequences under `coordinates_bbox` and are encoded by a BERT-style
transformer (vocab 8192, max_seq_len 92, `use_tokenizer: false` — the
dataset supplies raw token ids). The OpenImages bbox ETL itself is
download-based and unavailable here (zero egress); this module provides the
tokenization scheme, a synthetic layout dataset, and a layout renderer for
the log_images bbox plot.

Token layout inside the vocab:
  [0, n_classes)                       object class tokens
  [n_classes, n_classes + n_bins)      quantized coordinate tokens
  vocab_size - 1                       PAD
Each object contributes 5 tokens: class, x0, y0, x1, y1 (corner coords
quantized to n_bins over [0, 1]).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Box = Tuple[int, float, float, float, float]  # (class_id, x0, y0, x1, y1)


class BBoxTokenizer:
    """(class, corners) objects <-> fixed-length token sequences."""

    def __init__(
        self,
        vocab_size: int = 8192,
        n_classes: int = 601,  # OpenImages class count
        n_bins: int = 256,
        max_seq_len: int = 92,
    ):
        assert n_classes + n_bins < vocab_size
        self.vocab_size = vocab_size
        self.n_classes = n_classes
        self.n_bins = n_bins
        self.max_seq_len = max_seq_len
        self.pad_id = vocab_size - 1
        self.max_objects = max_seq_len // 5

    def _quant(self, v: float) -> int:
        b = int(np.clip(v, 0.0, 1.0) * (self.n_bins - 1) + 0.5)
        return self.n_classes + b

    def _dequant(self, tok: int) -> float:
        return (tok - self.n_classes) / (self.n_bins - 1)

    def encode(self, boxes: Sequence[Box]) -> np.ndarray:
        ids = []
        for cls, x0, y0, x1, y1 in boxes[: self.max_objects]:
            assert 0 <= cls < self.n_classes, cls
            ids.extend(
                [cls, self._quant(x0), self._quant(y0), self._quant(x1), self._quant(y1)]
            )
        out = np.full((self.max_seq_len,), self.pad_id, np.int32)
        out[: len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int]) -> List[Box]:
        boxes: List[Box] = []
        ids = [int(i) for i in ids if int(i) != self.pad_id]
        for i in range(0, len(ids) - 4, 5):
            cls = ids[i]
            c = [self._dequant(t) for t in ids[i + 1 : i + 5]]
            boxes.append((cls, *c))
        return boxes

    def __call__(self, batch_boxes: Sequence[Sequence[Box]]):
        import jax.numpy as jnp

        return jnp.asarray(np.stack([self.encode(b) for b in batch_boxes]))


def render_layout(
    boxes: Sequence[Box], size: int = 256, n_classes: int = 601
) -> np.ndarray:
    """Rasterize a layout as filled class-colored rectangles in [-1, 1]
    (the log_images 'bbox_image' conditioning plot)."""
    img = np.ones((size, size, 3), np.float32)
    rng_colors = np.random.RandomState(0).rand(n_classes, 3) * 0.9
    for cls, x0, y0, x1, y1 in boxes:
        a0, b0 = int(x0 * (size - 1)), int(y0 * (size - 1))
        a1, b1 = int(x1 * (size - 1)), int(y1 * (size - 1))
        a0, a1 = min(a0, a1), max(a0, a1)
        b0, b1 = min(b0, b1), max(b0, b1)
        img[b0 : b1 + 1, a0 : a1 + 1] = rng_colors[cls % n_classes]
    return img * 2.0 - 1.0


class SyntheticLayoutDataset:
    """Deterministic layout dataset: each sample is a rendered rectangle
    scene plus its bbox token sequence (stand-in for the reference's
    OpenImagesBBox datasets, which require downloads)."""

    def __init__(
        self,
        length: int = 64,
        size: int = 256,
        max_objects: int = 4,
        n_classes: int = 601,
        vocab_size: int = 8192,
        max_seq_len: int = 92,
        seed: int = 0,
        **_,
    ):
        self.length = length
        self.size = size
        self.max_objects = max_objects
        self.tokenizer = BBoxTokenizer(
            vocab_size=vocab_size, n_classes=n_classes, max_seq_len=max_seq_len
        )
        self.n_classes = n_classes
        self.seed = seed

    def __len__(self):
        return self.length

    def sample_boxes(self, idx: int) -> List[Box]:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        n = rng.randint(1, self.max_objects + 1)
        boxes: List[Box] = []
        for _ in range(n):
            cls = int(rng.randint(self.n_classes))
            x0, y0 = rng.rand(2) * 0.8
            w, h = rng.rand(2) * 0.5 + 0.05
            boxes.append((cls, x0, y0, min(x0 + w, 1.0), min(y0 + h, 1.0)))
        return boxes

    def __getitem__(self, idx: int):
        boxes = self.sample_boxes(idx)
        return {
            "image": render_layout(boxes, self.size, self.n_classes),
            "coordinates_bbox": self.tokenizer.encode(boxes),
        }
