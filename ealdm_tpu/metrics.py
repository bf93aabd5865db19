"""Evaluation metrics: FID, PSNR, multi-label F1, CLIP-style agreement.

Parity targets: torchmetrics FID + CLIP zero-shot agreement + sklearn
f1_score as used by the third stage
(`/root/reference/STDiff/third_stage_model.py:733-856`).

FID here is the exact Frechet distance math over features from a pluggable
feature network (InceptionV3 weights are not downloadable in this
environment; the default feature net is the in-repo VGG16/ResNet trunk with
an import hook for pretrained weights — distances are then identical to
torchmetrics given the same features).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class FID:
    """Streaming FID: update(real/fake features) -> compute()."""

    def __init__(self, feature_fn: Optional[Callable] = None):
        self.feature_fn = feature_fn
        self._real = []
        self._fake = []

    def update(self, images_or_feats: np.ndarray, real: bool):
        feats = (
            self.feature_fn(images_or_feats)
            if self.feature_fn is not None
            else images_or_feats
        )
        feats = np.asarray(feats, np.float64).reshape(len(feats), -1)
        (self._real if real else self._fake).append(feats)

    def compute(self) -> float:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        mu_r, mu_f = real.mean(0), fake.mean(0)
        cov_r = np.cov(real, rowvar=False)
        cov_f = np.cov(fake, rowvar=False)
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)

    def reset(self):
        self._real, self._fake = [], []


def multilabel_f1(y_true: np.ndarray, y_pred: np.ndarray, average: str = "macro") -> float:
    """F1 over multi-hot labels [N, C] (sklearn f1_score parity)."""
    y_true = np.asarray(y_true) > 0.5
    y_pred = np.asarray(y_pred) > 0.5
    tp = (y_true & y_pred).sum(0).astype(np.float64)
    fp = (~y_true & y_pred).sum(0).astype(np.float64)
    fn = (y_true & ~y_pred).sum(0).astype(np.float64)
    if average == "micro":
        p = tp.sum() / max(tp.sum() + fp.sum(), 1e-12)
        r = tp.sum() / max(tp.sum() + fn.sum(), 1e-12)
        return float(2 * p * r / max(p + r, 1e-12))
    denom_p = np.maximum(tp + fp, 1e-12)
    denom_r = np.maximum(tp + fn, 1e-12)
    p = tp / denom_p
    r = tp / denom_r
    f1 = 2 * p * r / np.maximum(p + r, 1e-12)
    return float(f1.mean())


def label_agreement(sim_logits: np.ndarray, labels_multi_hot: np.ndarray) -> float:
    """CLIP-style zero-shot agreement: fraction of samples whose argmax
    similarity class is among the true labels (reference `:774-789`)."""
    pred = np.argmax(sim_logits, axis=-1)
    hits = [
        float(labels_multi_hot[i, pred[i]] > 0.5) for i in range(len(pred))
    ]
    return float(np.mean(hits)) if hits else 0.0
