"""Training callbacks: setup, image logging, device stats, LR monitor.

Parity targets (all /root/reference/main.py):
  SetupCallback (244-290)  -> SetupCallback: logdir/ckptdir/cfgdir creation +
                              merged-config dump + keyboard-interrupt save
  ImageLogger (293-447)    -> ImageLogger: periodic log_images PNG grids under
                              logs/<run>/images/<split> + de-normalized
                              condition CSV via the persisted scalers
  CUDACallback (449-469)   -> DeviceStatsCallback: epoch wall time + peak
                              device memory (jax memory_stats)
  LearningRateMonitor      -> folded into the JSONL metric logger
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import numpy as np
import yaml


def to_uint8_grid(images: np.ndarray, nrow: int = 4) -> np.ndarray:
    """[N,H,W,C] in [-1,1] -> one [gh,gw,3] uint8 grid image."""
    images = np.asarray(images, np.float32)
    images = np.clip((images + 1.0) / 2.0, 0.0, 1.0)
    n, h, w, c = images.shape
    if c == 1:
        images = np.repeat(images, 3, axis=-1)
        c = 3
    elif c > 3:
        images = images[..., :3]
        c = 3
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * h, ncol * w, 3), np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return (grid * 255).astype(np.uint8)


def save_png(path: str, arr_uint8: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr_uint8).save(path)


class SetupCallback:
    """Create logdir/ckptdir/cfgdir and persist the merged configs."""

    def __init__(self, logdir: str, config: Dict, name: str = "project"):
        self.logdir = logdir
        self.ckptdir = os.path.join(logdir, "checkpoints")
        self.cfgdir = os.path.join(logdir, "configs")
        self.config = config
        self.name = name

    def on_start(self, now: str = ""):
        for d in (self.logdir, self.ckptdir, self.cfgdir):
            os.makedirs(d, exist_ok=True)
        with open(
            os.path.join(self.cfgdir, f"{now}-{self.name}.yaml"), "w"
        ) as f:
            yaml.safe_dump(self.config, f, sort_keys=False)


class MetricLogger:
    """Scalar stream: JSONL (primary) + TensorBoard event file (reference
    trains under Lightning's TB logger, main.py:537-545) + stdout."""

    def __init__(
        self, logdir: str, filename: str = "metrics.jsonl", tensorboard: bool = True
    ):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self.tb = None
        if tensorboard:
            from .tensorboard import TBEventWriter

            self.tb = TBEventWriter(os.path.join(logdir, "tb"))

    def log(self, step: int, metrics: Dict, prefix: str = "", echo: bool = False):
        row = {"step": int(step)}
        for k, v in metrics.items():
            try:
                row[f"{prefix}{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.tb is not None:
            self.tb.add_scalars({k: v for k, v in row.items() if k != "step"}, step)
            self.tb.flush()
        if echo:
            shown = {k: round(v, 5) for k, v in row.items() if k != "step"}
            print(f"step {step}: {shown}", flush=True)


class ImageLogger:
    """Periodic sample/reconstruction grids + de-normalized condition CSV."""

    def __init__(
        self,
        logdir: str,
        batch_frequency: int = 1000,
        max_images: int = 8,
        scaler_dir: Optional[str] = None,
        log_steps: int = 20,
        eta: float = 1.0,
        increase_log_steps: bool = False,
        tb_writer=None,
    ):
        self.logdir = logdir
        self.batch_frequency = max(1, batch_frequency)
        self.max_images = max_images
        self.scaler_dir = scaler_dir
        self.log_steps = log_steps
        self.eta = eta
        self.tb = tb_writer  # optional shared TBEventWriter for image grids
        self._scalers = {}

    def check_frequency(self, step: int) -> bool:
        return step % self.batch_frequency == 0

    def _scaler(self, name: str, phase: str):
        key = (name, phase)
        if key not in self._scalers and self.scaler_dir:
            from ..data.scalers import load_scaler

            path = os.path.join(self.scaler_dir, f"{name}_scaler_{phase}.json")
            self._scalers[key] = load_scaler(path) if os.path.exists(path) else None
        return self._scalers.get(key)

    def log_img(
        self, model, variables, batch, step: int, rng, split: str = "train",
        sample: bool = True,
    ):
        from ..inference import log_images

        logs = log_images(
            model, variables, batch, rng, n=self.max_images,
            steps=self.log_steps, eta=self.eta, sample=sample,
        )
        root = os.path.join(self.logdir, "images", split)
        for key, imgs in logs.items():
            if key.endswith("_latent") or key == "mask":
                continue
            arr = np.asarray(imgs)
            if arr.ndim != 4:
                continue
            grid = to_uint8_grid(arr)
            save_png(os.path.join(root, f"{key}_gs-{step:06d}.png"), grid)
            if self.tb is not None:
                self.tb.add_image(f"{split}/{key}", grid, step)
        self._write_condition_csv(batch, step, split, root)
        return logs

    def _write_condition_csv(self, batch, step: int, split: str, root: str):
        mixed = batch.get("mixed")
        if not isinstance(mixed, dict):
            return
        os.makedirs(root, exist_ok=True)
        n = min(self.max_images, np.asarray(batch["img"]).shape[0])
        flow = np.asarray(mixed["flow"])[:n].reshape(n, -1)
        weather = np.asarray(mixed["weather"])[:n].reshape(n, -1)
        t = np.asarray(mixed["time"])[:n].reshape(n, -1)
        phase = "trainval" if split == "train" else "test"
        fsc = self._scaler("flow", phase)
        wsc = self._scaler("weather", phase)
        tsc = self._scaler("time", phase)
        if fsc is not None:
            flow = fsc.inverse_transform(flow)
        if wsc is not None:
            weather = wsc.inverse_transform(weather)
        if tsc is not None:
            t = tsc.inverse_transform(t)
        path = os.path.join(root, f"conditions_gs-{step:06d}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["idx", "time"]
                + [f"flow_{i}" for i in range(flow.shape[1])]
                + [f"weather_{i}" for i in range(weather.shape[1])]
            )
            for i in range(n):
                w.writerow(
                    [i, *t[i].tolist(), *flow[i].tolist(), *weather[i].tolist()]
                )


class DeviceStatsCallback:
    """Per-epoch wall time + peak device memory (reference CUDACallback)."""

    def __init__(self):
        self._t0 = None

    def on_epoch_start(self):
        self._t0 = time.perf_counter()

    def on_epoch_end(self) -> Dict[str, float]:
        import jax

        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        stats = {}
        try:
            mem = jax.local_devices()[0].memory_stats() or {}
            stats["peak_bytes_in_use"] = float(mem.get("peak_bytes_in_use", 0))
            stats["bytes_in_use"] = float(mem.get("bytes_in_use", 0))
        except Exception:
            pass
        stats["epoch_time_s"] = dt
        print(
            f"Epoch time {dt:.2f}s, peak device memory "
            f"{stats.get('peak_bytes_in_use', 0) / 2**20:.0f} MiB",
            flush=True,
        )
        return stats
