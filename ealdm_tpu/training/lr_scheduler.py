"""Multiplier-valued LR schedules (base_lr = 1.0 convention).

Parity target: `/root/reference/ldm/lr_scheduler.py` — LambdaWarmUpCosine
(single cycle), LambdaWarmUpCosineScheduler2 / LambdaLinearScheduler (cyclic,
list-configured). Implemented as pure step->multiplier functions usable both
as optax schedules (traced, jnp) and host-side floats.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def warmup_cosine(
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
):
    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum(
            (n - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 1.0
        )
        decay = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, decay)

    return schedule


def _cycle_index(cum_cycles: np.ndarray, n):
    # number of completed cycles before step n (static table, traced n)
    return jnp.sum(jnp.asarray(cum_cycles[1:-1]) < n + 1).astype(jnp.int32)


def _cyclic(
    warm_up_steps: Sequence[int],
    f_min: Sequence[float],
    f_max: Sequence[float],
    f_start: Sequence[float],
    cycle_lengths: Sequence[int],
    linear: bool,
):
    warm_up_steps = np.asarray(warm_up_steps, np.float32)
    f_min = np.asarray(f_min, np.float32)
    f_max = np.asarray(f_max, np.float32)
    f_start = np.asarray(f_start, np.float32)
    cycle_lengths = np.asarray(cycle_lengths, np.float32)
    cum_cycles = np.cumsum(np.concatenate([[0.0], cycle_lengths]))

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        c = _cycle_index(cum_cycles, n)
        nn = n - jnp.asarray(cum_cycles[:-1])[c]
        wu = jnp.asarray(warm_up_steps)[c]
        fmin, fmax, fstart = (
            jnp.asarray(f_min)[c],
            jnp.asarray(f_max)[c],
            jnp.asarray(f_start)[c],
        )
        cl = jnp.asarray(cycle_lengths)[c]
        warm = (fmax - fstart) / wu * nn + fstart
        if linear:
            decay = fmin + (fmax - fmin) * (cl - nn) / cl
        else:
            t = jnp.minimum((nn - wu) / jnp.maximum(cl - wu, 1.0), 1.0)
            decay = fmin + 0.5 * (fmax - fmin) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(nn < wu, warm, decay)

    return schedule


def warmup_cosine_cyclic(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    return _cyclic(warm_up_steps, f_min, f_max, f_start, cycle_lengths, linear=False)


def warmup_linear_cyclic(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaLinearScheduler: linear ramp then linear decay per cycle."""
    return _cyclic(warm_up_steps, f_min, f_max, f_start, cycle_lengths, linear=True)


def build_scheduler(config: dict):
    """Map reference scheduler_config {target, params} to a schedule fn."""
    target = config.get("target", "")
    p = dict(config.get("params", {}))
    p.pop("verbosity_interval", None)
    name = target.rsplit(".", 1)[-1]
    if name == "LambdaWarmUpCosineScheduler":
        return warmup_cosine(
            p["warm_up_steps"], p["lr_min"], p["lr_max"], p["lr_start"],
            p["max_decay_steps"],
        )
    if name == "LambdaWarmUpCosineScheduler2":
        return warmup_cosine_cyclic(
            p["warm_up_steps"], p["f_min"], p["f_max"], p["f_start"],
            p["cycle_lengths"],
        )
    if name == "LambdaLinearScheduler":
        return warmup_linear_cyclic(
            p["warm_up_steps"], p["f_min"], p["f_max"], p["f_start"],
            p["cycle_lengths"],
        )
    raise ValueError(f"unknown scheduler target: {target}")
