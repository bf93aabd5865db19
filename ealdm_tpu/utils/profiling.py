"""Tracing / profiling utilities.

Parity target (SURVEY.md §5 "Tracing / profiling"): the reference relies on
Lightning's profiler summary printed at exit (reference main.py:878), the
CUDACallback epoch wall-time + peak-memory log (main.py:449-469), and the
per-batch throughput print in sampling (sample_diffusion.py:104-105).

TPU-native equivalents here:
  * `trace(logdir)` — context manager around `jax.profiler` producing an
    XPlane trace viewable in TensorBoard/Perfetto (the deep-dive tool; shows
    per-HLO time on the TPU, HBM traffic, and fusion boundaries).
  * `StepTimer` — cheap per-step wall-clock stats with a Lightning-style
    summary string at exit. Device work is asynchronous, so buckets measure
    *enqueue-to-enqueue* time unless `fence()` is called with a jax.Array
    (forces a 1-scalar readback; the device queue is FIFO so this fences all
    prior work — the reliable sync on the axon relay, where
    block_until_ready does not block).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(x) -> float:
    """Force completion of all enqueued device work (FIFO queue) by reading
    back one scalar of `x`; returns it as float."""
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


class StepTimer:
    """Named wall-clock buckets + Lightning-profiler-style summary."""

    def __init__(self):
        self._buckets: Dict[str, List[float]] = {}
        self._open: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._buckets.setdefault(name, []).append(time.perf_counter() - t0)

    def start(self, name: str):
        self._open[name] = time.perf_counter()

    def stop(self, name: str):
        t0 = self._open.pop(name, None)
        if t0 is not None:
            self._buckets.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> str:
        rows = [("action", "mean (ms)", "total (s)", "calls")]
        total = sum(sum(v) for v in self._buckets.values()) or 1.0
        for name, vals in sorted(
            self._buckets.items(), key=lambda kv: -sum(kv[1])
        ):
            rows.append(
                (
                    name,
                    f"{1e3 * sum(vals) / len(vals):.2f}",
                    f"{sum(vals):.2f} ({100 * sum(vals) / total:.0f}%)",
                    str(len(vals)),
                )
            )
        widths = [max(len(r[i]) for r in rows) for i in range(4)]
        lines = ["  ".join(c.ljust(w) for c, w in zip(r, widths)) for r in rows]
        sep = "-" * len(lines[0])
        return "\n".join([sep, lines[0], sep, *lines[1:], sep])

    def report(self):
        if self._buckets:
            print(self.summary(), flush=True)
