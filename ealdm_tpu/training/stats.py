"""Cross-process training statistics collector.

Parity target: `torch_utils/training_stats.py` (reference, dormant in the
EALDM path): named scalar streams accumulated as (num, sum, sum-of-squares)
moments, synchronized across processes, exposed via a Collector with
mean/std/num queries. The sync here is `multihost_utils.process_allgather`
on a fixed-shape moment table instead of a NCCL all-reduce over a sync
device.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

_counters: "OrderedDict[str, np.ndarray]" = OrderedDict()


def report(name: str, value) -> None:
    """Accumulate scalars (array-like ok) into the named stream."""
    arr = np.asarray(value, np.float64).reshape(-1)
    if arr.size == 0:
        return
    moments = np.array([arr.size, arr.sum(), np.square(arr).sum()], np.float64)
    if name in _counters:
        _counters[name] += moments
    else:
        _counters[name] = moments


def report0(name: str, value, process_index: Optional[int] = None) -> None:
    """Report only on process 0 (rank_zero_only semantics)."""
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0
    if process_index == 0:
        report(name, value)


def _sync(names) -> Dict[str, np.ndarray]:
    table = np.stack([_counters[n] for n in names])
    try:
        import jax
        from jax.experimental import multihost_utils

        if jax.process_count() > 1:
            gathered = multihost_utils.process_allgather(table)
            table = np.asarray(gathered).sum(axis=0)
    except Exception:
        pass
    return {n: table[i] for i, n in enumerate(names)}


class Collector:
    """Snapshot view over the accumulated streams (reference Collector)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        import re

        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self.update()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self):
        if not self._keep_previous:
            self._moments.clear()
        names = self.names()
        if not names:
            return
        synced = _sync(names)
        for n in names:
            self._moments[n] = synced[n].copy()
            _counters[n][:] = 0
    def num(self, name):
        m = self._moments.get(name, np.zeros(3))
        return int(m[0])

    def mean(self, name):
        m = self._moments.get(name, np.zeros(3))
        return float(m[1] / m[0]) if m[0] > 0 else float("nan")

    def std(self, name):
        m = self._moments.get(name, np.zeros(3))
        if m[0] == 0:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self):
        return {
            n: {"num": self.num(n), "mean": self.mean(n), "std": self.std(n)}
            for n in self._moments
        }
