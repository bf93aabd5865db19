"""Runtime assertion / sampling / consistency helpers.

Parity targets (`/root/reference/torch_utils/misc.py`): assert_shape (:82),
InfiniteSampler (:111), check_ddp_consistency (:180) — the latter becomes a
cross-device parameter-drift check expressed with jax collectives instead of
NCCL broadcasts.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np


def assert_shape(tensor, ref_shape: Sequence[Optional[int]]):
    """Assert tensor shape; None entries are wildcards (reference misc.assert_shape)."""
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {tensor.ndim}, expected {len(ref_shape)}"
        )
    for idx, (size, ref) in enumerate(zip(tensor.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, expected {ref}"
            )


class InfiniteSampler:
    """Shuffled infinite index stream with rank sharding and optional
    window-local reshuffling (reference misc.InfiniteSampler semantics)."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def check_param_consistency(params, axis_name: str = "data", rtol: float = 0.0):
    """Inside shard_map/pmap: assert replicated params match across devices
    (the DDP weight-drift check). Returns max abs drift per pytree."""
    import jax
    import jax.numpy as jnp

    def drift(p):
        mean = jax.lax.pmean(p, axis_name)
        return jnp.max(jnp.abs(p - mean))

    drifts = jax.tree_util.tree_map(drift, params)
    return jax.tree_util.tree_reduce(jnp.maximum, drifts, jnp.asarray(0.0))


def profiled_function(fn):
    """Decorator tagging `fn`'s work in profiler traces (reference
    `torch_utils/misc.py:100-106` wraps with
    torch.autograd.profiler.record_function). Here the annotation is a
    `jax.profiler.TraceAnnotation`, which labels both the host-side trace
    row and any device ops traced while the function runs."""
    import functools

    import jax

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper
