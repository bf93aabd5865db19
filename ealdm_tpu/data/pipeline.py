"""Host-side data pipeline: Dataset protocol -> fixed-shape device batches.

TPU-native replacement for the reference's torch DataLoader + Lightning
DataModule (`/root/reference/main.py:166-241`): map-style datasets are
batched into contiguous numpy dicts with STATIC shapes (drop_last), epoch
shuffling is seeded (the `worker_init_fn` seeding contract, `main.py:150`),
and an async prefetcher overlaps host ETL with device compute by keeping N
batches in flight on device.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class Dataset:
    """Map-style dataset: __len__ + __getitem__ returning a pytree of arrays."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Any:
        raise NotImplementedError


class WrappedDataset(Dataset):
    """Wrap an arbitrary indexable into the Dataset protocol
    (reference `WrappedDataset`, main.py:140-148)."""

    def __init__(self, data):
        self.data = data

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]


def _stack(items: Sequence[Any]) -> Any:
    first = items[0]
    if isinstance(first, dict):
        return {k: _stack([it[k] for it in items]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(_stack([it[i] for it in items]) for i in range(len(first)))
    return np.stack([np.asarray(it) for it in items], axis=0)


class DataLoader:
    """Batching iterator with seeded epoch shuffling and static shapes."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        collate_fn: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.collate_fn = collate_fn or _stack

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Any]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        stop = n - (n % self.batch_size) if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self.collate_fn([self.dataset[int(i)] for i in idx])


class DevicePrefetcher:
    """Background thread that stages host batches onto device, keeping
    `buffer_size` batches in flight (host ETL overlapped with TPU compute)."""

    def __init__(self, loader, put_fn: Optional[Callable] = None, buffer_size: int = 2):
        self.loader = loader
        self.buffer_size = buffer_size
        if put_fn is None:
            import jax

            def put_fn(batch):
                # non-numeric leaves (file paths, labels-as-strings) stay host-side
                return jax.tree_util.tree_map(
                    lambda x: x
                    if getattr(np.asarray(x), "dtype", None) is not None
                    and np.asarray(x).dtype.kind in "USO"
                    else jax.device_put(x),
                    batch,
                )

        self.put_fn = put_fn

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()
        error: list = []

        def worker():
            try:
                for batch in self.loader:
                    q.put(self.put_fn(batch))
            except BaseException as e:  # propagate, never swallow
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error:
            raise error[0]


class DataModule:
    """Config-driven train/val/test loaders (reference DataModuleFromConfig).

    dataset_configs: {"train": {target, params}, "validation": ..., "test": ...}
    """

    def __init__(
        self,
        batch_size: int,
        dataset_configs: Dict[str, Dict],
        num_workers: int = 0,
        wrap: bool = False,
        seed: int = 0,
    ):
        from ..config import instantiate_from_config

        self.batch_size = batch_size
        self.seed = seed
        self.datasets: Dict[str, Dataset] = {}
        for split, cfg in dataset_configs.items():
            if cfg is None:
                continue
            ds = instantiate_from_config(cfg)
            self.datasets[split] = WrappedDataset(ds) if wrap else ds

    def _loader(self, split: str, shuffle: bool) -> Optional[DataLoader]:
        ds = self.datasets.get(split)
        if ds is None:
            return None
        return DataLoader(
            ds, self.batch_size, shuffle=shuffle, drop_last=True, seed=self.seed
        )

    def train_dataloader(self):
        return self._loader("train", shuffle=True)

    def val_dataloader(self):
        return self._loader("validation", shuffle=False)

    def test_dataloader(self):
        return self._loader("test", shuffle=False)

    def predict_dataloader(self):
        return self._loader("predict", shuffle=False)
