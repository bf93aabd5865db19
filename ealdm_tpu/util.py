"""General helpers (reference `ldm/util.py` capability surface).

Parity map: log_txt_as_img (`util.py:17-38`), ismap/isimage (`:41-51`),
mean_flat (`:64`), count_params (`:71`), instantiate_from_config (`:78`,
re-exported from config.py), parallel_data_prefetch (`:108-203`).
"""
from __future__ import annotations

import concurrent.futures
import multiprocessing as mp
import os
from functools import partial
from typing import Callable, Sequence

import numpy as np

from .config import get_obj_from_str, instantiate_from_config  # noqa: F401


def log_txt_as_img(wh, xc: Sequence[str], size: int = 10) -> np.ndarray:
    """Render a list of captions to [B, H, W, 3] float images in [-1, 1]."""
    from PIL import Image, ImageDraw, ImageFont

    b = len(xc)
    txts = []
    for bi in range(b):
        txt = Image.new("RGB", wh, color="white")
        draw = ImageDraw.Draw(txt)
        font = None
        # repo-committed font first (reference ships data/DejaVuSans.ttf,
        # ldm/util.py:25), then PIL's system search, then its builtin
        repo_font = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "data", "DejaVuSans.ttf"
        )
        for cand in (repo_font, "DejaVuSans.ttf"):
            try:
                font = ImageFont.truetype(cand, size=size)
                break
            except Exception:
                continue
        if font is None:
            font = ImageFont.load_default()
        nc = int(40 * (wh[0] / 256))
        lines = "\n".join(
            xc[bi][start : start + nc] for start in range(0, len(xc[bi]), nc)
        )
        try:
            draw.text((0, 0), lines, fill="black", font=font)
        except UnicodeEncodeError:
            pass
        txts.append(np.asarray(txt).astype(np.float32) / 127.5 - 1.0)
    return np.stack(txts)


def ismap(x) -> bool:
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] > 3


def isimage(x) -> bool:
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] in (1, 3)


def exists(x) -> bool:
    return x is not None


def default(val, d):
    if val is not None:
        return val
    return d() if callable(d) else d


def mean_flat(tensor):
    import jax.numpy as jnp

    return jnp.mean(tensor, axis=tuple(range(1, tensor.ndim)))


def count_params(params, verbose: bool = False) -> int:
    """Total parameter count of a flax param pytree (or module+sample)."""
    import jax

    total = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    if verbose:
        print(f"Model has {total * 1e-6:.2f} M params.")
    return total


def parallel_data_prefetch(
    func: Callable,
    data,
    n_proc: int,
    target_data_type: str = "ndarray",
    use_threads: bool = True,
):
    """Chunked parallel map over a list/array (reference `:108-203`).

    Threads by default (host ETL here is IO/PIL-bound and fork-unsafe with
    a live TPU client); set use_threads=False for process workers.
    """
    if target_data_type not in ("ndarray", "list"):
        raise ValueError("target_data_type must be 'ndarray' or 'list'")
    if isinstance(data, np.ndarray) and target_data_type == "list":
        raise ValueError("list expected but function got ndarray")
    if not hasattr(data, "__iter__"):
        raise TypeError("data must be iterable")
    data = list(data) if not isinstance(data, np.ndarray) else data

    n_proc = max(1, min(n_proc, len(data)))
    chunk = (len(data) + n_proc - 1) // n_proc
    chunks = [data[i * chunk : (i + 1) * chunk] for i in range(n_proc)]

    def run(sub):
        return [func(x) for x in sub]

    pool_cls = (
        concurrent.futures.ThreadPoolExecutor
        if use_threads
        else concurrent.futures.ProcessPoolExecutor
    )
    with pool_cls(max_workers=n_proc) as ex:
        results = list(ex.map(run, chunks))
    flat = [x for sub in results for x in sub]
    if target_data_type == "ndarray":
        return np.asarray(flat)
    return flat
