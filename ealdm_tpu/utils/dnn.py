"""dnnlib-style support utilities.

Parity targets (`/root/reference/dnnlib/util.py`, used by the STDiff
subsystem): `EasyDict` (:40-53), the stdout/stderr tee `Logger` (:56-118),
`format_time` (:124-136), and the URL-or-path opener `open_url` (:389-491).
Plus `print_module_summary` (`/root/reference/torch_utils/misc.py:196-266`)
re-imagined for flax: parameter/output-shape table via `Module.tabulate`-
style traversal without running real compute (jax.eval_shape).

TPU-environment note: this build runs with zero network egress, so
`open_url` resolves http(s) URLs ONLY through the local cache directory
(pre-seeded by the deployment); file paths and file:// URIs work as usual.
"""
from __future__ import annotations

import hashlib
import io
import os
import sys
from typing import Any, IO, List, Optional, Tuple


class EasyDict(dict):
    """dict with attribute access (reference dnnlib/util.py:40-53)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


class _Tee(io.TextIOBase):
    """A writable text stream that fans each write out to several sinks."""

    def __init__(self, *sinks: IO, autoflush: bool = True):
        self._sinks = sinks
        self._autoflush = autoflush

    def writable(self) -> bool:
        return True

    def write(self, text: str) -> int:
        for s in self._sinks:
            s.write(text)
            if self._autoflush:
                s.flush()
        return len(text)

    def flush(self) -> None:
        for s in self._sinks:
            s.flush()


class Logger:
    """Mirror everything printed to stdout/stderr into a log file.

    Fills the role of `dnnlib.util.Logger` (reference dnnlib/util.py:56-118)
    with a different construction: an ExitStack of
    contextlib.redirect_stdout/redirect_stderr around a fan-out `_Tee`
    stream, so teardown is exception-safe and nesting composes. Use as a
    context manager, or call close(); `mode="a"` appends.
    """

    def __init__(self, file_name: Optional[str] = None, mode: str = "w",
                 should_flush: bool = True):
        import contextlib

        self._file: Optional[IO] = (
            open(file_name, mode) if file_name is not None else None
        )
        self._stack = contextlib.ExitStack()
        sinks = (self._file,) if self._file is not None else ()
        self._stack.enter_context(contextlib.redirect_stdout(
            _Tee(sys.stdout, *sinks, autoflush=should_flush)))
        self._stack.enter_context(contextlib.redirect_stderr(
            _Tee(sys.stderr, *sinks, autoflush=should_flush)))
        if self._file is not None:
            self._stack.callback(self._file.close)

    def close(self) -> None:
        self._stack.close()
        self._file = None

    def __enter__(self) -> "Logger":
        return self

    def __exit__(self, *_) -> None:
        self.close()


def format_time(seconds: float) -> str:
    """'1d 02h 03m' / '4h 05m 06s' style (reference dnnlib/util.py:124)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // 86400}d {(s // 3600) % 24:02d}h {(s // 60) % 60:02d}m"


def open_url(url: str, cache_dir: Optional[str] = None, *,
             return_filename: bool = False):
    """Open a local path, file:// URI, or CACHED http(s) URL.

    Reference `dnnlib.util.open_url` downloads and caches; this
    environment has no egress, so http(s) URLs resolve only if a file
    matching the URL's md5 prefix is already in `cache_dir` (default
    `$EALDM_CACHE_DIR` or ~/.cache/ealdm). Raises FileNotFoundError with
    the expected cache location otherwise.
    """
    if url.startswith("file://"):
        url = url[len("file://"):]
    if not (url.startswith("http://") or url.startswith("https://")):
        if return_filename:
            return url
        return open(url, "rb")

    cache_dir = cache_dir or os.environ.get(
        "EALDM_CACHE_DIR", os.path.expanduser("~/.cache/ealdm")
    )
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    if os.path.isdir(cache_dir):
        for fname in sorted(os.listdir(cache_dir)):
            if fname.startswith(url_md5):
                path = os.path.join(cache_dir, fname)
                if return_filename:
                    return path
                return open(path, "rb")
    raise FileNotFoundError(
        f"zero-egress build: pre-seed '{cache_dir}/{url_md5}_<name>' to use "
        f"URL {url!r}"
    )


def print_module_summary(module, args: Tuple = (), kwargs: Optional[dict] = None,
                         rngs=None, max_depth: int = 2, file: IO = None) -> str:
    """Parameter/shape summary of a flax module (reference
    torch_utils/misc.py:196-266 print_module_summary).

    Uses jax.eval_shape over Module.init — no device compute. Returns the
    rendered table (also printed to `file`/stdout).
    """
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    kwargs = kwargs or {}
    if rngs is None:
        rngs = {"params": jax.random.PRNGKey(0)}

    variables = jax.eval_shape(
        lambda r: module.init(r, *args, **kwargs), rngs
    )
    params = variables.get("params", variables)

    rows: List[Tuple[str, int, str]] = []

    def visit(tree, prefix, depth):
        if hasattr(tree, "shape"):
            return
        total_here = sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(tree)
        )
        if prefix:
            rows.append((prefix, total_here, ""))
        if depth >= max_depth:
            return
        if isinstance(tree, dict) or hasattr(tree, "items"):
            for k, sub in tree.items():
                leaves = jax.tree_util.tree_leaves(sub)
                if len(leaves) == 1 and hasattr(sub, "shape"):
                    rows.append(
                        (f"{prefix}/{k}" if prefix else k,
                         int(np.prod(sub.shape)), str(tuple(sub.shape)))
                    )
                else:
                    visit(sub, f"{prefix}/{k}" if prefix else k, depth + 1)

    visit(params, "", 0)
    total = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
    )
    width = max([len(r[0]) for r in rows] + [6])
    lines = [f"{'module':<{width}}  {'params':>12}  shape"]
    for name, n, shape in rows:
        lines.append(f"{name:<{width}}  {n:>12,}  {shape}")
    lines.append(f"{'TOTAL':<{width}}  {total:>12,}")
    out = "\n".join(lines)
    print(out, file=file or sys.stdout)
    return out
