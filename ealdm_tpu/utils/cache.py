"""Persistent XLA compilation cache (compile once across processes)."""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/ealdm_tpu_xla")


def enable_compile_cache(directory: str | None = None):
    """Turn on jax's persistent compilation cache; safe to call repeatedly.

    No-op under the axon remote-compile backend (compilation happens on the
    remote service there and the persistent cache stalls the handshake).
    """
    import jax

    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return None
    directory = directory or os.environ.get("EALDM_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(directory, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return directory
