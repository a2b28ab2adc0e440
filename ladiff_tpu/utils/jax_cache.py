"""Persistent XLA compilation cache.

Big programs (the 9-layer models under a 50-step scan) take minutes to
compile via the remote TPU compiler; enabling jax's on-disk cache makes
every subsequent process start instantly.  Called by all entry points.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LADIFF_JAX_CACHE", os.path.expanduser("~/.cache/ladiff_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
