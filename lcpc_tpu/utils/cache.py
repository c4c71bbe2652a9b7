"""Persistent XLA compilation cache setup.

The limb-arithmetic graphs are large (W^2-ish); caching compiled executables
across processes keeps test/bench iteration fast.  Safe to call repeatedly.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("LCPC_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
