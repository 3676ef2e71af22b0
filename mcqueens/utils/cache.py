"""Persistent XLA compile cache.

Compiles through the axon TPU tunnel cost minutes and dominate small runs;
caching executables on disk makes every CLI/bench invocation after the first
fast.  Call :func:`enable` early in any entry point (before first compile).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "MCQUEENS_COMPILE_CACHE", DEFAULT_DIR
    )
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
