"""JAX runtime setup shared by all entry points.

The tunneled TPU in this environment costs ~100 s of backend-claim latency
per process and real compile time per program; the persistent compilation
cache makes every rerun of the same program near-instant. Safe to call on
any backend.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("MDE_JAX_CACHE", _DEFAULT_CACHE)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the flags
