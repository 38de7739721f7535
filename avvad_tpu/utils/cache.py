"""Persistent XLA compilation cache.

The target TPU environment compiles through a remote service where large
programs (ResNet towers, long LSTM scans) take minutes; the persistent
cache makes every re-run after the first start in seconds. Called by all
CLI entry points and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("AVVAD_JAX_CACHE")
                 or os.path.expanduser("~/.cache/avvad_tpu/jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
