"""Persistent XLA compilation cache.

Compiles through this environment's tunneled TPU backend can take minutes;
the persistent cache makes every subsequent process (test reruns, the
driver's bench run, fallback subprocesses) reuse the compiled executables.
Safe to call post-import (the backend is initialized lazily).
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = str(Path(__file__).resolve().parents[2] / ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:
        pass  # older/newer jax flag names; cache is best-effort
    return cache_dir
