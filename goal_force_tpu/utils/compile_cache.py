"""Persistent XLA compilation cache (VERDICT round-4, item 1a).

The full-depth A14B step costs ~22 min of XLA compile from scratch — round 4
paid that out of its measurement budget every run because nothing set
jax's persistent compilation cache. Call ``enable_persistent_cache()`` before
building jitted functions in any long-geometry entry point
(scripts/measure_north_star.py, bench.py, tools/tpu_worker.py); the cache
directory survives rounds, so the compile is paid once ever per (HLO,
backend) pair. Verified working against the axon TPU runtime.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache; returns the dir (or None if
    the running jax doesn't support it)."""
    import jax

    path = path or os.environ.get("GF_JAX_CACHE_DIR",
                                  os.path.join(_REPO_ROOT, ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: the axon tunnel makes even small compiles slow
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return path
