"""Persistent XLA compilation cache.

ViT-L compiles take 1-3 minutes through this environment's TPU tunnel;
caching compiled executables across processes makes reruns (CLIs, bench,
sweeps) start in seconds. Off the hot path — call once at entry."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    try:
        import jax
        cache_dir = path or os.environ.get(
            "MISSM_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "missm_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
