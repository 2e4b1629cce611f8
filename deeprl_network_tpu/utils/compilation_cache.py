"""Persistent XLA compilation cache: first compile of the fused train
step costs tens of seconds (remote TPU compile); caching it on disk makes
every later process start warm. Safe to call multiple times."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.expanduser("~/.cache/jax_compilation"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
