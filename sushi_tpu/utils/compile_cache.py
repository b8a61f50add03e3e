"""Persistent XLA compile cache.

The batched matcher compiles a small set of (fft_size, batch) kernel
shapes; persisting them makes every process after the first start warm
(compiles are tens of seconds on TPU and worse on a small host CPU).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "sushi_tpu", "xla")
_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # never let cache setup break the pipeline
        pass
