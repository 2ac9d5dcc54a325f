"""Persistent XLA compilation cache.

Full-train-graph compiles take 10–25 minutes through remote-compile tunnels;
caching them on disk makes reruns instant. Called by the CLIs and bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "TRIPLED_COMPILE_CACHE", os.path.expanduser("~/.cache/tripled_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
