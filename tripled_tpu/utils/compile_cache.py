"""Persistent XLA compilation cache.

Full-train-graph compiles take 10–25 minutes through remote-compile tunnels;
caching them on disk makes reruns instant. Called by the CLIs and bench.

The default cache dir is REPO-LOCAL (`<repo>/.xla_cache`, committed): a
fresh container then inherits the round's warm executables, so the
driver's bench run never pays the cold 10-25-min-per-graph tunnel
compiles that blew its round-4 timeout (BENCH_r04.json rc=124 — the
driver ran with an empty ~/.cache). A key mismatch (different jax or
runtime version) just falls through to a normal compile.
"""

from __future__ import annotations

import os

_REPO_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".xla_cache",
)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("TRIPLED_COMPILE_CACHE", _REPO_CACHE)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
