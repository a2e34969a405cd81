"""Persistent XLA compilation cache — OPT-IN, and why.

The device search compiles one program per (padded-vars, padded-rows)
bucket (~10-25s cold per shape). JAX's persistent compilation cache
would make that once-per-machine — and it mechanically works on the
remote-compile relay ('axon') backend for small programs (a fresh
process logs `Persistent compilation cache hit` and loads a toy matmul
in ~60ms). But for SEARCH-SIZED programs the executable
serialization/deserialization through the relay costs an order of
magnitude more than the compile it saves — measured A/B on the same
S=48 program, fresh process each, one v5e via the relay:

    cache off:  first solve_device 25.1s  (includes the ~15s compile)
    cache miss: first solve_device 232.2s (compile + executable write)
    cache hit:  first solve_device 120.8s (executable load)

so the default is OFF. Opt in with AMBIGRAM_XLA_CACHE=1 (or an
explicit cache_dir) on backends with local compilation, where the
cache behaves as designed.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently turn on JAX's persistent compilation cache.
    No-op (returns "") unless AMBIGRAM_XLA_CACHE=1 is set or an
    explicit cache_dir is passed — see the module docstring for the
    measured reason."""
    global _ENABLED
    import jax

    if cache_dir is None:
        if not os.environ.get("AMBIGRAM_XLA_CACHE"):
            return ""
        cache_dir = os.environ.get(
            "AMBIGRAM_XLA_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "ambigram_jax"),
        )
    if not _ENABLED:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # only executables that took real time to build are worth disk
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:  # pragma: no cover - read-only home, etc.
            return ""
        _ENABLED = True
    return cache_dir
