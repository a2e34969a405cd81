"""Persistent XLA compilation cache.

The device search compiles one program per (padded-vars, padded-rows)
bucket; on remote-compile backends a large-bucket compile costs
40-110s. The persistent cache makes every bucket a one-time cost per
machine instead of per process — the second `bfb` invocation or bench
run reuses the serialized executable from disk.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently turn on JAX's persistent compilation cache."""
    global _ENABLED
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "AMBIGRAM_XLA_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "ambigram_jax"),
        )
    if not _ENABLED:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # only executables that took real time to build are worth disk
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _ENABLED = True
    return cache_dir
