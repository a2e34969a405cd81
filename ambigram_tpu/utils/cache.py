"""Persistent XLA compilation cache.

The device search compiles one program per (padded-vars, padded-rows)
bucket; through the remote-compile relay a large-bucket compile costs
12-60s. The persistent cache makes every bucket a one-time cost per
machine instead of per process — the second `bfb` invocation or bench
run reuses the serialized executable from disk.

Verified working on the relay ('axon') backend: a fresh process
re-requesting an identical program logs `Persistent compilation cache
hit` and loads the executable in ~60ms (the r3 note claiming the relay
could not serialize executables was wrong). Every device entry point
(solver.search.solve_device, parallel.mesh.solve_cases_sharded, the
CLI) calls `enable_compilation_cache()`; set AMBIGRAM_NO_XLA_CACHE=1
to opt out (e.g. when measuring cold-compile cost deliberately).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently turn on JAX's persistent compilation cache."""
    global _ENABLED
    import jax

    if os.environ.get("AMBIGRAM_NO_XLA_CACHE"):
        return ""
    if cache_dir is None:
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
