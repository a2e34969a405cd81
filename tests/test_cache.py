"""Persistent-compilation-cache wiring (utils/cache.py).

The cache was verified live on the relay ('axon') backend: a fresh
process re-requesting an identical program logs a persistent-cache hit
and loads the executable in ~60ms instead of recompiling. These tests
cover the wiring, not the backend behavior.
"""

import ambigram_tpu.utils.cache as cache_mod


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("AMBIGRAM_NO_XLA_CACHE", "1")
    monkeypatch.setattr(cache_mod, "_ENABLED", False)
    assert cache_mod.enable_compilation_cache() == ""


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    import jax

    monkeypatch.delenv("AMBIGRAM_NO_XLA_CACHE", raising=False)
    monkeypatch.setenv("AMBIGRAM_XLA_CACHE_DIR", str(tmp_path / "xc"))
    monkeypatch.setattr(cache_mod, "_ENABLED", False)
    d = cache_mod.enable_compilation_cache()
    assert d == str(tmp_path / "xc")
    import os

    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: a second call with a different env does not rebind
    monkeypatch.setenv("AMBIGRAM_XLA_CACHE_DIR", str(tmp_path / "other"))
    cache_mod.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == d
