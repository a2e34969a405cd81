"""Persistent-compilation-cache wiring (utils/cache.py).

The cache is OPT-IN: on the remote-compile relay backend the
executable serialization costs more than the compile it saves
(measured A/B in the module docstring), so `enable_compilation_cache`
is a no-op unless AMBIGRAM_XLA_CACHE=1 or an explicit dir is passed.
"""

import pytest

import ambigram_tpu.utils.cache as cache_mod


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """These tests bind jax's cache dir to tmp paths that vanish after
    the test; restore the prior config so later (slow-compiling) tests
    never write into a deleted directory."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_default_is_off(monkeypatch):
    monkeypatch.delenv("AMBIGRAM_XLA_CACHE", raising=False)
    monkeypatch.setattr(cache_mod, "_ENABLED", False)
    assert cache_mod.enable_compilation_cache() == ""


def test_env_opt_in_sets_jax_config(tmp_path, monkeypatch):
    import jax

    monkeypatch.setenv("AMBIGRAM_XLA_CACHE", "1")
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


def test_explicit_dir_opts_in(tmp_path, monkeypatch):
    monkeypatch.delenv("AMBIGRAM_XLA_CACHE", raising=False)
    monkeypatch.setattr(cache_mod, "_ENABLED", False)
    d = cache_mod.enable_compilation_cache(str(tmp_path / "explicit"))
    assert d == str(tmp_path / "explicit")
