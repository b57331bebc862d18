"""Persistent compile-cache helper: opt-out sentinels and idempotence."""

import os

import jax
import pytest

from ldpcdecoders_tpu import cache as cache_mod


@pytest.fixture
def fresh_cache_state(monkeypatch):
    """Reset the module's one-shot guard and jax's cache dir around a test."""
    old_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    monkeypatch.setattr(cache_mod, "_configured", False)
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)


@pytest.mark.parametrize("sentinel", ["off", "0", "none", "OFF"])
def test_optout_disables_both_entry_points(
    fresh_cache_state, monkeypatch, tmp_path, sentinel
):
    """LDPC_JAX_CACHE=off must disable caching in enable_compilation_cache
    too (the CLI/bench path), not create a directory named 'off'."""
    monkeypatch.setenv("LDPC_JAX_CACHE", sentinel)
    monkeypatch.chdir(tmp_path)
    jax.config.update("jax_compilation_cache_dir", None)
    assert cache_mod.enable_compilation_cache() is None
    cache_mod.ensure_default_cache()
    assert not getattr(jax.config, "jax_compilation_cache_dir", None)
    assert not (tmp_path / sentinel).exists()


def test_env_var_sets_custom_directory(fresh_cache_state, monkeypatch, tmp_path):
    target = tmp_path / "xla_cache"
    monkeypatch.setenv("LDPC_JAX_CACHE", str(target))
    jax.config.update("jax_compilation_cache_dir", None)
    assert cache_mod.enable_compilation_cache() == str(target)
    assert target.is_dir()


def test_ensure_respects_application_config(fresh_cache_state, monkeypatch, tmp_path):
    """An application-level jax_compilation_cache_dir must win."""
    monkeypatch.delenv("LDPC_JAX_CACHE", raising=False)
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    cache_mod.ensure_default_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)
