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


def test_default_dir_is_machine_guarded(fresh_cache_state, monkeypatch, tmp_path):
    """The default cache dir ends in a host signature so XLA:CPU AOT
    executables never load across machines with different CPU features
    (the round-2 "could lead to SIGILL" dryrun warnings)."""
    monkeypatch.delenv("LDPC_JAX_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    jax.config.update("jax_compilation_cache_dir", None)
    used = cache_mod.enable_compilation_cache()
    sig = cache_mod._machine_signature()
    assert used is not None and used.endswith(os.sep + sig)
    assert sig == cache_mod._machine_signature()  # deterministic
    # signature is filesystem-safe and carries arch + feature hash
    assert "/" not in sig and sig.count("-") >= 2


def test_explicit_dir_is_used_verbatim(fresh_cache_state, monkeypatch, tmp_path):
    """An explicit cache_dir argument is NOT re-keyed (caller's choice)."""
    jax.config.update("jax_compilation_cache_dir", None)
    target = tmp_path / "mine"
    assert cache_mod.enable_compilation_cache(str(target)) == str(target)
