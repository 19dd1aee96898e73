"""Unit tests for utils/compile_cache.py — the warm-start story's env surface.

The TPU-side behavior (entries written, second process hits) is measured in
MODEL_ZOO.md's "Warm-start" section; here we pin the host-side contract:
env parsing, directory resolution, the CPU-backend opt-out, and that enable()
configures unconditional persistence (min compile time 0 — a nonzero
threshold silently skips persisting executables whenever the remote compile
service's own HLO cache makes the client-side compile look fast).
"""

import importlib
import os

import pytest


@pytest.fixture
def cc(monkeypatch):
    from pytracking_tpu.utils import compile_cache

    for var in ("PYTRACKING_TPU_COMPILE_CACHE", "PYTRACKING_TPU_COMPILATION_CACHE",
                "PYTRACKING_TPU_CACHE_DIR"):
        monkeypatch.delenv(var, raising=False)
    importlib.reload(compile_cache)
    return compile_cache


def test_disabled_by_env(cc, monkeypatch):
    assert not cc._disabled_by_env()
    for val in ("0", "off", "OFF", "false"):
        monkeypatch.setenv("PYTRACKING_TPU_COMPILE_CACHE", val)
        assert cc._disabled_by_env(), val
    monkeypatch.delenv("PYTRACKING_TPU_COMPILE_CACHE")
    monkeypatch.setenv("PYTRACKING_TPU_COMPILATION_CACHE", "0")  # legacy alias
    assert cc._disabled_by_env()


def test_cache_dir_resolution(cc, monkeypatch):
    assert cc.cache_dir() == os.path.expanduser("~/.cache/pytracking_tpu_jax")
    monkeypatch.setenv("PYTRACKING_TPU_CACHE_DIR", "/tmp/legacy_dir")
    assert cc.cache_dir() == "/tmp/legacy_dir"
    monkeypatch.setenv("PYTRACKING_TPU_COMPILE_CACHE", "/tmp/explicit_dir")
    assert cc.cache_dir() == "/tmp/explicit_dir"
    # "off" is a switch, not a directory
    monkeypatch.setenv("PYTRACKING_TPU_COMPILE_CACHE", "off")
    assert cc._explicit_dir() is None


def test_enable_disabled_returns_none(cc, monkeypatch):
    monkeypatch.setenv("PYTRACKING_TPU_COMPILE_CACHE", "off")
    assert cc.enable() is None
    assert not cc._enabled


def test_enable_cpu_backend_skips_without_explicit_dir(cc, monkeypatch):
    # tests run with JAX_PLATFORMS=cpu (conftest) — CPU cache entries are
    # host-microarch AOT blobs, so the default stays off
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert cc.enable() is None


def test_enable_explicit_dir_configures_unconditional_persistence(
        cc, monkeypatch, tmp_path):
    import jax

    d = str(tmp_path / "cache")
    monkeypatch.setenv("PYTRACKING_TPU_COMPILE_CACHE", d)
    prev = (jax.config.jax_enable_compilation_cache,
            jax.config.jax_compilation_cache_dir,
            jax.config.jax_persistent_cache_min_compile_time_secs,
            jax.config.jax_persistent_cache_min_entry_size_bytes)
    try:
        assert cc.enable() == d
        assert jax.config.jax_compilation_cache_dir == d
        assert jax.config.jax_enable_compilation_cache
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0
        # idempotent
        assert cc.enable() == d
    finally:
        jax.config.update("jax_enable_compilation_cache", prev[0])
        jax.config.update("jax_compilation_cache_dir", prev[1])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev[2])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev[3])
