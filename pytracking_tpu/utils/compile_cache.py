"""Persistent XLA compilation cache (the warm-start story).

The reference's eager trackers start tracking instantly; under jit the first
DiMP-50 initialize() pays a full XLA compile — measured 34-300 s wall on a
1-vCPU host driving a shared TPU compile service (the variance is server
load). JAX's persistent compilation cache serializes the compiled executables
keyed by HLO hash, so every process after the first loads the executable in
milliseconds instead of recompiling:

    cold   initialize(): 34-300 s (compile)
    warm   initialize(): ~2 s    (cache load + device upload)

`enable()` is called at package import and by bench.py, the CLI entry points
(run_tracker/run_video/run_webcam/run_vot/run_experiment), and the evaluation
harness. Seed the cache once per machine with `python scripts/warm_cache.py`
(or just run anything once). Opt out with PYTRACKING_TPU_COMPILE_CACHE=off
(legacy alias: PYTRACKING_TPU_COMPILATION_CACHE=0); point it elsewhere with
PYTRACKING_TPU_COMPILE_CACHE=<dir>.

Safety: entries are keyed by the HLO hash + compile options + device kind +
jax version, so code changes can never load a stale executable — they just
miss and recompile. The CPU backend is the exception: its cache entries are
machine-code blobs specialized to the compiling host's microarchitecture
(loading them on a different host generation risks SIGILL — observed as AOT
machine-mismatch errors in CI), so the cache stays TPU-only unless an explicit
directory is given.
"""

from __future__ import annotations

import os

_enabled = False


def _disabled_by_env() -> bool:
    if os.environ.get("PYTRACKING_TPU_COMPILE_CACHE", "").lower() in (
            "0", "off", "false"):
        return True
    return os.environ.get("PYTRACKING_TPU_COMPILATION_CACHE", "1") == "0"


def _explicit_dir() -> str | None:
    env = os.environ.get("PYTRACKING_TPU_COMPILE_CACHE", "")
    if env and env.lower() not in ("0", "off", "false"):
        return env
    return None


def cache_dir() -> str:
    """Resolve the cache directory: PYTRACKING_TPU_COMPILE_CACHE=<dir>, legacy
    PYTRACKING_TPU_CACHE_DIR, else ~/.cache/pytracking_tpu_jax (the default
    since round 1 — existing warm entries stay warm)."""
    env = _explicit_dir()
    if env:
        return env
    return os.environ.get("PYTRACKING_TPU_CACHE_DIR",
                          os.path.expanduser("~/.cache/pytracking_tpu_jax"))


def enable(directory: str | None = None) -> str | None:
    """Turn on the persistent compilation cache process-wide. Idempotent;
    returns the cache dir, or None if disabled (env opt-out, or CPU backend
    without an explicit directory)."""
    global _enabled
    if _disabled_by_env():
        return None
    if directory is None and _explicit_dir() is None:
        # TPU-only by default: CPU entries are host-microarch-specific AOT blobs
        if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
            return None
    import jax

    if directory is None and _explicit_dir() is None \
            and jax.config.jax_platforms and \
            jax.config.jax_platforms.split(",")[0] == "cpu":
        return None

    if _enabled:
        return jax.config.jax_compilation_cache_dir
    if directory is None and jax.config.jax_compilation_cache_dir:
        # user already configured a cache through jax itself — respect it
        _enabled = True
        return jax.config.jax_compilation_cache_dir
    d = directory or cache_dir()
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything: on this host even trivial compiles cost ~0.5 s of
    # compile-service round-trip, and entries are a few KB. min_compile_time
    # must be 0, not merely small: the remote compile service has its own
    # HLO cache, and when it hits, the client-side measured compile time can
    # fall under any threshold — observed as a first process that never
    # persisted its big executables, so the SECOND process still paid a
    # full compile (113 s init) before the entries finally landed
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return d
