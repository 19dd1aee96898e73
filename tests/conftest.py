"""Test configuration: force CPU backend with 8 virtual devices so the whole suite
(including multi-chip sharding tests) runs without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# the persistent compilation cache stores machine-specific CPU AOT blobs; loading them
# on a different host generation risks SIGILL — keep the cache TPU-only
os.environ["PYTRACKING_TPU_COMPILATION_CACHE"] = "0"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _isolate_pytracking_env():
    """Tests that point PYTRACKING_TPU_* env paths at tmp fixtures must not leak
    them into later tests (e.g. a leftover ATTRIBUTE_SPECS_PATH shadows the
    bundled attribute specs)."""
    saved = {k: v for k, v in os.environ.items() if k.startswith("PYTRACKING_TPU_")}
    yield
    for k in [k for k in os.environ if k.startswith("PYTRACKING_TPU_")]:
        if k not in saved:
            del os.environ[k]
    os.environ.update(saved)
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None
