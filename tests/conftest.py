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

jax.config.update("jax_platforms", "cpu")
