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

# ---- test tiers (auto-applied by module):
#   `pytest -m smoke`   — ops/geometry/loss-level tests with no full networks:
#                         the per-commit tier (~3 min on a 1-vCPU host).
#   `pytest -m fast`    — smoke + every unit/trace-parity test (full nets on
#                         CPU; ~40 min measured on the 1-vCPU CI host — the
#                         trace-parity tests each run BOTH torch and flax
#                         full-network stacks).
#   `pytest -m harness` — whole-harness end-to-end parity, minutes each.
#   `pytest -m slow_vos`— full-resolution VOS whole-harness, tens of minutes.
# Measured wall-times are recorded in README.
_SLOW_VOS_MODULES = {"test_whole_harness_vos_multiobj"}
_HARNESS_MODULES = {
    "test_whole_harness_auc_parity",
    "test_whole_harness_families2",
    "test_bf16_harness_gate",
    "test_training_convergence",
}
_SMOKE_MODULES = {
    "test_ops", "test_solvers", "test_fourier", "test_dcf", "test_losses",
    "test_optim", "test_prroi_pool", "test_port_weights", "test_native_image",
    "test_dataset_adapters", "test_train_datasets", "test_evaluation_harness",
    "test_misc_surfaces", "test_video_generic", "test_shape_buckets",
    "test_data_pipeline_round2", "test_compile_cache",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_VOS_MODULES:
            item.add_marker(pytest.mark.slow_vos)
        elif mod in _HARNESS_MODULES:
            item.add_marker(pytest.mark.harness)
        else:
            item.add_marker(pytest.mark.fast)
            if mod in _SMOKE_MODULES:
                item.add_marker(pytest.mark.smoke)


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
