"""pytracking_tpu — a TPU-native (JAX/XLA/Pallas/pjit) visual tracking and video object
segmentation framework with the capabilities of visionml/pytracking.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  ops/         functional compute primitives (dcf, fourier, solvers, prroi pooling, patches)
  models/      NHWC flax-style model zoo (backbones, classifiers, bbreg, transformers)
  trackers/    jitted per-frame trackers: (state, frame) -> (state, out), fixed-shape state
  evaluation/  dataset adapters + benchmark harness (result-format compatible w/ reference)
  analysis/    success/precision curves, score tables, VOS J&F
  training/    LTR-equivalent training stack (samplers, processing, actors, pjit trainer)
  parallel/    mesh construction, sharded train/eval steps
  utils/       params, checkpoint IO, plotting
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: tracker steps are large programs and the TPU
# compile (remote in some environments) dominates cold-start time; cached binaries make
# repeat runs start in seconds. Disable with PYTRACKING_TPU_COMPILATION_CACHE=0.
import os as _os

if _os.environ.get("PYTRACKING_TPU_COMPILATION_CACHE", "1") != "0":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("PYTRACKING_TPU_CACHE_DIR",
                            _os.path.expanduser("~/.cache/pytracking_tpu_jax")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
