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
# compile (remote in some environments) dominates cold-start time; cached executables
# make repeat runs start in seconds (utils/compile_cache.py — TPU-only by default,
# disable with PYTRACKING_TPU_COMPILE_CACHE=off).
try:
    from pytracking_tpu.utils import compile_cache as _compile_cache

    _compile_cache.enable()
except Exception:
    pass
