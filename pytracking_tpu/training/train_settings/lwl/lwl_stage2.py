"""LWL stage-2 training recipe (reference ltr/train_settings/lwl/lwl_stage2.py): the
stage-1 pipeline trained end-to-end WITH causal target-model refinement on the test
frames."""

from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.lwl.lwl_stage1 import run as _run_stage1


def run(settings: Settings, **kwargs):
    settings.description = "LWL stage 2 (reference recipe defaults)"
    kwargs.setdefault("num_refinement_iter", 2)
    kwargs.setdefault("ckpt_subdir", "lwl/lwl_stage2")
    return _run_stage1(settings, **kwargs)
