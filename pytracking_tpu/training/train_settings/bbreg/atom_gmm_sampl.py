"""ATOM GMM-sampling recipe (reference ltr/train_settings/bbreg/atom_gmm_sampl.py):
the prob-ML objective with proposals drawn from a Gaussian-mixture around the target
(mixture handled by KLDiMPProcessing's proposal sampler)."""

from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.bbreg.atom_prob_ml import \
    run as _run_prob_ml


def run(settings: Settings, **kwargs):
    settings.description = "ATOM GMM-sampling (reference recipe defaults)"
    return _run_prob_ml(settings, **kwargs)
