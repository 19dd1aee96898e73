"""SuperDiMP training recipe (reference ltr/train_settings/dimp/super_dimp.py):
PrDiMP's probabilistic objective with DiMP's discriminative optimizer at the larger
22x22 operating point (search_area_factor 6, 352px samples)."""

from pytracking_tpu.models.tracking.dimpnet import dimpnet50
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.dimp.prdimp50 import run as _run_prdimp50


def run(settings: Settings, **kwargs):
    settings.description = "SuperDiMP (reference recipe defaults)"
    # larger operating point (reference super_dimp.py:24-33)
    settings.search_area_factor = 6.0
    settings.feature_sz = 22
    settings.output_sz = settings.feature_sz * 16
    settings.center_jitter_factor = {"train": 3, "test": 5.5}
    settings.scale_jitter_factor = {"train": 0.25, "test": 0.5}
    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    net = kwargs.pop("net", None) or dimpnet50(
        filter_size=settings.target_filter_sz, optim_iter=5, optim_init_step=0.9,
        optim_init_reg=0.1, init_gauss_sigma=output_sigma * settings.feature_sz,
        num_dist_bins=100, bin_displacement=0.1, mask_init_factor=3.0,
        score_act="relu")
    return _run_prdimp50(settings, net=net, **kwargs)
