"""SuperDiMP-simple training recipe (reference
ltr/train_settings/dimp/super_dimp_simple.py): SuperDiMP operating point with the
generic residual-module steepest-descent optimizer (dimpnet50_simple)."""

from pytracking_tpu.models.tracking.dimpnet import dimpnet50_simple
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.dimp.prdimp50 import run as _run_prdimp50


def run(settings: Settings, **kwargs):
    settings.description = "SuperDiMP-simple (reference recipe defaults)"
    settings.search_area_factor = 6.0
    settings.feature_sz = 22
    settings.output_sz = settings.feature_sz * 16
    settings.center_jitter_factor = {"train": 3, "test": 5.5}
    settings.scale_jitter_factor = {"train": 0.25, "test": 0.5}
    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    net = kwargs.pop("net", None) or dimpnet50_simple(
        filter_size=settings.target_filter_sz, optim_iter=5,
        init_gauss_sigma=output_sigma * settings.feature_sz)
    return _run_prdimp50(settings, net=net, **kwargs)
