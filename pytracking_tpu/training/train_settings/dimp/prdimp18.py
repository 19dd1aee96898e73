"""PrDiMP-18 training recipe (reference ltr/train_settings/dimp/prdimp18.py): the
PrDiMP-50 recipe with the ResNet-18 KL-CE network."""

from pytracking_tpu.models.tracking.dimpnet import klcedimpnet18
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.dimp.prdimp50 import run as _run_prdimp50


def run(settings: Settings, **kwargs):
    settings.description = "PrDiMP-18 (reference recipe defaults)"
    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    net = kwargs.pop("net", None) or klcedimpnet18(
        filter_size=settings.target_filter_sz,
        gauss_sigma=output_sigma * settings.feature_sz)
    return _run_prdimp50(settings, net=net, **kwargs)
