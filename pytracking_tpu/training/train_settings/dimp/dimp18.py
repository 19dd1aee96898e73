"""DiMP-18 training recipe (reference ltr/train_settings/dimp/dimp18.py): the DiMP-50
recipe with the ResNet-18 network."""

from pytracking_tpu.models.tracking.dimpnet import dimpnet18
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.dimp.dimp50 import run as _run_dimp50


def run(settings: Settings, **kwargs):
    settings.description = "DiMP-18 (reference recipe defaults)"
    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    net = kwargs.pop("net", None) or dimpnet18(
        filter_size=settings.target_filter_sz, optim_iter=5,
        init_gauss_sigma=output_sigma * settings.feature_sz, num_dist_bins=100,
        bin_displacement=0.1, mask_init_factor=3.0)
    return _run_dimp50(settings, net=net, **kwargs)
