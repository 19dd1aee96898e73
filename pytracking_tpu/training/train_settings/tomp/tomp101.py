"""ToMP-101 training recipe (reference ltr/train_settings/tomp/tomp101.py): the
ToMP-50 recipe with the ResNet-101 backbone."""

from pytracking_tpu.models.tracking.tompnet import tompnet101
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.tomp.tomp50 import run as _run_tomp50


def run(settings: Settings, **kwargs):
    settings.description = "ToMP-101 (reference recipe defaults)"
    net = kwargs.pop("net", None) or tompnet101(feature_sz=settings.feature_sz,
                                                freeze_backbone_bn=True)
    return _run_tomp50(settings, net=net, **kwargs)
