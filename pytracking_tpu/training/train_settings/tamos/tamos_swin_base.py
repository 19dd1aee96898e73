"""TaMOs-SwinBase training recipe (reference
ltr/train_settings/tamos/tamos_swin_base.py): the ResNet-50 recipe with the Swin-Base
backbone."""

from pytracking_tpu.models.tracking.tamosnet import tamosnet_swin_base
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.tamos.tamos_resnet50 import \
    run as _run_resnet50


def run(settings: Settings, num_objects: int = 3, output_sz: int = 288, **kwargs):
    settings.description = "TaMOs-SwinBase (reference recipe defaults)"
    net = kwargs.pop("net", None) or tamosnet_swin_base(
        num_tokens=num_objects, feature_sz=output_sz // 16)
    return _run_resnet50(settings, net=net, num_objects=num_objects,
                         output_sz=output_sz, **kwargs)
