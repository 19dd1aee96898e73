"""ECO with a MobileNetV3 backbone (reference pytracking/parameter/eco/mobile3.py):
init_conv (stride 2, no pooling) + layer5 (stride 16), power-2 normalized."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.backbones.mobilenetv3 import mobilenet3
from pytracking_tpu.parameter.eco.default import _ECOBackbone
from pytracking_tpu.trackers.eco import ECOParams
from pytracking_tpu.utils.loading import load_or_init_variables


def parameters() -> TrackerSpec:
    params = ECOParams(
        feature_blocks=(("init_conv", 1), ("layer5", 1)),
        blocks=((2, 16, 1 / 16, 0.4, 10e-3), (16, 64, 1 / 4, 0.6, 50e-3)),
    )
    env = env_settings()
    net = _ECOBackbone(mobilenet3(output_layers=("init_conv", "layer5")))
    variables = load_or_init_variables(
        net, (jnp.zeros((1, 64, 64, 3)),),
        cache_path=os.path.join(env.network_path, "eco_mobile3_backbone_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
