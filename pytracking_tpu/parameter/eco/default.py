"""ECO default parameters (reference pytracking/parameter/eco/default.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.trackers.eco import ECOParams
from pytracking_tpu.utils.loading import load_or_init_variables

import flax.linen as nn


class _ECOBackbone(nn.Module):
    """Thin wrapper exposing extract_backbone like the tracking nets."""
    feature_extractor: nn.Module

    def extract_backbone(self, im, train: bool = False):
        x = backbones.normalize_image(im)
        out = self.feature_extractor(x, train=train)
        # the Fourier pipeline downstream is f32/complex64 — cast back when the
        # backbone computes in bf16 (PYTRACKING_TPU_BF16_BACKBONE / _BF16)
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    def __call__(self, im, train: bool = False):
        return self.extract_backbone(im, train=train)


def parameters() -> TrackerSpec:
    """Reference feature stack (parameter/eco/default.py:92): ResNet18-VGG-m1
    vggconv1 (pooled x2 -> stride 4) + layer3, power-2 normalized."""
    from pytracking_tpu.models.backbones.vggm_resnet import resnet18_vggmconv1

    params = ECOParams()
    env = env_settings()
    # same bf16 knobs as dimp50.py: backbone convs in bf16 (params stay f32;
    # features cast back to f32 before the Fourier pipeline)
    bf16 = os.environ.get("PYTRACKING_TPU_BF16_BACKBONE", "0") == "1" or \
        os.environ.get("PYTRACKING_TPU_BF16", "0") == "1"
    net = _ECOBackbone(resnet18_vggmconv1(
        output_layers=("vggconv1", "layer3"),
        dtype=jnp.bfloat16 if bf16 else None))
    variables = load_or_init_variables(
        net, (jnp.zeros((1, 64, 64, 3)),),
        cache_path=os.path.join(env.network_path, "eco_vggm_backbone_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
