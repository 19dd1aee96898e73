"""ResNet18-VGG-m1 hybrid backbone (ECO's deep feature net).

Re-design of reference `ltr/models/backbone/resnet18_vggm.py` (ResNetVGGm1:38):
a standard ResNet-18 trunk plus a parallel VGG-M first conv branch ('vggconv1':
7x7/2 conv -> ReLU -> cross-channel LRN). ECO's default parameters use
vggconv1 + layer3 (reference pytracking/parameter/eco/default.py:92).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones.resnet import BasicBlock


def spatial_cross_map_lrn(x: jnp.ndarray, local_size: int = 5,
                          alpha: float = 0.0005, beta: float = 0.75,
                          k: float = 2.0) -> jnp.ndarray:
    """Across-channel local response normalization (reference
    resnet18_vggm.py:9-35): x / (k + alpha * mean_{window}(x^2))^beta, where the
    channel-window mean zero-pads and always divides by local_size
    (AvgPool3d count_include_pad semantics). NHWC layout, window on C."""
    sq = x * x
    pad = (local_size - 1) // 2
    div = jax.lax.reduce_window(
        sq, 0.0, jax.lax.add, (1, 1, 1, local_size), (1, 1, 1, 1),
        [(0, 0), (0, 0), (0, 0), (pad, pad)]) / local_size
    return x / (k + alpha * div) ** beta


class ResNet18VGGm1(nn.Module):
    """output_layers subset of ('vggconv1', 'conv1', 'layer1'..'layer4')."""
    output_layers: Tuple[str, ...] = ("vggconv1", "layer3")
    dtype: Any = None          # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs: Dict[str, jnp.ndarray] = {}
        if "vggconv1" in self.output_layers:
            c1 = nn.Conv(96, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                         use_bias=True, dtype=self.dtype, name="vggmconv1")(x)
            outputs["vggconv1"] = spatial_cross_map_lrn(nn.relu(c1))
            if len(outputs) == len(self.output_layers):
                return outputs

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        if "conv1" in self.output_layers:
            outputs["conv1"] = h
            if len(outputs) == len(self.output_layers):
                return outputs
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        layers = (2, 2, 2, 2)
        planes = (64, 128, 256, 512)
        in_ch = 64
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for b in range(layers[stage]):
                s = stride if b == 0 else 1
                need_ds = (b == 0) and (s != 1 or in_ch != planes[stage])
                h = BasicBlock(planes[stage], stride=s, downsample=need_ds,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(h, train=train)
                in_ch = planes[stage]
            name = f"layer{stage + 1}"
            if name in self.output_layers:
                outputs[name] = h
                if len(outputs) == len(self.output_layers):
                    return outputs
        return outputs


def resnet18_vggmconv1(output_layers=("vggconv1", "layer3"),
                       dtype=None) -> ResNet18VGGm1:
    return ResNet18VGGm1(output_layers=tuple(output_layers), dtype=dtype)
