"""MobileNetV3 (LARGE) backbone — ECO's `mobile3` deep feature.

Re-design of reference `ltr/models/backbone/mobilenetv3.py` (MobileNetV3:134,
mobilenet3 factory): init_conv + six MobileBlock stages; ECO uses
output_layers=('init_conv', 'layer5') (reference pytracking/parameter/eco/
mobile3.py:92, features/deep.py:86)."""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


class SqueezeBlock(nn.Module):
    """Squeeze-excite with hard sigmoid (reference mobilenetv3.py:60-78)."""
    exp_size: int
    divide: int = 4

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))                     # (B, C)
        s = nn.Dense(self.exp_size // self.divide, name="fc0")(s)
        s = nn.relu(s)
        s = nn.Dense(self.exp_size, name="fc1")(s)
        s = h_sigmoid(s)
        return x * s[:, None, None, :]


class MobileBlock(nn.Module):
    """(reference mobilenetv3.py:81-131): 1x1 expand (no bias) + BN + act;
    depthwise kxk (WITH bias) + BN; optional SE; 1x1 project (WITH bias) + BN +
    act; residual when stride 1 and channels match."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    non_linear: str
    se: bool
    exp_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.non_linear == "RE" else h_swish
        use_connect = self.stride == 1 and self.in_channels == self.out_channels
        pad = (self.kernel_size - 1) // 2

        out = nn.Conv(self.exp_size, (1, 1), use_bias=False, name="expand_conv")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           name="expand_bn")(out)
        out = act(out)
        out = nn.Conv(self.exp_size, (self.kernel_size, self.kernel_size),
                      strides=(self.stride, self.stride),
                      padding=[(pad, pad)] * 2, feature_group_count=self.exp_size,
                      use_bias=True, name="depth_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           name="depth_bn")(out)
        if self.se:
            out = SqueezeBlock(self.exp_size, name="se")(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                      name="point_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           name="point_bn")(out)
        out = act(out)
        return x + out if use_connect else out


# (in, out, k, stride, act, SE, expand) per block, grouped into the reference's
# layer1..layer6 stages (mobilenetv3.py:164-188, LARGE)
_LARGE_STAGES = (
    ((16, 16, 3, 1, "RE", False, 16),),
    ((16, 24, 3, 2, "RE", False, 64), (24, 24, 3, 1, "RE", False, 72)),
    ((24, 40, 5, 2, "RE", True, 72), (40, 40, 5, 1, "RE", True, 120),
     (40, 40, 5, 1, "RE", True, 120)),
    ((40, 80, 3, 2, "HS", False, 240), (80, 80, 3, 1, "HS", False, 200),
     (80, 80, 3, 1, "HS", False, 184), (80, 80, 3, 1, "HS", False, 184)),
    ((80, 112, 3, 1, "HS", True, 480), (112, 112, 3, 1, "HS", True, 672)),
    ((112, 160, 5, 1, "HS", True, 672), (160, 160, 5, 2, "HS", True, 672),
     (160, 160, 5, 1, "HS", True, 960)),
)


class MobileNetV3Large(nn.Module):
    output_layers: Tuple[str, ...] = ("init_conv", "layer5")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs: Dict[str, jnp.ndarray] = {}
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=True, name="init_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="init_bn")(h)
        h = h_swish(h)
        if "init_conv" in self.output_layers:
            outputs["init_conv"] = h
            if len(outputs) == len(self.output_layers):
                return outputs
        for stage_i, blocks in enumerate(_LARGE_STAGES):
            for b_i, cfg in enumerate(blocks):
                h = MobileBlock(*cfg, name=f"layer{stage_i + 1}_{b_i}")(h,
                                                                        train=train)
            name = f"layer{stage_i + 1}"
            if name in self.output_layers:
                outputs[name] = h
                if len(outputs) == len(self.output_layers):
                    return outputs
        if "layer_out" in self.output_layers:
            h = nn.Conv(960, (1, 1), use_bias=True, name="out_conv1")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="out_bn1")(h)
            outputs["layer_out"] = h_swish(h)
        return outputs


def mobilenet3(output_layers=("init_conv", "layer5")) -> MobileNetV3Large:
    return MobileNetV3Large(output_layers=tuple(output_layers))
