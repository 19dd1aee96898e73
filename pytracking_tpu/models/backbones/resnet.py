"""ResNet backbone with selectable intermediate outputs, NHWC flax.linen.

Re-design of reference `ltr/models/backbone/resnet.py` (ResNet:95, BasicBlock, Bottleneck,
resnet18:224, resnet50:264) with the same capabilities: multi-layer feature outputs
('conv1', 'layer1'..'layer4', 'fc'), dilation instead of stride for the last stages, and
frozen-layer support (handled at the optimizer level in training — we expose
`frozen_param_filter` so the trainer can zero those gradients; inference is stateless).

Layout is NHWC with bfloat16-friendly compute; BatchNorm uses running statistics at
tracking time. Weight porting from torchvision-style checkpoints transposes OIHW→HWIO
(see utils/port_weights.py).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = None          # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation), use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = None          # compute dtype (params stay float32)
    stride_in_1x1: bool = False
    # stride_in_1x1=True is the Caffe2/Detectron convention (stride on conv1, not
    # conv2) used by the reference's maskrcnn backbone (resnet_mrcnn.py:21-31),
    # which LWL/RTS checkpoints are trained with.

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        out = nn.Conv(self.planes, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(s3, s3),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation), use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet trunk returning a dict of the requested intermediate features.

    Attributes:
      block: 'basic' or 'bottleneck'.
      layers: blocks per stage, e.g. (2, 2, 2, 2) for R18, (3, 4, 6, 3) for R50.
      output_layers: subset of ('conv1','layer1','layer2','layer3','layer4').
      dilation_factor: 1 (standard), 2 or 4 — replaces stride by dilation in the last
        stage(s) like the reference (resnet.py:114-130), for dense prediction (LWL/RTS).
    """
    block: str = "bottleneck"
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    output_layers: Tuple[str, ...] = ("layer2", "layer3")
    dilation_factor: int = 1
    base_width: int = 64
    stride_in_1x1: bool = False   # Detectron/maskrcnn stride convention (LWL/RTS)
    dtype: Any = None
    # compute dtype for convs/BN (e.g. jnp.bfloat16: halves HBM traffic + doubles MXU
    # rate on TPU); parameters remain float32, outputs are cast back to float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        Block = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        outputs = {}
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if "conv1" in self.output_layers:
            outputs["conv1"] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # stride/dilation schedule per stage (reference resnet.py:114-130)
        if self.dilation_factor == 1:
            strides, dilations = [1, 2, 2, 2], [1, 1, 1, 1]
        elif self.dilation_factor == 2:
            strides, dilations = [1, 2, 2, 1], [1, 1, 1, 2]
        elif self.dilation_factor == 4:
            strides, dilations = [1, 2, 1, 1], [1, 1, 2, 4]
        else:
            raise ValueError("dilation_factor must be 1, 2 or 4")

        planes = [self.base_width * (2 ** i) for i in range(4)]
        in_ch = 64
        for stage in range(4):
            for b in range(self.layers[stage]):
                stride = strides[stage] if b == 0 else 1
                need_ds = (b == 0) and (stride != 1 or in_ch != planes[stage] * expansion)
                kw = {}
                if self.block != "basic":
                    kw["stride_in_1x1"] = self.stride_in_1x1
                x = Block(planes[stage], stride=stride, dilation=dilations[stage],
                          downsample=need_ds, dtype=self.dtype,
                          name=f"layer{stage + 1}_{b}", **kw)(x, train=train)
                in_ch = planes[stage] * expansion
            name = f"layer{stage + 1}"
            if name in self.output_layers:
                outputs[name] = x
        if self.dtype is not None:
            outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
        return outputs


def resnet18(output_layers=("layer2", "layer3"), dilation_factor=1, dtype=None) -> ResNet:
    """ResNet-18 (reference resnet.py:224)."""
    return ResNet(block="basic", layers=(2, 2, 2, 2), output_layers=tuple(output_layers),
                  dilation_factor=dilation_factor, dtype=dtype)


def resnet50(output_layers=("layer2", "layer3"), dilation_factor=1, dtype=None) -> ResNet:
    """ResNet-50 (reference resnet.py:264)."""
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                  output_layers=tuple(output_layers), dilation_factor=dilation_factor,
                  dtype=dtype)


def resnet50_mrcnn(output_layers=("layer1", "layer2", "layer3", "layer4"),
                   dilation_factor=1, dtype=None) -> ResNet:
    """Maskrcnn-benchmark ResNet-50 (reference ltr/models/backbone/resnet_mrcnn.py):
    Detectron stride-in-1x1 convention. Pair with `normalize_image_bgr255` — the
    pretrained weights are Caffe2 BGR-255 models (reference
    pytracking/parameter/lwl/lwl_ytvos.py:35-37)."""
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                  output_layers=tuple(output_layers), dilation_factor=dilation_factor,
                  stride_in_1x1=True, dtype=dtype)


def resnet101(output_layers=("layer2", "layer3"), dilation_factor=1, dtype=None) -> ResNet:
    """ResNet-101 (for ToMP-101; reference resnet.py:284)."""
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3),
                  output_layers=tuple(output_layers), dilation_factor=dilation_factor,
                  dtype=dtype)


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize_image(im: jnp.ndarray) -> jnp.ndarray:
    """ImageNet mean/std normalization of a 0-255 NHWC image
    (reference features/net_wrappers.py:55-68)."""
    return (im / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


CAFFE_BGR_MEAN = jnp.array([102.9801, 115.9465, 122.7717], jnp.float32)


def normalize_image_bgr255(im: jnp.ndarray) -> jnp.ndarray:
    """Caffe2 'bgr255' normalization for maskrcnn backbones: RGB 0-255 input is
    channel-flipped to BGR and mean-subtracted, std 1 (reference
    features/net_wrappers.py:55-68 with image_format='bgr255',
    parameter/lwl/lwl_ytvos.py:35-37)."""
    return im[..., ::-1] - CAFFE_BGR_MEAN
