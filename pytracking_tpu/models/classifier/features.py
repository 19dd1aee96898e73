"""Classification feature extractors (backbone feature → classifier feature).

Re-design of reference `ltr/models/target_classifier/features.py`
(residual_basic_block:9, residual_basic_block_pool:31, residual_bottleneck:50): a small
residual stack with an optional final conv and InstanceL2Norm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.backbones.resnet import BasicBlock, Bottleneck
from pytracking_tpu.models.layers.blocks import instance_l2_norm


class ResidualBottleneck(nn.Module):
    """Bottleneck block(s) + optional final 3x3 conv + InstanceL2Norm
    (reference features.py:50-73). Input dim defaults to 4*feature_dim (ResNet-50
    layer3 = 1024)."""
    feature_dim: int = 256
    num_blocks: int = 1
    l2norm: bool = True
    final_conv: bool = False
    norm_scale: float = 1.0
    out_dim: int = 256
    final_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            planes = self.feature_dim if i < self.num_blocks - 1 + int(self.final_conv) \
                else self.out_dim // 4
            need_ds = x.shape[-1] != planes * 4
            x = Bottleneck(planes, downsample=need_ds, name=f"block{i}")(x, train=train)
        if self.final_conv:
            x = nn.Conv(self.out_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        strides=(self.final_stride, self.final_stride),
                        kernel_init=nn.initializers.he_normal(), name="final_conv")(x)
        if self.l2norm:
            x = instance_l2_norm(x, self.norm_scale)
        return x


class ResidualBasicBlock(nn.Module):
    """BasicBlock(s) + optional final conv + InstanceL2Norm (reference
    features.py:9-28). For ResNet-18 backbones (layer3 = 256 ch)."""
    feature_dim: int = 256
    num_blocks: int = 1
    l2norm: bool = True
    final_conv: bool = False
    norm_scale: float = 1.0
    out_dim: int = 256
    init_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.init_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i in range(self.num_blocks):
            odim = self.feature_dim if i < self.num_blocks - 1 + int(self.final_conv) \
                else self.out_dim
            need_ds = x.shape[-1] != odim
            x = BasicBlock(odim, downsample=need_ds, name=f"block{i}")(x, train=train)
        if self.final_conv:
            x = nn.Conv(self.out_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=nn.initializers.he_normal(), name="final_conv")(x)
        if self.l2norm:
            x = instance_l2_norm(x, self.norm_scale)
        return x
