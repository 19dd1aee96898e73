"""Basic NN building blocks, NHWC flax.linen.

Re-design of reference `ltr/models/layers/blocks.py` (conv_block:4, LinearBlock:23) and
`ltr/models/layers/normalization.py` (InstanceL2Norm:6). BatchNorm runs with running
statistics at tracking time (`use_running_average`), matching the reference's eval mode.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """conv → [BatchNorm] → [ReLU] (reference blocks.py:4-20)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    batch_norm: bool = True
    relu: bool = True
    padding: Optional[int] = None  # None -> kernel_size//2 ("same"-style like reference)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=self.use_bias,
                    kernel_init=nn.initializers.he_normal())(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class LinearBlock(nn.Module):
    """Flatten → Linear → [BatchNorm] → [ReLU] (reference blocks.py:23-36)."""
    out_features: int
    batch_norm: bool = True
    relu: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.out_features, use_bias=self.use_bias,
                     kernel_init=nn.initializers.he_normal())(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        if self.relu:
            x = nn.relu(x)
        return x


def instance_l2_norm(x: jnp.ndarray, scale: float = 1.0, eps: float = 1e-5,
                     size_average: bool = True) -> jnp.ndarray:
    """Instance L2 normalization over (H, W, C) per sample (reference
    normalization.py:6-20). x: (..., H, W, C) — normalized over the last three dims."""
    n = x.shape[-1] * x.shape[-2] * x.shape[-3]
    ss = jnp.sum(x * x, axis=(-1, -2, -3), keepdims=True)
    if size_average:
        return x * (scale * jnp.sqrt(n / (ss + eps)))
    return x * (scale / jnp.sqrt(ss + eps))


class InstanceL2Norm(nn.Module):
    scale: float = 1.0
    eps: float = 1e-5
    size_average: bool = True

    def __call__(self, x):
        return instance_l2_norm(x, self.scale, self.eps, self.size_average)
