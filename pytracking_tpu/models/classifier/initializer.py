"""Filter initializer modules for discriminative target classifiers.

Re-design of reference `ltr/models/target_classifier/initializer.py`:
  FilterPool (:9)               -> `filter_pool` (prroi_pool2d-based, pure function)
  FilterInitializerLinear (:118)-> `FilterInitializerLinear`
  FilterInitializerZero (:177)  -> `FilterInitializerZero`
  FilterInitializerSiamese(:202)-> `FilterInitializerSiamese`

Shapes: feat (N, S, H, W, C) — N images per sequence, S sequences; bb (N, S, 4) xywh in
image(-patch) coordinates; returned filter (S, fh, fw, C, 1).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.ops.prroi_pool import prroi_pool2d


def filter_pool(feat: jnp.ndarray, bb: jnp.ndarray, filter_size: int,
                feature_stride: int, pool_square: bool = False) -> jnp.ndarray:
    """Pool the target region of each sample into a (filter_size, filter_size) map
    (reference initializer.py:9-45). feat (B, H, W, C), bb (B, 4) xywh image coords.
    Returns (B, fs, fs, C)."""
    bb = bb.reshape(-1, 4).astype(jnp.float32)
    if pool_square:
        sz = jnp.sqrt(jnp.prod(bb[:, 2:4], axis=1, keepdims=True))
        tl = bb[:, :2] + bb[:, 2:] / 2 - sz / 2
        bb = jnp.concatenate([tl, jnp.broadcast_to(sz, tl.shape)], axis=1)
    rois = jnp.concatenate([bb[:, :2], bb[:, :2] + bb[:, 2:4]], axis=1)
    bidx = jnp.arange(bb.shape[0], dtype=jnp.int32)
    return prroi_pool2d(feat, rois, bidx, (filter_size, filter_size),
                        spatial_scale=1.0 / feature_stride)


class FilterInitializerLinear(nn.Module):
    """conv → PrRoIPool over target box → average over train images → size-normalize
    (reference initializer.py:118-173)."""
    filter_size: int = 4
    feature_dim: int = 256
    feature_stride: int = 16
    pool_square: bool = False
    filter_norm: bool = True
    conv_ksz: int = 3

    @nn.compact
    def __call__(self, feat: jnp.ndarray, bb: jnp.ndarray) -> jnp.ndarray:
        N, S = feat.shape[0], feat.shape[1]
        x = feat.reshape((-1,) + feat.shape[2:])
        x = nn.Conv(self.feature_dim, (self.conv_ksz, self.conv_ksz),
                    padding=[(self.conv_ksz // 2,) * 2] * 2,
                    kernel_init=nn.initializers.he_normal(), name="filter_conv")(x)
        w = filter_pool(x, bb.reshape(-1, 4), self.filter_size, self.feature_stride,
                        self.pool_square)  # (N*S, fs, fs, C)
        w = w.reshape((N, S) + w.shape[1:]).mean(axis=0)  # (S, fs, fs, C)
        if self.filter_norm:
            w = w / (self.filter_size * self.filter_size * self.feature_dim)
        return w[..., None]  # (S, fs, fs, C, 1)


class FilterInitializerZero(nn.Module):
    """All-zero filter (reference initializer.py:177-199)."""
    filter_size: int = 4
    feature_dim: int = 256

    def __call__(self, feat: jnp.ndarray, bb: jnp.ndarray) -> jnp.ndarray:
        S = feat.shape[1]
        return jnp.zeros((S, self.filter_size, self.filter_size, self.feature_dim, 1),
                         feat.dtype)


class FilterInitializerSiamese(nn.Module):
    """Pool-only initializer (reference initializer.py:202-248)."""
    filter_size: int = 4
    feature_stride: int = 16
    pool_square: bool = False
    filter_norm: bool = True

    def __call__(self, feat: jnp.ndarray, bb: jnp.ndarray) -> jnp.ndarray:
        N, S, _, _, C = feat.shape
        x = feat.reshape((-1,) + feat.shape[2:])
        w = filter_pool(x, bb.reshape(-1, 4), self.filter_size, self.feature_stride,
                        self.pool_square)
        w = w.reshape((N, S) + w.shape[1:]).mean(axis=0)
        if self.filter_norm:
            w = w / (self.filter_size * self.filter_size * C)
        return w[..., None]
