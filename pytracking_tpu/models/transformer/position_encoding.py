"""Sine positional encodings with anti-aliasing (ToMP/TaMOs).

Re-design of reference `ltr/models/transformer/position_encoding.py`
(NerfPositionalEncoding:6, PositionEmbeddingSine:33, 'lin_sine' with
avoid_aliasing). Functional: returns (H, W, C) given a static grid size.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def position_embedding_sine(shape: Tuple[int, int], d_model: int,
                            max_spatial_resolution: int) -> jnp.ndarray:
    """(H, W) grid -> (H, W, d_model) embedding. num_pos_feats = d_model//2 per axis;
    depth = num_pos_feats//2 sin+cos pairs, linear bases i=1..depth scaled by
    max_res/depth (reference position_encoding.py:12-30, 47-59)."""
    H, W = shape
    depth = (d_model // 2) // 2
    factor = max_spatial_resolution / depth
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    yy = jnp.broadcast_to(y[:, None], (H, W))
    xx = jnp.broadcast_to(x[None, :], (H, W))
    pos = jnp.stack([xx, yy], axis=-1)                       # (H, W, 2) — x first
    bases = jnp.arange(1, depth + 1, dtype=jnp.float32)
    # reference layout (NerfPositionalEncoding.forward): cat over [sin(b·pos) for
    # each basis b] then [cos(b·pos)] — so within each basis the (x, y) pair stays
    # adjacent: [..., sin(b1·x), sin(b1·y), sin(b2·x), ..., cos(b1·x), cos(b1·y), ...]
    ang = bases[None, None, :, None] * factor * math.pi * pos[..., None, :]  # (H,W,depth,2)
    sin = jnp.sin(ang).reshape(H, W, -1)
    cos = jnp.cos(ang).reshape(H, W, -1)
    return jnp.concatenate([sin, cos], axis=-1)              # (H, W, 4*depth)
