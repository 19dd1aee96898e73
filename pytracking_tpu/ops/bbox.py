"""Bounding-box parametrizations and mask→box conversion.

Re-design of reference `ltr/data/bounding_box_utils.py` (rect_to_rel:4, rel_to_rect:19,
masks_to_bboxes:33). Pure jnp; works batched on (..., 4) xywh boxes.
"""

from __future__ import annotations

import jax.numpy as jnp


def rect_to_rel(bb: jnp.ndarray, sz_norm: jnp.ndarray | None = None) -> jnp.ndarray:
    """(x, y, w, h) -> relative parametrization (cx/σ, cy/σ, log w, log h) where σ is
    sz_norm (default: the box's own size) — the space PrDiMP refines boxes in
    (reference bounding_box_utils.py:4-16)."""
    c = bb[..., :2] + 0.5 * bb[..., 2:]
    if sz_norm is None:
        c_rel = c / bb[..., 2:]
    else:
        c_rel = c / sz_norm
    sz_rel = jnp.log(bb[..., 2:])
    return jnp.concatenate([c_rel, sz_rel], axis=-1)


def rel_to_rect(bb: jnp.ndarray, sz_norm: jnp.ndarray | None = None) -> jnp.ndarray:
    """Inverse of rect_to_rel (reference bounding_box_utils.py:19-30)."""
    sz = jnp.exp(bb[..., 2:])
    if sz_norm is None:
        c = bb[..., :2] * sz
    else:
        c = bb[..., :2] * sz_norm
    return jnp.concatenate([c - 0.5 * sz, sz], axis=-1)


def masks_to_bboxes(mask: jnp.ndarray, fmt: str = "c") -> jnp.ndarray:
    """Tight bounding box of a binary mask (reference bounding_box_utils.py:33-73).
    mask (..., H, W); fmt 'c' = (cx, cy, w, h), 't' = (x, y, w, h), 'v' = (x1,y1,x2,y2).
    Returns zeros for empty masks."""
    H, W = mask.shape[-2], mask.shape[-1]
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    m = mask > 0
    any_ = m.any(axis=(-2, -1))
    big = jnp.float32(1e9)
    ys = jnp.where(m.any(-1), yy, big)
    y1 = ys.min(-1)
    ys = jnp.where(m.any(-1), yy, -big)
    y2 = ys.max(-1)
    xs = jnp.where(m.any(-2), xx, big)
    x1 = xs.min(-1)
    xs = jnp.where(m.any(-2), xx, -big)
    x2 = xs.max(-1)
    x1, y1, x2, y2 = [jnp.where(any_, v, 0.0) for v in (x1, y1, x2, y2)]
    w = jnp.where(any_, x2 - x1 + 1, 0.0)
    h = jnp.where(any_, y2 - y1 + 1, 0.0)
    if fmt == "v":
        return jnp.stack([x1, y1, x2, y2], axis=-1)
    if fmt == "c":
        return jnp.stack([x1 + 0.5 * (w - 1), y1 + 0.5 * (h - 1), w, h], axis=-1)
    return jnp.stack([x1, y1, w, h], axis=-1)
