"""Bounding-box regression losses (ToMP/TaMOs).

Re-design of reference `ltr/models/loss/bbr_loss.py` (GIoULoss:5)."""

from __future__ import annotations

import jax.numpy as jnp


def giou(pred_ltrb: jnp.ndarray, target_ltrb: jnp.ndarray):
    """Generalized IoU of LTRB-parameterized boxes about common anchor points
    (reference bbr_loss.py:5-48). pred/target (..., 4) = (l, t, r, b) ≥ 0.

    Returns (giou, iou) with the same leading shape."""
    pred_area = (pred_ltrb[..., 0] + pred_ltrb[..., 2]) * \
        (pred_ltrb[..., 1] + pred_ltrb[..., 3])
    target_area = (target_ltrb[..., 0] + target_ltrb[..., 2]) * \
        (target_ltrb[..., 1] + target_ltrb[..., 3])

    w_inter = jnp.minimum(pred_ltrb[..., 0], target_ltrb[..., 0]) + \
        jnp.minimum(pred_ltrb[..., 2], target_ltrb[..., 2])
    h_inter = jnp.minimum(pred_ltrb[..., 1], target_ltrb[..., 1]) + \
        jnp.minimum(pred_ltrb[..., 3], target_ltrb[..., 3])
    w_inter = jnp.clip(w_inter, 0.0, None)
    h_inter = jnp.clip(h_inter, 0.0, None)
    inter = w_inter * h_inter
    union = pred_area + target_area - inter
    iou = inter / jnp.clip(union, 1e-7, None)

    wc = jnp.maximum(pred_ltrb[..., 0], target_ltrb[..., 0]) + \
        jnp.maximum(pred_ltrb[..., 2], target_ltrb[..., 2])
    hc = jnp.maximum(pred_ltrb[..., 1], target_ltrb[..., 1]) + \
        jnp.maximum(pred_ltrb[..., 3], target_ltrb[..., 3])
    area_c = jnp.clip(wc * hc, 1e-7, None)
    g = iou - (area_c - union) / area_c
    return g, iou


def giou_loss(pred_ltrb: jnp.ndarray, target_ltrb: jnp.ndarray,
              mask=None) -> jnp.ndarray:
    """Mean (1 - GIoU) over (optionally masked) positions (reference ToMPActor usage,
    ltr/actors/tracking.py:517-583: samples inside the target box)."""
    g, _ = giou(pred_ltrb, target_ltrb)
    loss = 1.0 - g
    if mask is not None:
        return jnp.sum(loss * mask) / jnp.clip(mask.sum(), 1.0, None)
    return loss.mean()
