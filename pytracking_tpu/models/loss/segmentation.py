"""Segmentation losses (LWL/RTS).

Re-design of reference `ltr/models/loss/segmentation.py` (LovaszSegLoss:8 over
`lovasz_loss.py`): the Lovász hinge — a convex surrogate for the IoU of binary masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (reference
    lovasz_loss.py:18-31)."""
    p = gt_sorted.shape[0]
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary Lovász hinge for one image (reference lovasz_loss.py:62-84).
    logits/labels flat (P,), labels in {0, 1}."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors_sorted, perm = jax.lax.top_k(errors, errors.shape[0])
    gt_sorted = labels[perm]
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def lovasz_seg_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean per-image Lovász hinge (reference segmentation.py:8-25).
    logits/labels (..., H, W)."""
    flat_logits = logits.reshape(-1, logits.shape[-2] * logits.shape[-1])
    flat_labels = labels.reshape(-1, labels.shape[-2] * labels.shape[-1])
    return jax.vmap(lovasz_hinge)(flat_logits, flat_labels).mean()


def balanced_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Class-balanced binary cross entropy on mask logits (used by LWL stage 1)."""
    pos = labels
    neg = 1.0 - labels
    bce = jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    n_pos = jnp.clip(pos.sum(), 1.0, None)
    n_neg = jnp.clip(neg.sum(), 1.0, None)
    return 0.5 * (jnp.sum(bce * pos) / n_pos + jnp.sum(bce * neg) / n_neg)
