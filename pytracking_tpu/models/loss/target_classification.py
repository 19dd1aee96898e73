"""Target classification losses.

Re-design of reference `ltr/models/loss/target_classification.py`:
  LBHinge (:6)                      -> `lbhinge`
  IsTargetCellLoss (:88)            -> `is_target_cell_loss`
  TrackingClassificationAccuracy (:131) -> `tracking_classification_accuracy`
  FocalLoss (:169)                  -> `focal_loss`
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lbhinge(prediction: jnp.ndarray, label: jnp.ndarray, threshold: float = 0.05,
            clip: float | None = None) -> jnp.ndarray:
    """Loss that uses a 'hinge' on the lower bound: MSE where label > threshold
    (target region), hinge max(0, pred)² elsewhere (reference
    target_classification.py:6-31)."""
    negative_mask = (label < threshold).astype(prediction.dtype)
    positive_mask = 1.0 - negative_mask
    pred = negative_mask * jax.nn.relu(prediction) + positive_mask * prediction
    target = positive_mask * label
    loss = jnp.mean((pred - target) ** 2)
    if clip is not None:
        loss = jnp.minimum(loss, clip)
    return loss


def is_target_cell_loss(prediction: jnp.ndarray, label: jnp.ndarray,
                        use_logits: bool = True) -> jnp.ndarray:
    """BCE on whether a cell contains the target (reference :88-128)."""
    if use_logits:
        return jnp.mean(jnp.maximum(prediction, 0) - prediction * label
                        + jnp.log1p(jnp.exp(-jnp.abs(prediction))))
    eps = 1e-7
    p = jnp.clip(prediction, eps, 1 - eps)
    return -jnp.mean(label * jnp.log(p) + (1 - label) * jnp.log(1 - p))


def tracking_classification_accuracy(prediction: jnp.ndarray, label: jnp.ndarray,
                                     threshold: float = 0.25) -> jnp.ndarray:
    """Fraction of frames where the score peak is inside the labeled target region
    (reference :131-166). prediction/label: (..., H, W)."""
    pred_flat = prediction.reshape(prediction.shape[:-2] + (-1,))
    label_flat = label.reshape(label.shape[:-2] + (-1,))
    pred_idx = jnp.argmax(pred_flat, axis=-1)
    label_at_peak = jnp.take_along_axis(label_flat, pred_idx[..., None], axis=-1)[..., 0]
    label_max = label_flat.max(axis=-1)
    correct = jnp.where(label_max > threshold, label_at_peak > threshold,
                        pred_flat.max(-1) < threshold)
    return correct.mean()


def focal_loss(prediction: jnp.ndarray, label: jnp.ndarray, alpha: float = 0.25,
               gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss on sigmoid scores with a Gaussian target (ToMP-style, reference
    :169-199): positives are cells with label==1."""
    prob = jax.nn.sigmoid(prediction)
    pos = (label >= 1.0).astype(prediction.dtype)
    pt = jnp.where(pos > 0, prob, 1 - prob)
    alpha_t = jnp.where(pos > 0, alpha, 1 - alpha)
    w = alpha_t * (1 - pt) ** gamma
    bce = -jnp.log(jnp.clip(pt, 1e-7, 1.0))
    return jnp.sum(w * bce) / jnp.maximum(pos.sum(), 1.0)
