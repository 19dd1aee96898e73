"""Actors: loss computation on top of a network forward.

Re-design of reference `ltr/actors/tracking.py` (DiMPActor:6): an actor is a pure
function `(params, batch_stats, batch) -> (loss, (stats, new_batch_stats))` suitable for
`jax.value_and_grad(..., has_aux=True)` — the trainer differentiates it and pjit-shards
the batch over the device mesh.

Batch layout (frame-major like the reference's stack_dim=1 loaders, ltr/data/loader.py):
  train_images (Ntrain, S, H, W, 3), test_images (Ntest, S, H, W, 3),
  train_anno (Ntrain, S, 4), test_proposals (Ntest, S, P, 4),
  proposal_iou (Ntest, S, P), test_label (Ntest, S, h, w).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from pytracking_tpu.models.loss.target_classification import (
    lbhinge, tracking_classification_accuracy)


def make_dimp_actor(net, loss_weight: Dict[str, float] | None = None,
                    hinge_threshold: float = 0.05, train: bool = True):
    """DiMP training objective (reference actors/tracking.py:6-71): weighted sum of
    IoU-prediction MSE and LBHinge classification loss over ALL optimizer iterates."""
    loss_weight = loss_weight or {"iou": 1.0, "test_clf": 100.0, "test_init_clf": 100.0,
                                  "test_iter_clf": 400.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            (target_scores, iou_pred), mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_anno"], batch["test_proposals"], train=True,
                mutable=["batch_stats"])
            new_batch_stats = mutated["batch_stats"]
        else:
            target_scores, iou_pred = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_anno"], batch["test_proposals"], train=False)
            new_batch_stats = batch_stats

        loss_iou = jnp.mean((iou_pred - batch["proposal_iou"]) ** 2)

        label = batch["test_label"][..., None]           # (Ntest, S, h, w, 1)
        n_iters = target_scores.shape[0]
        clf_losses = jnp.stack([lbhinge(target_scores[i], label, hinge_threshold)
                                for i in range(n_iters)])
        loss_target_clf = loss_weight.get("test_clf", 0) * clf_losses[-1]
        loss_init_clf = loss_weight.get("test_init_clf", 0) * clf_losses[0]
        loss_iter_clf = loss_weight.get("test_iter_clf", 0) * jnp.mean(clf_losses[1:-1]) \
            if n_iters > 2 else 0.0

        loss = loss_weight.get("iou", 0) * loss_iou + loss_target_clf \
            + loss_init_clf + loss_iter_clf

        acc = tracking_classification_accuracy(target_scores[-1][..., 0],
                                               batch["test_label"])
        stats = {"Loss/total": loss, "Loss/iou": loss_iou,
                 "Loss/target_clf": loss_target_clf, "ClfTrain/test_acc": acc}
        return loss, (stats, new_batch_stats)

    return actor
