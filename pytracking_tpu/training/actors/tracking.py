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


def make_atom_actor(net):
    """ATOM IoU-prediction objective: MSE between predicted and GT IoU
    (reference ltr/actors/bbreg.py:4-29)."""

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if batch_stats is not None:
            iou_pred, mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_anno"], batch["test_proposals"], train=True,
                mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            iou_pred = net.apply(variables, batch["train_images"],
                                 batch["test_images"], batch["train_anno"],
                                 batch["test_proposals"], train=False)
            new_bs = batch_stats
        loss = jnp.mean((iou_pred - batch["proposal_iou"]) ** 2)
        return loss, ({"Loss/total": loss, "Loss/iou": loss}, new_bs)

    return actor


def make_kldimp_actor(net, loss_weight=None, train: bool = True):
    """PrDiMP training objective (reference actors/tracking.py:74-194 KLDiMPActor):
    KL-regression on proposal densities + KL-grid classification over iterates."""
    from pytracking_tpu.models.loss.kl_regression import (kl_regression,
                                                          kl_regression_grid)

    loss_weight = loss_weight or {"bb_ce": 0.01, "test_clf": 100.0,
                                  "test_init_clf": 100.0, "test_iter_clf": 400.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            (target_scores, bb_scores), mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_anno"], batch["test_proposals"], train=True,
                mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            target_scores, bb_scores = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_anno"], batch["test_proposals"], train=False)
            new_bs = batch_stats

        bb_ce = kl_regression(bb_scores, batch["proposal_density"],
                              batch["gt_density"], mc_dim=-1)
        loss_bb = loss_weight["bb_ce"] * bb_ce

        label_density = batch["test_label_density"][..., None]
        n_iters = target_scores.shape[0]
        clf = jnp.stack([kl_regression_grid(target_scores[i][..., 0],
                                            batch["test_label_density"])
                         for i in range(n_iters)])
        loss_clf = loss_weight["test_clf"] * clf[-1] + \
            loss_weight["test_init_clf"] * clf[0]
        if n_iters > 2:
            loss_clf = loss_clf + loss_weight["test_iter_clf"] * jnp.mean(clf[1:-1])

        loss = loss_bb + loss_clf
        return loss, ({"Loss/total": loss, "Loss/bb_ce": bb_ce,
                       "Loss/target_clf": clf[-1]}, new_bs)

    return actor


def make_tomp_actor(net, loss_weight=None, train: bool = True):
    """ToMP training objective (reference actors/tracking.py:517-583 ToMPActor):
    GIoU on the dense LTRB predictions inside the target box + LBHinge scores."""
    from pytracking_tpu.models.loss.bbr_loss import giou_loss

    loss_weight = loss_weight or {"bb_ce": 0.01, "giou": 1.0, "test_clf": 100.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            (scores, bbox_preds), mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_label"], batch["train_ltrb_target"], train=True,
                mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            scores, bbox_preds = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_label"], batch["train_ltrb_target"], train=False)
            new_bs = batch_stats

        target_ltrb = batch["test_ltrb_target"]
        inside = jnp.all(target_ltrb > 0, axis=-1)
        loss_giou = giou_loss(bbox_preds, target_ltrb, inside)
        label = batch["test_label"][..., None]
        loss_clf = lbhinge(scores, label)
        loss = loss_weight["giou"] * loss_giou + loss_weight["test_clf"] * loss_clf
        acc = tracking_classification_accuracy(scores[..., 0], batch["test_label"])
        return loss, ({"Loss/total": loss, "Loss/giou": loss_giou,
                       "Loss/target_clf": loss_clf, "ClfTrain/test_acc": acc},
                      new_bs)

    return actor


def make_lwl_actor(net, loss_weight=None, num_refinement_iter: int = 2,
                   train: bool = True):
    """LWL training objective (reference actors/segmentation.py:8-88 LWLActor):
    Lovász hinge on the predicted masks."""
    from pytracking_tpu.models.loss.segmentation import lovasz_seg_loss

    loss_weight = loss_weight or {"segm": 100.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            masks, mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_masks"], num_refinement_iter=num_refinement_iter,
                train=True, mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            masks = net.apply(variables, batch["train_images"],
                              batch["test_images"], batch["train_masks"],
                              num_refinement_iter=num_refinement_iter, train=False)
            new_bs = batch_stats
        loss = loss_weight["segm"] * lovasz_seg_loss(masks, batch["test_masks"])
        return loss, ({"Loss/total": loss, "Loss/segm": loss}, new_bs)

    return actor
