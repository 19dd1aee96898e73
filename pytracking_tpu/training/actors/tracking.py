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

import jax
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
            # the DETR-style transformer uses dropout in training — thread the
            # per-step seed the trainer puts in the batch
            rngs = {"dropout": jax.random.PRNGKey(batch.get("rng_seed", 0))}
            (scores, bbox_preds), mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_label"], batch["train_ltrb_target"], train=True,
                mutable=["batch_stats"], rngs=rngs)
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


def make_kys_actor(net, loss_weight=None, train: bool = True,
                   dimp_jitter_fn=None):
    """KYS training objective (reference actors/tracking.py:197-386 KYSActor):
    learn the DiMP filter on the train frames, then SCAN over the test sequence
    propagating the recurrent scene state and accumulating fused/appearance
    classification losses plus is_target auxiliary BCE terms. The reference's
    Python frame loop becomes a `lax.scan` so the whole sequence compiles to one
    XLA while-free program.

    Batch: train_images (Ntr,S,H,W,3), train_anno (Ntr,S,4),
    test_images (T,S,H,W,3), test_label (T,S,h,w), optional test_valid_image (T,S)
    and jitter_seed (S,) feeding `dimp_jitter_fn`.

    `dimp_jitter_fn(key, score, label)` (DiMPScoreJittering,
    reference kys.py:136-140 / actors/tracking.py:288-290) corrupts the
    appearance-model scores of the test frames before the propagation module
    sees them; the dimp_clf loss is computed on the jittered scores, exactly as
    the reference does.
    """
    import jax
    import jax.numpy as jnp
    from pytracking_tpu.models.kys.cost_volume import cost_volume_abs

    loss_weight = loss_weight or {"test_clf": 0.01, "dimp_clf": 0.0001,
                                  "is_target": 0.1, "is_target_after_prop": 0.1,
                                  "test_clf_orig": 0.01}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats

        def run(method, *args, **kw):
            if train and batch_stats is not None:
                out, _ = net.apply(variables, *args, method=method, train=True,
                                   mutable=["batch_stats"], **kw)
                return out
            return net.apply(variables, *args, method=method, train=False, **kw)

        T, S = batch["test_images"].shape[0], batch["test_images"].shape[1]
        valid = batch.get("test_valid_image",
                          jnp.ones((T, S), jnp.float32)).astype(jnp.float32)

        # 1) learn the appearance filter on the train frames
        tr_bb = run(net.extract_backbone,
                    batch["train_images"].reshape((-1,) +
                                                  batch["train_images"].shape[2:]))
        Ntr = batch["train_images"].shape[0]
        tr_clf = run(net.extract_classification_feat, tr_bb)
        tr_clf = tr_clf.reshape((Ntr, S) + tr_clf.shape[1:])
        filt, _, _ = net.apply(variables, tr_clf, batch["train_anno"],
                               method=net.clf_get_filter)

        # 2) per-frame features + dimp scores, batched over the whole sequence
        te_bb = run(net.extract_backbone,
                    batch["test_images"].reshape((-1,) +
                                                 batch["test_images"].shape[2:]))
        te_clf = run(net.extract_classification_feat, te_bb)
        motion = te_clf.reshape((T, S) + te_clf.shape[1:])        # (T,S,h,w,C)
        dimp_scores = net.apply(variables, filt, motion,
                                method=net.clf_classify)           # (T,S,h,w,1)
        # even filter -> score grid one larger; crop trailing row/col to match the
        # labels (reference KYSActor:249-252)
        h, w = batch["test_label"].shape[-2:]
        dimp_scores = dimp_scores[:, :, :h, :w]
        labels = batch["test_label"][..., None]                    # (T,S,h,w,1)
        motion = motion[:, :, :h, :w]

        if dimp_jitter_fn is not None:
            # reference jitters every frame the predictor consumes
            # (actors/tracking.py:288-290); frame 0 only seeds label_prev.
            seed = jnp.sum(batch.get("jitter_seed",
                                     jnp.zeros((), jnp.int32))).astype(jnp.uint32)
            jit_key = jax.random.PRNGKey(seed)
            jittered = dimp_jitter_fn(jit_key, dimp_scores[1:], labels[1:])
            dimp_scores = jnp.concatenate([dimp_scores[:1], jittered], axis=0)

        # 3) init recurrent state from frame 0, then scan frames 1..T-1
        def predictor(cv, state_prev, score_cur, init_label):
            return net.apply(variables, cv, state_prev, score_cur,
                             init_label=init_label, method=lambda m, *a, **k:
                             m.predictor(*a, **k))

        def bce(pred, target, mask):
            p = jax.nn.log_sigmoid(pred)
            q = jax.nn.log_sigmoid(-pred)
            t = (target > 0.05).astype(pred.dtype)
            l = -(t * p + (1 - t) * q)
            return (l * mask).sum() / jnp.clip(mask.sum() * l[0].size /
                                               mask[0].size, 1.0, None)

        cv1 = cost_volume_abs(motion[1], motion[0], net.max_displacement,
                              kernel_size=net.cv_kernel_size)
        fused1, state1, aux1 = predictor(cv1, None, dimp_scores[1],
                                         labels[0])

        def step(carry, inp):
            state_prev, feat_prev, lbl_prev, valid_prev = carry
            feat_cur, score_cur, lbl_cur, valid_cur = inp
            cv = cost_volume_abs(feat_cur, feat_prev, net.max_displacement,
                                 kernel_size=net.cv_kernel_size)
            fused, state, aux = predictor(cv, state_prev, score_cur, None)
            m_cur = valid_cur[:, None, None, None]
            m_prev = valid_prev[:, None, None, None]
            losses = {
                "test_clf": lbhinge(fused * m_cur, lbl_cur * m_cur),
                "test_clf_orig": lbhinge(aux["fused_score_orig"] * m_cur,
                                         lbl_cur * m_cur),
                "is_target": bce(aux["is_target"], lbl_prev, m_prev),
                "is_target_after_prop": bce(aux["is_target_after_prop"], lbl_cur,
                                            m_cur),
                "acc": tracking_classification_accuracy(
                    fused[..., 0], lbl_cur[..., 0]),
            }
            return (state, feat_cur, lbl_cur, valid_cur), losses

        if T > 2:
            carry = (state1, motion[1], labels[1], valid[1])
            _, seq_losses = jax.lax.scan(
                step, carry, (motion[2:], dimp_scores[2:], labels[2:], valid[2:]))
            mean_losses = {k: v.mean() for k, v in seq_losses.items()}
        else:
            mean_losses = {k: jnp.asarray(0.0) for k in
                           ("test_clf", "test_clf_orig", "is_target",
                            "is_target_after_prop", "acc")}
        # fold in the first-step losses
        m1 = valid[1][:, None, None, None]
        first = {
            "test_clf": lbhinge(fused1 * m1, labels[1] * m1),
            "test_clf_orig": lbhinge(aux1["fused_score_orig"] * m1, labels[1] * m1),
            "is_target": bce(aux1["is_target"], labels[0], m1),
            "is_target_after_prop": bce(aux1["is_target_after_prop"], labels[1], m1),
        }
        n_steps = max(T - 1, 1)
        comb = {k: (first.get(k, 0.0) + mean_losses[k] * max(T - 2, 0)) / n_steps
                for k in first}
        dimp_clf = lbhinge(dimp_scores[1:] * valid[1:, :, None, None, None],
                           labels[1:] * valid[1:, :, None, None, None])

        loss = sum(loss_weight.get(k, 0.0) * v for k, v in comb.items()) + \
            loss_weight.get("dimp_clf", 0.0) * dimp_clf
        stats = {"Loss/total": loss, "Loss/test_clf": comb["test_clf"],
                 "Loss/dimp_clf": dimp_clf,
                 "Loss/is_target": comb["is_target"],
                 "Loss/is_target_after_prop": comb["is_target_after_prop"],
                 "ClfTrain/test_acc": mean_losses["acc"]}
        return loss, (stats, batch_stats)

    return actor


def make_tcm_actor(net, nll_balancing: float = 0.5, train: bool = True):
    """KeepTrack target-candidate-matching objective (reference
    actors/tracking.py:473-514 TargetCandiateMatchingActor): assignment NLL of the
    Sinkhorn matrix against the ground-truth matches.

    Batch: img0/img1 (S,H,W,3), tsm_coords0/1 (S,K,2), img_coords0/1 (S,K,2),
    scores0/1 (S,K), gt_assignment (S,K,K), gt_matches0/1 (S,K)."""
    from pytracking_tpu.models.loss.target_candidate_matching import (
        matching_metrics, target_candidate_matching_loss)

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            preds, mutated = net.apply(
                variables, batch["img0"], batch["img1"], batch["tsm_coords0"],
                batch["tsm_coords1"], batch["img_coords0"], batch["img_coords1"],
                batch["scores0"], batch["scores1"], train=True,
                mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            preds = net.apply(
                variables, batch["img0"], batch["img1"], batch["tsm_coords0"],
                batch["tsm_coords1"], batch["img_coords0"], batch["img_coords1"],
                batch["scores0"], batch["scores1"], train=False)
            new_bs = batch_stats

        bin_score = params["matcher"]["bin_score"] if "matcher" in params \
            else jnp.asarray(0.0)
        losses = target_candidate_matching_loss(
            preds["log_assignment"], batch["gt_assignment"], batch["gt_matches0"],
            batch["gt_matches1"], bin_score, nll_balancing=nll_balancing)

        matches1 = jnp.argmax(preds["log_assignment"][:, :-1, :-1], axis=1)
        dustbin = preds["log_assignment"][:, -1, :-1] > \
            jnp.max(preds["log_assignment"][:, :-1, :-1], axis=1)
        matches1 = jnp.where(dustbin, -1, matches1)
        metrics = matching_metrics(matches1, batch["gt_matches1"])

        stats = {"Loss/total": losses["total"], "Loss/nll_pos": losses["nll_pos"],
                 "Loss/nll_neg": losses["nll_neg"],
                 "Loss/num_matchable": losses["num_matchable"],
                 "Loss/num_unmatchable": losses["num_unmatchable"],
                 "Loss/sinkhorn_norm": losses["sinkhorn_norm"],
                 "Loss/bin_score": losses["bin_score"], **metrics}
        return losses["total"], (stats, new_bs)

    return actor


def make_tamos_actor(net, loss_weight=None, train: bool = True):
    """TaMOs multi-object objective (reference actors/tracking.py:584-712
    TaMOsActor): GIoU over foreground anchor positions of every object slot +
    LBHinge classification; slots without a target in frame are masked out.

    Batch: train_images (Ntr,S,H,W,3), test_images (Nte,S,H,W,3),
    train_label (Ntr,S,K,h,w), train_ltrb_target (Ntr,S,K,4,h,w) reshaped to
    (...,h,w,K,4) by the processing, test_label (Nte,S,K,h,w) ->(...,h,w,K),
    test_ltrb_target (Nte,S,h,w,K,4), test_sample_region (Nte,S,h,w,K)."""
    from pytracking_tpu.models.loss.bbr_loss import giou_loss

    loss_weight = loss_weight or {"giou": 1.0, "test_clf": 100.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            rngs = {"dropout": jax.random.PRNGKey(batch.get("rng_seed", 0))}
            (scores, bbox_preds), mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_label"], batch["train_ltrb_target"], train=True,
                mutable=["batch_stats"], rngs=rngs)
            new_bs = mutated["batch_stats"]
        else:
            scores, bbox_preds = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_label"], batch["train_ltrb_target"], train=False)
            new_bs = batch_stats

        region = batch["test_sample_region"]                  # (Nte,S,h,w,K)
        loss_giou = giou_loss(bbox_preds, batch["test_ltrb_target"], region)
        label = batch["test_label"]                            # (Nte,S,h,w,K)
        # mask empty slots entirely (no target in this sequence slot)
        slot_active = (label.max(axis=(2, 3), keepdims=True) > 0.05)
        loss_clf = lbhinge(scores * slot_active, label * slot_active)
        loss = loss_weight["giou"] * loss_giou + loss_weight["test_clf"] * loss_clf
        stats = {"Loss/total": loss, "Loss/giou": loss_giou,
                 "Loss/target_clf": loss_clf}
        return loss, (stats, new_bs)

    return actor


def make_rts_actor(net, loss_weight=None, train: bool = True):
    """RTS objective (reference actors/segmentation.py:143-217 RTSActor): Lovász
    segmentation loss on the fused masks + LBHinge on the classifier branch scores.

    Batch: train_images (Ntr,S,H,W,3), test_images, train_masks (Ntr,S,H,W),
    train_anno (Ntr,S,4), test_masks (Nte,S,H,W), test_label (Nte,S,h,w)."""
    from pytracking_tpu.models.loss.segmentation import lovasz_seg_loss

    loss_weight = loss_weight or {"segm": 10.0, "clf": 10.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            (masks, clf_scores), mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_masks"], batch["train_anno"], train=True,
                mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            masks, clf_scores = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_masks"], batch["train_anno"], train=False)
            new_bs = batch_stats

        loss_segm = lovasz_seg_loss(masks, batch["test_masks"])
        h, w = batch["test_label"].shape[-2:]
        loss_clf = lbhinge(clf_scores[:, :, :h, :w],
                           batch["test_label"][..., None])
        loss = loss_weight["segm"] * loss_segm + loss_weight["clf"] * loss_clf
        stats = {"Loss/total": loss, "Loss/segm": loss_segm, "Loss/clf": loss_clf}
        return loss, (stats, new_bs)

    return actor


def make_lwl_box_actor(net, loss_weight=None, train: bool = True):
    """LWL box-init objective (reference actors/segmentation.py:90-140 LWLBoxActor):
    decode masks from box-encoded labels on the train frames and supervise with the
    ground-truth masks.

    Batch: train_images (Ntr,S,H,W,3), train_anno (Ntr,S,4),
    train_masks (Ntr,S,H,W)."""
    from pytracking_tpu.models.loss.segmentation import lovasz_seg_loss

    loss_weight = loss_weight or {"segm_box": 10.0}

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            masks, mutated = net.apply(
                variables, batch["train_images"], batch["train_anno"], train=True,
                mutable=["batch_stats"], method=net.box_forward)
            new_bs = mutated["batch_stats"]
        else:
            masks = net.apply(variables, batch["train_images"],
                              batch["train_anno"], train=False,
                              method=net.box_forward)
            new_bs = batch_stats
        loss = loss_weight["segm_box"] * lovasz_seg_loss(masks,
                                                         batch["train_masks"])
        iou = _mask_iou(masks, batch["train_masks"])
        return loss, ({"Loss/total": loss, "Stats/acc_box_train": iou}, new_bs)

    return actor


def _mask_iou(pred_logits, gt):
    import jax
    p = (jax.nn.sigmoid(pred_logits) > 0.5).astype(jnp.float32)
    inter = (p * gt).sum(axis=(-2, -1))
    union = jnp.maximum((p + gt - p * gt).sum(axis=(-2, -1)), 1.0)
    return (inter / union).mean()
