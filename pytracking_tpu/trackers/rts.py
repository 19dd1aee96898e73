"""RTS tracker — robust segmentation-centric tracking with a dual branch:
LWL-style mask branch + DiMP-style instance classifier branch, fused in the decoder.

Re-design of reference `pytracking/tracker/rts/rts.py` (RTS:17), `clf_branch.py`
(the classifier-branch handler) and `sta_helper.py`. Per frame:
  1. the previous frame's merged mask updates the mask-branch target model and
     re-positions the search region (as in LWL);
  2. the classifier branch scores the same crop; its localization flags drive the
     lost / re-found state machine (clf thresholds rts50.py:56-58) — when lost, model
     updates stop and the search area is rescaled from the scale history
     (search_area_rescaling, rts.py:707-720);
  3. the classifier score map is encoded (ResidualDS16SW_Clf) and fused with the mask
     encoding before decoding (segment_target_with_clf).

Box-initialization (the STA network, reference sta_net.py / sta_helper.py) produces an
initial mask from a box when no mask is given; init then proceeds as with a mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from pytracking_tpu.ops import dcf
from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.trackers.dimp import _get_iounet_box, _masked_slot_set
from pytracking_tpu.trackers.lwl import LWLParams, LWLState, LWLTracker


@dataclass(frozen=True)
class RTSParams(LWLParams):
    """(reference pytracking/parameter/rts/rts50.py)"""
    search_area_scale: float = 6.0
    max_scale_change: Tuple[float, float] = (0.8, 1.2)
    train_skipping: int = 20
    # classifier branch
    clf_sample_memory_size: int = 50
    clf_learning_rate: float = 0.01
    clf_train_skipping: int = 20
    update_classifier: bool = True
    clf_net_opt_iter: int = 10
    clf_net_opt_update_iter: int = 2
    clf_output_sigma_factor: float = 0.25
    clf_target_not_found_threshold: float = 0.30
    clf_target_not_found_threshold_too_small: float = 0.50
    clf_init_samples_minimum_weight: float = 0.25
    clf_filter_size: int = 4
    # image-space init augmentation of the clf branch (reference
    # parameter/rts/rts50.py:99-103; applied in clf_branch.py:95-115)
    clf_use_augmentation: bool = True
    clf_augmentation: tuple = (("fliplr", True),
                               ("blur", ((3, 1), (1, 3), (2, 2))))
    scale_history_size: int = 30
    # STA box-init (reference parameter/rts/rts50.py:20-21, sta_helper.py)
    sta_image_sample_size: Tuple[int, int] = (30 * 16, 52 * 16)
    sta_search_area_scale: float = 4.0


class RTSState(LWLState):
    clf_filter: jnp.ndarray = None       # (1, fs, fs, C, 1)
    clf_mem_samples: jnp.ndarray = None  # (M, h, w, C)
    clf_mem_boxes: jnp.ndarray = None    # (M, 4)
    clf_mem_labels: jnp.ndarray = None   # (M, h', w') Gaussian regression labels
    clf_sigma: jnp.ndarray = None        # (2,) label sigma (fixed at init)
    clf_mem_weights: jnp.ndarray = None  # (M,)
    clf_num_stored: jnp.ndarray = None
    clf_prev_ind: jnp.ndarray = None
    scale_history: jnp.ndarray = None
    scale_hist_len: jnp.ndarray = None
    lost_counter: jnp.ndarray = None
    clf_max_score: jnp.ndarray = None


class RTSTracker(LWLTracker):
    multiobj_mode = "parallel"
    predicts_segmentation_mask = True

    def __init__(self, params: RTSParams, net, variables, sta_net=None,
                 sta_variables=None, sta_factory=None):
        """sta_net/sta_variables: optional STA box->mask network for box-only init
        (reference sta_helper.py). sta_factory: lazy () -> (net, variables),
        mirroring the reference's on-demand STAHelper construction (rts.py:62-64)."""
        super().__init__(params, net, variables)
        self.sta_net = sta_net
        self.sta_variables = jax.device_put(sta_variables) \
            if sta_variables is not None else None
        self._sta_factory = sta_factory

    # ------------------------------------------------------------ STA box-init

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        if info.get("init_mask") is None and \
                (self.sta_net is not None or self._sta_factory is not None):
            if self.sta_net is None:
                self.sta_net, sta_vars = self._sta_factory()
                self.sta_variables = jax.device_put(sta_vars)
            if not hasattr(self, "_jit_sta"):
                self._jit_sta = jax.jit(self._sta_predict_mask)
            mask = self._jit_sta(self.sta_variables, jnp.asarray(image),
                                 jnp.asarray(info["init_bbox"], jnp.float32))
            info = dict(info)
            info["init_mask"] = np.asarray(mask)
        return super().initialize(image, info)

    def _sta_predict_mask(self, sta_variables, im, bbox):
        """Box -> first-frame mask via the STA network (reference
        sta_helper.py:30-70 predict_mask): crop a (480, 832) search region around the
        box, forward STANet, paste scores to image coords with -100 outside the
        search region, clamp scores outside the box, threshold at 0."""
        from pytracking_tpu.ops.patch import _resample_weights

        p = self.params
        im_f = im.astype(jnp.float32)
        Hs, Ws = p.sta_image_sample_size
        support = jnp.array([float(Hs), float(Ws)])
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        search_area = jnp.prod(target_sz * p.sta_search_area_scale)
        target_scale = jnp.sqrt(search_area) / jnp.sqrt(jnp.prod(support))
        patch, coords = sample_patch(im_f, pos, target_scale * support, (Hs, Ws),
                                     mode="replicate")
        sample_pos = 0.5 * (coords[:2] + coords[2:] - 1)
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / support))

        # box in crop coords (reference sta_helper.py:72-79)
        box_center = (pos - sample_pos) / sample_scale + (support - 1) / 2
        box_sz = target_sz / sample_scale
        tl_crop = box_center - (box_sz - 1) / 2
        bb_crop = jnp.concatenate([tl_crop[::-1], box_sz[::-1]])

        _, refined = self.sta_net.apply(sta_variables, patch[None, None],
                                        bb_crop[None, None], train=False)
        scores = refined[0, 0]                                   # (Hs, Ws) logits

        # paste to image coords; outside the search region -> -100
        H, W = im.shape[0], im.shape[1]
        tlc = coords[:2]
        szc = coords[2:] - coords[:2]
        cy = (jnp.arange(H, dtype=jnp.float32) - tlc[0]) * Hs / szc[0] - 0.5
        cx = (jnp.arange(W, dtype=jnp.float32) - tlc[1]) * Ws / szc[1] - 0.5
        ry = _resample_weights(cy, Hs, jnp.asarray(1.0))
        rx = _resample_weights(cx, Ws, jnp.asarray(1.0))
        vals = jnp.einsum("ih,hw->iw", ry, scores)
        vals = jnp.einsum("jw,iw->ij", rx, vals)
        inside = ((cy >= -0.5) & (cy <= Hs - 0.5))[:, None] & \
            ((cx >= -0.5) & (cx <= Ws - 0.5))[None, :]
        scores_im = jnp.where(inside, vals, -100.0)

        # scores outside the init box -> -100 (reference sta_helper.py:59-64)
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        x0 = jnp.floor(bbox[0])
        y0 = jnp.floor(bbox[1])
        inbox = ((xs >= x0) & (xs < x0 + jnp.floor(bbox[2])))[None, :] & \
            ((ys >= y0) & (ys < y0 + jnp.floor(bbox[3])))[:, None]
        scores_im = jnp.where(inbox, scores_im, -100.0)
        return (scores_im > 0.0).astype(jnp.float32)

    # ---------------------------------------------------------------- net helpers

    def _clf_feat(self, backbone_feat):
        return self.net.apply(self.variables, backbone_feat,
                              method=lambda m, f: m.extract_classification_feat(f))

    def _clf_get_filter(self, feat, bb, labels, num_iter):
        return self.net.apply(
            self.variables, feat, bb, labels,
            method=lambda m, f, b, l: m.clf_get_filter(f, b, train_label=l,
                                                       num_iter=num_iter))

    def _clf_run_optimizer(self, weights, feat, bb, labels, sw, num_iter):
        return self.net.apply(
            self.variables, weights, feat, bb, labels,
            method=lambda m, w, f, b, l: m.classifier.filter_optimizer(
                w, feat=f, bb=b, train_label=l, sample_weight=sw,
                num_iter=num_iter))

    def _clf_label(self, feat_sz, sigma, pos, sample_pos, sample_scale, support):
        """Gaussian regression label on the classifier score grid (reference
        clf_branch.py:502-512 get_label_function): center in feature coords relative
        to the crop center, end-padded for the even filter size."""
        ksz_even = (self.params.clf_filter_size + 1) % 2
        feat_sz_arr = jnp.array([float(feat_sz[0]), float(feat_sz[1])])
        center = feat_sz_arr * (pos - sample_pos) / (sample_scale * support) \
            + 0.5 * ksz_even
        return dcf.label_function_spatial(feat_sz, sigma, center,
                                          end_pad=(ksz_even, ksz_even))

    def _clf_classify(self, weights, feat):
        return self.net.apply(self.variables, weights, feat,
                              method=lambda m, w, f: m.clf_classify(w, f))

    def _segment_fused(self, filt, test_feat_tm, backbone_feat, clf_score, image_size):
        return self.net.apply(
            self.variables, filt, test_feat_tm, backbone_feat, clf_score,
            method=lambda m, ft, tf, bf, cs: m.segment_target_with_clf(
                ft, tf, bf, cs, image_size))

    # ---------------------------------------------------------------- initialize

    def _initialize_impl(self, im, bbox, init_mask) -> RTSState:
        state = super()._initialize_impl(im, bbox, init_mask)
        p = self.params
        Hs, Ws = p.image_sample_size
        support = jnp.array([float(Hs), float(Ws)])

        # classifier-branch init with the reference's IMAGE-SPACE augmentations
        # (clf_branch.py:53-115 generate_init_samples; parameter/rts/rts50.py:99-103
        # -> [identity, fliplr, blur(3,1), blur(1,3), blur(2,2)])
        from pytracking_tpu.ops import augmentation as aug

        init_pos = jnp.round(state.pos)
        patch, coords = sample_patch(im.astype(jnp.float32), init_pos,
                                     state.target_scale * support, (Hs, Ws),
                                     mode=p.border_mode)
        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / support))
        augs = dict(p.clf_augmentation) if p.clf_use_augmentation else {}
        transforms = aug.build_transforms(augs, (Hs, Ws), 0.0)
        im_patches = aug.apply_all(patch, transforms, (Hs, Ws))   # (T, Hs, Ws, 3)
        T = im_patches.shape[0]
        backbone_feat = self._backbone(im_patches)
        clf_xs = self._clf_feat(backbone_feat)                    # (T, h, w, C)
        h, w = clf_xs.shape[1], clf_xs.shape[2]
        target_box = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                     sample_scale, support)
        flip_box = target_box.at[0].set(float(Ws) - target_box[0] - target_box[2])
        boxes = jnp.stack([flip_box if t.kind == "fliplr" else target_box
                           for t in transforms])                  # (T, 4)
        feats = clf_xs[:, None]                                   # (T, 1, h, w, C)

        # Gaussian regression labels (reference clf_branch.py:479-498): sigma from
        # the base target size; the target stays centered under flip/blur so all
        # samples share the same label
        clf_sigma = jnp.sqrt(jnp.prod(
            jnp.array([h / float(Hs), w / float(Ws)]) * state.base_target_sz)) \
            * p.clf_output_sigma_factor * jnp.ones(2)
        init_label = self._clf_label((h, w), clf_sigma, state.pos, sample_pos,
                                     sample_scale, support)
        labels = jnp.broadcast_to(init_label[None, None],
                                  (T, 1) + init_label.shape)
        clf_filter, _, _ = self._clf_get_filter(feats, boxes[:, None], labels,
                                                p.clf_net_opt_iter)

        M = p.clf_sample_memory_size
        Tm = min(T, M)   # memory smaller than the augmentation set: keep the
        # first M samples (identity first, like the reference's slice fill)
        clf_mem = jnp.zeros((M,) + clf_xs.shape[1:]).at[:Tm].set(clf_xs[:Tm])
        clf_boxes = jnp.zeros((M, 4)).at[:Tm].set(boxes[:Tm])
        clf_labels = jnp.zeros((M,) + init_label.shape).at[:Tm].set(
            jnp.broadcast_to(init_label[None], (Tm,) + init_label.shape))
        clf_w = jnp.zeros((M,)).at[:Tm].set(1.0 / T)

        base = {f: getattr(state, f) for f in LWLState.__dataclass_fields__}
        return RTSState(
            **base,
            clf_filter=clf_filter, clf_mem_samples=clf_mem, clf_mem_boxes=clf_boxes,
            clf_mem_labels=clf_labels, clf_sigma=clf_sigma,
            clf_mem_weights=clf_w, clf_num_stored=jnp.asarray(Tm, jnp.int32),
            clf_prev_ind=jnp.asarray(-1, jnp.int32),
            scale_history=jnp.full((p.scale_history_size,), state.target_scale),
            scale_hist_len=jnp.asarray(1, jnp.int32),
            lost_counter=jnp.asarray(0, jnp.int32),
            clf_max_score=jnp.asarray(1.0, jnp.float32))

    # ---------------------------------------------------------------- track

    def _track_impl(self, state: RTSState, im, prev_prob_im):
        p = self.params
        im = im.astype(jnp.float32)
        Hs, Ws = p.image_sample_size
        support = jnp.array([float(Hs), float(Ws)])
        state = state.replace(frame_num=state.frame_num + 1)

        # ---- mask-branch model update from the previous merged mask (as LWL)
        if p.update_target_model:
            # continuous probabilities: matmul resample path (MXU) not nearest gather
            prev_crop, _ = sample_patch(prev_prob_im[..., None], state.prev_pos,
                                        state.prev_scale * support, (Hs, Ws),
                                        mode=p.border_mode)
            do = (state.frame_num > 2) & (state.lost_counter == 0)
            state = self._update_memory(state, state.prev_test_x[0], prev_crop[..., 0],
                                        p.learning_rate, do)
            state = self._run_model_update(state, do)

        # ---- reposition from the previous mask + scale clipping
        pos, target_sz = self._seg_to_state(state, prev_prob_im)
        new_scale = jnp.sqrt(jnp.prod(target_sz) / jnp.prod(state.base_target_sz))
        ratio = new_scale / state.target_scale
        lo, hi = p.max_scale_change
        new_scale = jnp.where(ratio < lo, state.target_scale * lo,
                              jnp.where(ratio > hi, state.target_scale * hi,
                                        new_scale))
        # when lost: rescale the search area from the scale history
        # (reference rts.py:122-131, 707-720)
        num_scales = jnp.clip(state.lost_counter, 2, 30)
        Hn = p.scale_history_size
        idx = jnp.arange(Hn)
        recent = idx >= (Hn - jnp.minimum(num_scales, state.scale_hist_len))
        bigger = state.scale_history >= state.scale_history[-1]
        sel = recent & bigger
        resc = jnp.where(sel, state.scale_history, 0.0).sum() / \
            jnp.maximum(sel.sum(), 1)
        is_lost = state.lost_counter > 0
        new_scale = jnp.where(is_lost, resc, new_scale)
        pos = jnp.where(is_lost, state.pos, pos)
        state = state.replace(pos=pos, target_scale=new_scale,
                              target_sz=state.base_target_sz * new_scale)

        # ---- current frame crop + both branches
        patch, coords = sample_patch(im, state.pos, state.target_scale * support,
                                     (Hs, Ws), mode=p.border_mode,
                                     max_scale_change=p.patch_max_scale_change)
        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / support))

        backbone_feat = self._backbone(patch[None])
        test_x = self._tm_features(backbone_feat)
        clf_x = self._clf_feat(backbone_feat)
        clf_scores = self._clf_classify(state.clf_filter, clf_x)   # (1, hs, ws, 1)
        clf_max = clf_scores.max()

        seg_crop, _ = self._segment_fused(state.target_filter, test_x[:, None],
                                          backbone_feat,
                                          clf_scores[None, :, :, :, 0], (Hs, Ws))

        state = state.replace(prev_pos=state.pos, prev_scale=state.target_scale,
                              prev_test_x=test_x)

        # ---- lost / re-found state machine (clf thresholds rts50.py:56-58)
        found = clf_max >= p.clf_target_not_found_threshold
        refound = found & (state.lost_counter > 0) & \
            (clf_max >= p.clf_target_not_found_threshold_too_small)
        now_found = jnp.where(state.lost_counter > 0, refound, found)
        lost_counter = jnp.where(now_found, 0, state.lost_counter + 1)

        # ---- paste crop scores into the full image (inverse warp, as LWL):
        # separable — two MXU matmuls R_y·crop·R_xᵀ instead of an image-sized gather
        from pytracking_tpu.ops.patch import _resample_weights

        H, W = im.shape[0], im.shape[1]
        yy = jnp.arange(H, dtype=jnp.float32)
        xx = jnp.arange(W, dtype=jnp.float32)
        tl = coords[:2]
        szc = coords[2:] - coords[:2]
        cy = (yy - tl[0]) * Hs / szc[0] - 0.5
        cx = (xx - tl[1]) * Ws / szc[1] - 0.5
        ry = _resample_weights(cy, Hs, jnp.asarray(1.0))
        rx = _resample_weights(cx, Ws, jnp.asarray(1.0))
        vals = jnp.einsum("ih,hw->iw", ry, seg_crop,
                          preferred_element_type=jnp.float32)
        vals = jnp.einsum("jw,iw->ij", rx, vals,
                          preferred_element_type=jnp.float32)
        inside = ((cy >= -0.5) & (cy <= Hs - 0.5))[:, None] & \
            ((cx >= -0.5) & (cx <= Ws - 0.5))[None, :]
        # the mask is emitted UNCONDITIONALLY (reference rts.py:268-276) — the
        # lost state gates memory updates and rescaling, not the output
        # (gating the paste on now_found blanked every mask the moment the
        # random-weight clf score dipped below the threshold; found via
        # trace-parity against the reference)
        seg_raw_im = jnp.where(inside, vals, -100.0)

        prob_im = jax.nn.sigmoid(seg_raw_im)
        out_pos, out_sz = self._seg_to_state(state, prob_im)
        bbox = jnp.concatenate([out_pos[::-1] - (out_sz[::-1] - 1) / 2, out_sz[::-1]])

        # ---- classifier memory + filter update (gated on found)
        if p.update_classifier:
            target_box = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                         sample_scale, support)
            hs, ws = clf_x.shape[1], clf_x.shape[2]
            label = self._clf_label((hs, ws), state.clf_sigma, state.pos,
                                    sample_pos, sample_scale, support)
            state = self._clf_update_memory(state, clf_x[0], target_box, label,
                                            p.clf_learning_rate, now_found)
            skip = ((state.frame_num - 1) % p.clf_train_skipping) == 0
            feats = state.clf_mem_samples[:, None]
            boxes = state.clf_mem_boxes[:, None]
            labels = state.clf_mem_labels[:, None]
            sw = state.clf_mem_weights[:, None]
            new_filter = lax.cond(
                now_found & skip,
                lambda f: self._clf_run_optimizer(f, feats, boxes, labels, sw,
                                                  p.clf_net_opt_update_iter)[0],
                lambda f: f, state.clf_filter)
            state = state.replace(clf_filter=new_filter)

        hist = jnp.where(now_found,
                         jnp.roll(state.scale_history, -1).at[-1].set(
                             state.target_scale), state.scale_history)
        hist_len = jnp.where(now_found,
                             jnp.minimum(state.scale_hist_len + 1,
                                         p.scale_history_size),
                             state.scale_hist_len)
        state = state.replace(seg_raw=prob_im, lost_counter=lost_counter,
                              clf_max_score=clf_max, scale_history=hist,
                              scale_hist_len=hist_len)
        return state, {"target_bbox": bbox, "segmentation_raw": seg_raw_im,
                       "segmentation": (seg_raw_im > 0.0).astype(jnp.uint8)}

    def _clf_update_memory(self, state: RTSState, sample, target_box, label, lr,
                           do_update):
        p = self.params
        sw = state.clf_mem_weights
        M = p.clf_sample_memory_size
        num_init = jnp.asarray(2, jnp.int32)
        num_stored = state.clf_num_stored
        init_w = p.clf_init_samples_minimum_weight

        s_ind = jnp.where(init_w > 0, num_init, 0)
        idx = jnp.arange(M)
        masked_sw = jnp.where(idx >= s_ind, sw, jnp.inf)
        r_ind_full = jnp.argmin(masked_sw).astype(jnp.int32)
        r_ind = jnp.where(num_stored < M, num_stored, r_ind_full).astype(jnp.int32)

        prev = state.clf_prev_ind
        sw_new = jnp.where(prev < 0, sw / (1 - lr), sw)
        new_w = jnp.where(prev < 0, lr, sw[jnp.maximum(prev, 0)] / (1 - lr))
        sw_new = sw_new.at[r_ind].set(new_w)
        sw_new = sw_new / sw_new.sum()
        if init_w and init_w > 0:
            init_mask_ = idx < num_init
            init_sum = jnp.where(init_mask_, sw_new, 0.0).sum()
            rest_sum = jnp.where(~init_mask_, sw_new, 0.0).sum()
            need = init_sum < init_w
            sw_adj = jnp.where(init_mask_, init_w / jnp.maximum(num_init, 1),
                               sw_new / (init_w + rest_sum))
            sw_new = jnp.where(need, sw_adj, sw_new)

        return state.replace(
            clf_mem_samples=_masked_slot_set(state.clf_mem_samples, r_ind,
                                             sample, do_update),
            clf_mem_boxes=_masked_slot_set(state.clf_mem_boxes, r_ind,
                                           target_box, do_update),
            clf_mem_labels=_masked_slot_set(state.clf_mem_labels, r_ind,
                                            label, do_update),
            clf_mem_weights=jnp.where(do_update, sw_new, state.clf_mem_weights),
            clf_num_stored=jnp.where(do_update, jnp.minimum(num_stored + 1, M),
                                     num_stored),
            clf_prev_ind=jnp.where(do_update, r_ind, state.clf_prev_ind))


def get_tracker_class():
    return RTSTracker
