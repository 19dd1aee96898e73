"""KYS tracker — DiMP + recurrent scene propagation ("Know Your Surroundings").

Re-design of reference `pytracking/tracker/kys/kys.py` (KYS:28, PrevStateHandler:16):
per frame, a dense cost volume between the previous and current motion features
propagates a latent scene-state vector field; the propagated state is fused with the
DiMP appearance score and the fused response drives localization.

TPU-first: the previous frame's motion features / state vectors / label live in the
fixed-shape `KYSState` pytree (the reference's PrevStateHandler side-object); the cost
volume is an MXU einsum (models/kys/cost_volume.py); everything runs inside the one
jitted track step. The reference's sub-pixel shift correction of previous features
(kys.py:282-298) is applied with a bilinear shift.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops import dcf
from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.models.kys.response_predictor import shift_features
from pytracking_tpu.trackers.dimp import (DiMPParams, DiMPState, DiMPTracker,
                                          FLAG_NORMAL, FLAG_NOT_FOUND,
                                          FLAG_HARD_NEG, FLAG_UNCERTAIN,
                                          _get_iounet_box)
from flax import struct


@dataclass(frozen=True)
class KYSParams(DiMPParams):
    """(reference pytracking/parameter/kys/default.py)"""
    window_output: bool = True
    use_clipped_window: bool = True
    effective_search_area: float = 10.0
    apply_window_to_dimp_score: bool = True
    dimp_threshold: float = 0.05
    target_not_found_threshold_fused: float = 0.05
    prev_feat_remove_subpixel_shift: bool = True
    move_feat_to_center: bool = True
    reset_state_during_occlusion: bool = False
    remove_offset_in_fused_score: bool = True
    output_sigma_factor: float = 1 / 4
    # hard-negative mining on the dimp score (reference kys.py:349-353,384-409;
    # enabled by the default_vot parameters)
    perform_hn_mining_dimp: bool = False
    target_neighborhood_scale_safe: float = 2.2


class KYSState(DiMPState):
    motion_feat_prev: jnp.ndarray = None     # (1, h, w, C)
    state_vector: jnp.ndarray = None         # (1, h, w, D)
    prev_label: jnp.ndarray = None           # (1, h, w, 1)
    have_state: jnp.ndarray = None           # () bool — state vector valid
    prev_box_patch: jnp.ndarray = None       # (4,) x,y,w,h in prev patch coords


class KYSTracker(DiMPTracker):
    """Extends the DiMP tracker with the scene-propagation branch."""

    def _motion_feat(self, backbone_feat):
        return self.net.apply(self.variables, backbone_feat,
                              method=lambda m, f: m.get_motion_feat(f))

    def _predict_response(self, motion_prev, motion_cur, state_prev, dimp_score,
                          init_label, window, state_valid=None):
        p = self.params
        return self.net.apply(
            self.variables, motion_prev, motion_cur, state_prev, dimp_score,
            init_label,
            method=lambda m, mp, mc, sp, ds, il: m.predict_response(
                mp, mc, sp, ds, init_label=il, dimp_thresh=p.dimp_threshold,
                output_window=window, state_valid=state_valid))

    def _init_crop_impl(self, im, bbox, image_sz):
        """Shape-specialized init head: DiMP's augmentation base patch PLUS the
        KYS identity sample — the only extra image access — so KYS participates
        in the split init dispatch instead of recompiling the full fused init
        once per frame-shape bucket (round-4 advisor finding)."""
        p = self.params
        base_patch = super()._init_crop_impl(im, bbox, image_sz)
        # same pos/target_scale derivation as _initialize_from_patch — the
        # identity sample is cropped at the (rounded) init position
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        img_sample_sz = jnp.array(self._img_sample_sz, jnp.float32)
        target_scale = jnp.sqrt(jnp.prod(target_sz * p.search_area_scale)) / \
            jnp.sqrt(jnp.prod(img_sample_sz))
        patch, coords = sample_patch(im.astype(jnp.float32), jnp.round(pos),
                                     target_scale * img_sample_sz,
                                     self._img_sample_sz, mode=p.border_mode,
                                     im_sz=image_sz)
        return {"base_patch": base_patch, "id_patch": patch, "id_coords": coords}

    def _initialize_from_patch(self, crop, bbox, key, image_sz):
        state = super()._initialize_from_patch(crop["base_patch"], bbox, key,
                                               image_sz)
        p = self.params
        feat_sz = self._feature_sz
        # previous-frame data from the init frame: identity sample (kys.py:255-269)
        img_sample_sz = jnp.array(self._img_sample_sz, jnp.float32)
        patch, coords = crop["id_patch"], crop["id_coords"]
        backbone_feat = self._backbone(patch[None])
        motion_feat = self._motion_feat(backbone_feat)

        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / img_sample_sz))
        sigma = jnp.sqrt(jnp.prod(feat_sz / img_sample_sz * state.base_target_sz)) * \
            p.output_sigma_factor * jnp.ones(2)
        # reference get_label_function (kys.py:410-421): +half-cell for even kernels
        ksz_even = (p.kernel_size + 1) % 2
        center = feat_sz * (state.pos - sample_pos) / (sample_scale * img_sample_sz) \
            + 0.5 * ksz_even
        h, w = motion_feat.shape[1], motion_feat.shape[2]
        label = dcf.gauss_2d((h, w), sigma, center[None])[0]

        base_fields = {f: getattr(state, f) for f in state.__dataclass_fields__}
        return KYSState(
            **base_fields,
            motion_feat_prev=motion_feat,
            state_vector=jnp.zeros(motion_feat.shape[:3] +
                                   (self.net.predictor.state_dim,)),
            prev_label=label[None, :, :, None],
            have_state=jnp.asarray(False),
            prev_box_patch=_get_iounet_box(state.pos, state.target_sz,
                                           sample_pos, sample_scale,
                                           img_sample_sz))

    def _track_from_patch(self, state: KYSState, patch, coords):
        p = self.params
        img_sample_sz = jnp.array(self._img_sample_sz, jnp.float32)
        feat_sz = float(self._feature_sz)
        score_sz = float(self._score_sz)
        # reference kys.py:671 sets output_sz = feature_sz (the (ksz+1)%2 term is
        # commented out there): displacement cells stride the feature grid
        output_sz = feat_sz

        state = state.replace(frame_num=state.frame_num + 1)

        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / img_sample_sz))

        backbone_feat = self._backbone(patch[None])
        test_x = self._clf_feat(backbone_feat)
        motion_cur = self._motion_feat(backbone_feat)
        scores_raw = self._classify(state.target_filter, test_x)[0, :, :, 0]

        # crop dimp score to the motion-feature grid (even kernel -> +1 border)
        h, w = test_x.shape[1], test_x.shape[2]
        dimp_score = scores_raw[:h, :w][None, :, :, None]

        window = dcf.hann2d_clipped(
            (h, w), (int(h * p.effective_search_area / p.search_area_scale),
                     int(w * p.effective_search_area / p.search_area_scale))) \
            [None, :, :, None] if p.window_output else None

        dimp_score_in = dimp_score * window if \
            (window is not None and p.apply_window_to_dimp_score) else dimp_score

        # ---- align the previous frame's features to the new sample grid
        # (reference kys.py:274-299): when the target sat far from the prev
        # patch center, shift the prev features/state so it is centered
        # (CenterShiftFeatures, move_feat_to_center); otherwise remove the
        # sub-pixel part of the prev target position (round to the cell grid
        # + the wrapper's half-cell, prev_feat_remove_subpixel_shift). Both
        # shifts only apply once a state vector exists (frame >= 2).
        mh, mw = test_x.shape[1], test_x.shape[2]
        box_c = state.prev_box_patch[:2] + 0.5 * state.prev_box_patch[2:]  # (x, y)
        box_c_max = img_sample_sz[0] * (0.5 + 1.0 / p.search_area_scale)
        box_c_min = img_sample_sz[0] * (0.5 - 1.0 / p.search_area_scale)
        near_center = jnp.all((box_c < box_c_max) & (box_c > box_c_min))
        box_c_feat = box_c / 16.0                                  # (x, y) cells
        # center shift: content moves -(c_cells - sz/2) cells (utils.py:16-32;
        # our shift_features moves content by +s*size px)
        s_center = -jnp.stack([(box_c_feat[1] - mh * 0.5) / mh,
                               (box_c_feat[0] - mw * 0.5) / mw])[None]
        # sub-pixel shift: torch affine-grid t = (round(c)+0.5-c)/size in
        # [-1,1] units -> content moves -t*size/2 px (kys.py:287-293)
        box_c_round = jnp.round(box_c_feat) + 0.5
        s_sub = jnp.stack([(box_c_round[1] - box_c_feat[1]) / (2.0 * mh),
                           (box_c_round[0] - box_c_feat[0]) / (2.0 * mw)])[None]
        use_center = state.have_state & (~near_center) \
            if p.move_feat_to_center else jnp.asarray(False)
        use_sub = state.have_state & ~use_center \
            if p.prev_feat_remove_subpixel_shift else jnp.asarray(False)
        s_apply = jnp.where(use_center, s_center,
                            jnp.where(use_sub, s_sub, jnp.zeros((1, 2))))
        motion_prev = shift_features(state.motion_feat_prev, s_apply)
        state_vec_prev = shift_features(state.state_vector, s_apply)

        # state seeding: before the first found frame the reference passes
        # state_prev=None and the predictor seeds it from the label
        # (init_hidden); here the selection is dynamic via state_valid
        fused, new_state_vec, _ = self._predict_response(
            motion_prev, motion_cur, state_vec_prev, dimp_score_in,
            state.prev_label, window, state_valid=state.have_state)
        fused = jax.nn.relu(fused)[0, :, :, 0]

        # localization on the fused response (reference kys.py:322-409); thresholds are
        # on the sigmoid-scale fused score
        dimp_win = (dimp_score * window if window is not None else dimp_score)[0, :, :, 0]
        translation_vec, flag, max_score = self._localize_fused(
            state, fused, dimp_win, dimp_score[0, :, :, 0],
            sample_pos, sample_scale, output_sz, img_sample_sz)
        new_pos = sample_pos + translation_vec

        found = flag != FLAG_NOT_FOUND

        def clamp_pos(pos_new, sz):
            inside_offset = (p.target_inside_ratio - 0.5) * sz
            return jnp.maximum(jnp.minimum(pos_new, state.image_sz - inside_offset),
                               inside_offset)

        state = state.replace(pos=jnp.where(found, clamp_pos(new_pos, state.target_sz),
                                            state.pos))

        if p.use_iou_net:
            update_scale = jnp.where(
                p.update_scale_when_uncertain | (flag != FLAG_UNCERTAIN), True, False)
            state = self._refine_target_box(state, backbone_feat, sample_pos,
                                            sample_scale, img_sample_sz, found,
                                            update_scale)

        update_flag = (flag != FLAG_NOT_FOUND) & (flag != FLAG_UNCERTAIN)
        hard_negative = flag == FLAG_HARD_NEG
        if p.update_classifier:
            target_box = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                         sample_scale, img_sample_sz)
            lr = jnp.where(hard_negative, p.hard_negative_learning_rate,
                           p.learning_rate)
            state = self._update_memory_masked(state, test_x[0], target_box, lr,
                                               update_flag)
            if not p.defer_classifier_update:
                state = self._update_classifier(state, hard_negative, update_flag)

        # ---- update the propagation state (PrevStateHandler.set_data, kys.py:198-205)
        sigma = jnp.sqrt(jnp.prod(feat_sz / img_sample_sz * state.base_target_sz)) * \
            p.output_sigma_factor * jnp.ones(2)
        ksz_even = (p.kernel_size + 1) % 2
        center = feat_sz * (state.pos - sample_pos) / (sample_scale * img_sample_sz) \
            + 0.5 * ksz_even
        new_label = dcf.gauss_2d((h, w), sigma, center[None])[0][None, :, :, None]
        new_box_patch = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                        sample_scale, img_sample_sz)

        # reference kys.py:198-205: prev data is replaced only on found frames;
        # on not_found it is KEPT (reset_state_during_occlusion merely zeroes
        # the state vector), and a once-valid state stays valid
        kept_vec = state.state_vector
        if p.reset_state_during_occlusion:
            kept_vec = jnp.where(found, kept_vec, jnp.zeros_like(kept_vec))
        state = state.replace(
            motion_feat_prev=jnp.where(found, motion_cur, state.motion_feat_prev),
            state_vector=jnp.where(found, new_state_vec, kept_vec),
            prev_label=jnp.where(found, new_label, state.prev_label),
            prev_box_patch=jnp.where(found, new_box_patch, state.prev_box_patch),
            have_state=found | state.have_state,
            flag=flag.astype(jnp.int32), max_score=max_score)

        bbox = jnp.concatenate([state.pos[::-1] - (state.target_sz[::-1] - 1) / 2,
                                state.target_sz[::-1]])
        out = {"target_bbox": bbox, "max_score": max_score, "flag": flag}
        if self._debug_outputs:
            out["score_map"] = fused
        return state, out

    def _localize_fused(self, state, fused, dimp_win, dimp_raw, sample_pos,
                        sample_scale, output_sz, img_sample_sz):
        """Fused-score localization (reference kys.py:322-409
        localize_target/compute_target_location): a plain max with the fused
        not-found threshold — the fused path NEVER emits `uncertain` and only
        emits `hard_negative` through the optional dimp-score hn mining. When
        the fused and dimp peaks differ by exactly one cell, the dimp peak wins
        (remove_offset_in_fused_score, kys.py:369-374) to avoid propagation
        drift."""
        p = self.params
        sz = fused.shape
        max1, disp1 = dcf.max2d(fused)
        disp1 = disp1.astype(jnp.float32)
        if p.remove_offset_in_fused_score:
            _, disp_d = dcf.max2d(dimp_win)
            disp_d = disp_d.astype(jnp.float32)
            snap = jnp.max(jnp.abs(disp1 - disp_d)) == 1.0
            disp1 = jnp.where(snap, disp_d, disp1)

        score_center = jnp.floor_divide(jnp.asarray(output_sz, jnp.float32), 2.0)
        translation_vec = (disp1 - score_center) * \
            (img_sample_sz / output_sz) * sample_scale

        not_found = max1 < p.target_not_found_threshold_fused
        flag = jnp.where(not_found, FLAG_NOT_FOUND, FLAG_NORMAL)

        if p.perform_hn_mining_dimp:
            # hard negatives from the (unwindowed) dimp score at the fused peak
            # (reference kys.py:384-409; integer-rounded rectangle mask)
            di = disp1.astype(jnp.int32)
            s1 = dimp_raw[di[0], di[1]]
            neigh = p.target_neighborhood_scale_safe * \
                jnp.sqrt(jnp.prod(state.target_sz)) / sample_scale * \
                (output_sz / img_sample_sz)
            top = jnp.clip(jnp.round(disp1[0] - neigh[0] / 2), 0, sz[0])
            bottom = jnp.clip(jnp.round(disp1[0] + neigh[0] / 2 + 1), 0, sz[0])
            left = jnp.clip(jnp.round(disp1[1] - neigh[1] / 2), 0, sz[1])
            right = jnp.clip(jnp.round(disp1[1] + neigh[1] / 2 + 1), 0, sz[1])
            iy = jnp.arange(sz[0], dtype=jnp.float32)[:, None]
            ix = jnp.arange(sz[1], dtype=jnp.float32)[None, :]
            in_neigh = (iy >= top) & (iy < bottom) & (ix >= left) & (ix < right)
            max2, _ = dcf.max2d(jnp.where(in_neigh, 0.0, dimp_raw))
            hn = (max2 > p.hard_negative_threshold * s1) & (max2 > 0.1) & ~not_found
            flag = jnp.where(hn, FLAG_HARD_NEG, flag)
        return translation_vec, flag, max1


def get_tracker_class():
    return KYSTracker
