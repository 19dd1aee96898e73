"""ToMP tracker — transformer model prediction for classification and box regression.

Re-design of reference `pytracking/tracker/tomp/tomp.py` (ToMP:16): every frame, the
memorized train frames (a tiny fixed memory of `sample_memory_size`=2 slots: the
ground-truth first frame + the latest confident frame) plus the test frame run through
the transformer filter predictor TRANSDUCTIVELY, producing the classification filter and
the bbreg filter in one forward (`predict_cls_bbreg_filters_parallel`); the box comes
from the dense LTRB map at the score peak (`direct_bbox_regression`, tomp.py:226-259).

TPU-first: memory slots are fixed-shape with a per-slot validity mask; empty slots are
masked out of the transformer's attention (traced key-padding mask), so memory growth
and the cls/bbreg frame split never recompile. `search_area_rescaling` (tomp.py:260-270)
keeps a fixed-length ring of recent target scales on device.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pytracking_tpu.ops import dcf
from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.trackers.base import BaseTracker
from pytracking_tpu.trackers.dimp import (FLAG_HARD_NEG, FLAG_NAMES, FLAG_NORMAL,
                                          FLAG_NOT_FOUND, FLAG_UNCERTAIN,
                                          _get_iounet_box, _masked_slot_set)


@dataclass(frozen=True)
class ToMPParams:
    """Static config (reference pytracking/parameter/tomp/tomp50.py)."""
    train_feature_size: int = 18
    feature_stride: int = 16
    search_area_scale: float = 5.0
    border_mode: str = "inside_major"
    patch_max_scale_change: Optional[float] = 1.5
    kernel_size: int = 1                     # decoder filter is 1x1
    sample_memory_size: int = 2
    learning_rate: float = 0.01
    init_samples_minimum_weight: float = 0.25
    train_skipping: int = 20
    update_classifier: bool = True
    conf_ths: float = 0.9
    output_sigma_factor: float = 1 / 4
    window_output: bool = False
    # advanced localization
    advanced_localization: bool = True
    target_not_found_threshold: float = 0.25
    uncertain_threshold: float = -float("inf")
    hard_sample_threshold: float = -float("inf")
    distractor_threshold: float = 0.8
    hard_negative_threshold: float = 0.5
    target_neighborhood_scale: float = 2.2
    displacement_scale: float = 0.8
    hard_negative_learning_rate: float = 0.02
    target_inside_ratio: float = 0.2
    search_area_rescaling_at_occlusion: bool = True
    scale_history_size: int = 60

    @property
    def image_sample_size(self) -> int:
        return self.train_feature_size * self.feature_stride


class ToMPState(struct.PyTreeNode):
    pos: jnp.ndarray
    target_sz: jnp.ndarray
    target_scale: jnp.ndarray
    base_target_sz: jnp.ndarray
    image_sz: jnp.ndarray
    min_scale: jnp.ndarray
    max_scale: jnp.ndarray
    sigma: jnp.ndarray
    # (M, h, w, C') EXTRACTED head features. The reference stores backbone
    # head-layer features and re-runs head.extract_head_feat on the whole memory
    # every frame (tomp.py:285-290); since the extractor is per-sample
    # deterministic, extracting once at store time is mathematically identical
    # and removes M per-frame ResidualBottleneck passes from the hot step.
    mem_samples: jnp.ndarray
    mem_labels: jnp.ndarray          # (M, Hf, Wf)
    mem_boxes: jnp.ndarray           # (M, 4) xywh patch coords
    mem_weights: jnp.ndarray         # (M,)
    num_stored: jnp.ndarray
    num_init: jnp.ndarray
    prev_ind: jnp.ndarray
    scale_history: jnp.ndarray       # (H,) ring of recent target scales
    scale_hist_len: jnp.ndarray      # () int32
    not_found_counter: jnp.ndarray   # () int32
    frame_num: jnp.ndarray
    key: jax.Array
    flag: jnp.ndarray
    max_score: jnp.ndarray


class ToMPTracker(BaseTracker):
    multiobj_mode = "parallel"

    def __init__(self, params: ToMPParams, net, variables):
        super().__init__(params)
        self.net = net
        # device_put ONCE: variables may arrive host/CPU-resident (CPU-side init,
        # msgpack load) — passing host arrays to a jitted call re-uploads them per
        # frame (~100MB through the axon tunnel)
        self.variables = jax.device_put(variables)
        self._jit_init = self._jit_with_variables(self._initialize_impl)
        self._jit_track = self._jit_with_variables(self._track_impl, donate_state=True)
        # split dispatch: shape-specialized crop + shape-independent heavy step
        # (see DiMPTracker.__init__ — a new frame-shape bucket recompiles only
        # the 2-matmul warp, not the transformer step)
        self._jit_crop = jax.jit(self._track_crop_impl)
        self._jit_track_patch = self._jit_with_variables(self._track_from_patch,
                                                         donate_state=True)
        self._jit_init_crop = jax.jit(self._init_crop_impl)
        self._jit_init_patch = self._jit_with_variables(self._initialize_from_patch)
        self.state: Optional[ToMPState] = None
        self._seed = 0

    # ---------------------------------------------------------------- net helpers

    def _backbone(self, im_patches):
        return self.net.apply(self.variables, im_patches,
                              method=lambda m, x: m.extract_backbone(x))

    def _head_feat(self, backbone_feat):
        return self.net.apply(self.variables, backbone_feat,
                              method=lambda m, f: m.get_backbone_head_feat(f))

    def _extract_head(self, feat_ns):
        return self.net.apply(self.variables, feat_ns,
                              method=lambda m, f: m.head.extract_head_feat(f))

    def _filters_parallel(self, train_feat, test_feat, train_label, train_ltrb,
                          cls_mask, bbreg_mask):
        return self.net.apply(
            self.variables, train_feat, test_feat, train_label, train_ltrb,
            method=lambda m, a, b, c, d: m.head_get_filters_parallel(
                a, b, c, d, cls_frame_mask=cls_mask, bbreg_frame_mask=bbreg_mask))

    def _classify(self, feat, filt):
        return self.net.apply(self.variables, feat, filt,
                              method=lambda m, f, w: m.head_classify(f, w))

    def _bbreg(self, feat, filt):
        return self.net.apply(self.variables, feat, filt,
                              method=lambda m, f, w: m.head_bbreg(f, w))

    # ---------------------------------------------------------------- geometry

    def _encode_ltrb(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """Dense LTRB targets of the boxes on the feature grid, normalized by the
        sample size (reference tomp.py:108-140). boxes (M, 4) xywh ->
        (M, Hf, Wf, 4)."""
        p = self.params
        sz = p.image_sample_size
        stride = p.feature_stride
        loc = jnp.arange(0, sz, stride, dtype=jnp.float32) + stride // 2
        xs = loc[None, None, :]                       # (1, 1, Wf)
        ys = loc[None, :, None]                       # (1, Hf, 1)
        x1 = boxes[:, 0][:, None, None]
        y1 = boxes[:, 1][:, None, None]
        x2 = x1 + boxes[:, 2][:, None, None]
        y2 = y1 + boxes[:, 3][:, None, None]
        l = xs - x1
        t = ys - y1
        r = x2 - xs
        b = y2 - ys
        l, t, r, b = [jnp.broadcast_to(v, (boxes.shape[0], loc.size, loc.size))
                      for v in (l, t, r, b)]
        return jnp.stack([l, t, r, b], axis=-1) / sz

    def _label(self, centers: jnp.ndarray, feat_sz: int, sigma) -> jnp.ndarray:
        """Spatial Gaussian labels at (B, 2) centers offset from the grid center
        (reference dcf.label_function_spatial; ToMP kernel is 1x1 -> no end pad)."""
        return dcf.gauss_2d((feat_sz, feat_sz), sigma, centers)

    # ---------------------------------------------------------------- initialize

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        im_np, true_hw = self._prepare_image(image)
        im = jnp.asarray(im_np)
        bbox = jnp.asarray(info["init_bbox"], jnp.float32)
        key = jax.random.PRNGKey(self._seed)
        image_sz = jnp.asarray(true_hw, jnp.float32)
        patch, coords = self._jit_init_crop(im, bbox, image_sz)
        self.state = self._jit_init_patch(self.variables, patch, coords, bbox,
                                          key, image_sz)
        return {}

    def _init_crop_impl(self, im, bbox, image_sz):
        p = self.params
        im = im.astype(jnp.float32)
        ss = p.image_sample_size
        support = jnp.full(2, float(ss))
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        search_area = jnp.prod(target_sz * p.search_area_scale)
        target_scale = jnp.sqrt(search_area) / float(ss)
        return sample_patch(im, jnp.round(pos), target_scale * support, (ss, ss),
                            mode=p.border_mode,
                            max_scale_change=p.patch_max_scale_change,
                            im_sz=image_sz)

    def _initialize_impl(self, im, bbox, key, image_sz) -> ToMPState:
        patch, coords = self._init_crop_impl(im, bbox, image_sz)
        return self._initialize_from_patch(patch, coords, bbox, key, image_sz)

    def _initialize_from_patch(self, patch, coords, bbox, key, image_sz
                               ) -> ToMPState:
        p = self.params
        ss = p.image_sample_size
        feat_sz = p.train_feature_size
        support = jnp.full(2, float(ss))

        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        search_area = jnp.prod(target_sz * p.search_area_scale)
        target_scale = jnp.sqrt(search_area) / float(ss)
        base_target_sz = target_sz / target_scale
        min_scale = jnp.max(10.0 / base_target_sz)
        max_scale = jnp.min(image_sz / base_target_sz)

        init_pos = jnp.round(pos)
        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / support))

        backbone_feat = self._backbone(patch[None])
        x = self._extract_head(self._head_feat(backbone_feat)[:, None])[:, 0]
        # x (1, h, w, C') extracted head feature — memory stores these directly

        target_box = _get_iounet_box(pos, target_sz, sample_pos, sample_scale, support)

        sigma_val = jnp.sqrt(jnp.prod(feat_sz / support * base_target_sz)) * \
            p.output_sigma_factor
        sigma = sigma_val * jnp.ones(2)
        center = feat_sz * (pos - sample_pos) / (sample_scale * support)
        label = self._label(center[None], feat_sz, sigma)[0]

        M = p.sample_memory_size
        mem_samples = jnp.zeros((M,) + x.shape[1:]).at[0].set(x[0])
        mem_labels = jnp.zeros((M, feat_sz, feat_sz)).at[0].set(label)
        mem_boxes = jnp.zeros((M, 4)).at[0].set(target_box)
        mem_weights = jnp.zeros((M,)).at[0].set(1.0)

        return ToMPState(
            pos=pos, target_sz=target_sz, target_scale=target_scale,
            base_target_sz=base_target_sz, image_sz=image_sz, min_scale=min_scale,
            max_scale=max_scale, sigma=sigma,
            mem_samples=mem_samples, mem_labels=mem_labels, mem_boxes=mem_boxes,
            mem_weights=mem_weights, num_stored=jnp.asarray(1, jnp.int32),
            num_init=jnp.asarray(1, jnp.int32), prev_ind=jnp.asarray(-1, jnp.int32),
            scale_history=jnp.full((p.scale_history_size,), target_scale),
            scale_hist_len=jnp.asarray(1, jnp.int32),
            not_found_counter=jnp.asarray(0, jnp.int32),
            frame_num=jnp.asarray(1, jnp.int32), key=key,
            flag=jnp.asarray(0, jnp.int32), max_score=jnp.asarray(1.0, jnp.float32))

    # ---------------------------------------------------------------- track

    def track_async(self, image, info: Optional[dict] = None):
        im_np, _ = self._prepare_image(image)
        im = jnp.asarray(im_np)
        patch, coords = self._jit_crop(self.state, im)
        self.state, out = self._jit_track_patch(self.variables, self.state,
                                                patch, coords)
        return out

    def fetch_output(self, out) -> dict:
        flag = FLAG_NAMES[int(out["flag"])]
        bbox = np.asarray(out["target_bbox"]).tolist()
        if getattr(self.params, "output_not_found_box", False) and \
                flag == "not_found":
            bbox = [-1, -1, -1, -1]   # reference tomp.py output_not_found_box
        result = {"target_bbox": bbox,
                  "object_presence_score": float(out["max_score"]),
                  "max_score": float(out["max_score"]),
                  "flag": flag}
        if "score_map" in out:
            result["score_map"] = np.asarray(out["score_map"])
        return result

    def track(self, image, info: Optional[dict] = None) -> dict:
        return self.fetch_output(self.track_async(image, info))

    def _track_crop_impl(self, state: ToMPState, im):
        p = self.params
        ss = p.image_sample_size
        support = jnp.full(2, float(ss))
        return sample_patch(im.astype(jnp.float32), state.pos,
                            state.target_scale * support,
                            (ss, ss), mode=p.border_mode,
                            max_scale_change=p.patch_max_scale_change,
                            im_sz=state.image_sz)

    def _track_impl(self, state: ToMPState, im) -> Tuple[ToMPState, dict]:
        patch, coords = self._track_crop_impl(state, im)
        return self._track_from_patch(state, patch, coords)

    def _track_from_patch(self, state: ToMPState, patch, coords
                          ) -> Tuple[ToMPState, dict]:
        p = self.params
        ss = p.image_sample_size
        feat_sz = p.train_feature_size
        support = jnp.full(2, float(ss))
        state = state.replace(frame_num=state.frame_num + 1)

        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / support))

        backbone_feat = self._backbone(patch[None])
        test_x = self._head_feat(backbone_feat)               # (1, Hf, Wf, Cb)

        # ---- transductive model prediction over the memory (tomp.py:282-305)
        M = p.sample_memory_size
        slot_valid = jnp.arange(M) < state.num_stored
        gth_mask = jnp.arange(M) < state.num_init             # slot 0 = gt frame
        train_feat = state.mem_samples[:, None]               # (M,1,h,w,C) cached
        test_feat = self._extract_head(test_x[:, None])               # (1,1,h,w,C)
        train_ltrb = self._encode_ltrb(state.mem_boxes)[:, None]      # (M,1,h,w,4)
        train_label = state.mem_labels[:, None]                       # (M,1,h,w)

        cls_w, bbreg_w, cls_enc, bbreg_enc = self._filters_parallel(
            train_feat, test_feat, train_label, train_ltrb, slot_valid, gth_mask)
        scores = self._classify(cls_enc, cls_w)[0, 0, :, :, 0]        # (h, w)
        bbox_preds = self._bbreg(bbreg_enc, bbreg_w)[0, 0]            # (h, w, 4)

        translation_vec, flag, max_score, score_loc = self._localize(
            state, scores, sample_pos, sample_scale, support)

        # ---- direct box regression at the peak (tomp.py:226-259)
        stride = p.feature_stride
        loc = jnp.arange(0, ss, stride, dtype=jnp.float32) + stride // 2
        ltrb = bbox_preds * float(ss)
        sl = score_loc.astype(jnp.int32)
        lv = ltrb[sl[0], sl[1]]
        xs_c, ys_c = loc[sl[1]], loc[sl[0]]
        x1 = (xs_c - lv[0]) / ss * (coords[3] - coords[1]) + coords[1]
        y1 = (ys_c - lv[1]) / ss * (coords[2] - coords[0]) + coords[0]
        x2 = (xs_c + lv[2]) / ss * (coords[3] - coords[1]) + coords[1]
        y2 = (ys_c + lv[3]) / ss * (coords[2] - coords[0]) + coords[0]
        # clip to image (tomp.py:102-108)
        W, H = state.image_sz[1], state.image_sz[0]
        x1 = jnp.clip(x1, 0.0, W - 10.0)
        y1 = jnp.clip(y1, 0.0, H - 10.0)
        x2 = jnp.clip(x2, x1 + 10.0, W)
        y2 = jnp.clip(y2, y1 + 10.0, H)
        bbox = jnp.stack([x1, y1, x2 - x1, y2 - y1])

        found = flag != FLAG_NOT_FOUND
        new_pos = jnp.stack([bbox[1] + bbox[3] / 2, bbox[0] + bbox[2] / 2])
        new_sz = jnp.stack([bbox[3], bbox[2]])
        new_scale = jnp.sqrt(jnp.prod(new_sz) / jnp.prod(state.base_target_sz))

        pos = jnp.where(found, new_pos, state.pos)
        tsz = jnp.where(found, new_sz, state.target_sz)

        # scale history ring + occlusion rescaling (tomp.py:260-270)
        hist = state.scale_history
        hist_len = state.scale_hist_len
        hist = jnp.where(found, jnp.roll(hist, -1).at[-1].set(new_scale), hist)
        hist_len = jnp.where(found, jnp.minimum(hist_len + 1, p.scale_history_size),
                             hist_len)
        nf_counter = jnp.where(found, 0, state.not_found_counter + 1)
        if p.search_area_rescaling_at_occlusion:
            num_scales = jnp.clip(nf_counter, 2, 30)
            Hn = p.scale_history_size
            idx = jnp.arange(Hn)
            recent = idx >= (Hn - jnp.minimum(num_scales, hist_len))
            bigger = hist >= hist[-1]
            sel = recent & bigger
            resc = jnp.where(sel, hist, 0.0).sum() / jnp.maximum(sel.sum(), 1)
            tscale = jnp.where(found, new_scale, resc)
        else:
            tscale = jnp.where(found, new_scale, state.target_scale)

        state = state.replace(pos=pos, target_sz=tsz, target_scale=tscale,
                              scale_history=hist, scale_hist_len=hist_len,
                              not_found_counter=nf_counter)

        # ---- memory update (tomp.py:182-199)
        update_flag = (flag != FLAG_NOT_FOUND) & (flag != FLAG_UNCERTAIN)
        hard_negative = flag == FLAG_HARD_NEG
        do_update = update_flag & (max_score > p.conf_ths) & p.update_classifier
        lr = jnp.where(hard_negative, p.hard_negative_learning_rate, p.learning_rate)
        target_box = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                     sample_scale, support)
        center = feat_sz * (state.pos - sample_pos) / (sample_scale * support)
        y = self._label(center[None], feat_sz, state.sigma)[0]
        # store this frame's EXTRACTED head feature (already computed above)
        state = self._update_memory(state, test_feat[0, 0], y, target_box, lr,
                                    do_update)

        state = state.replace(flag=flag.astype(jnp.int32), max_score=max_score)
        out_bbox = jnp.concatenate([state.pos[::-1] - (state.target_sz[::-1] - 1) / 2,
                                    state.target_sz[::-1]])
        out = {"target_bbox": out_bbox, "max_score": max_score, "flag": flag}
        if self._debug_outputs:
            out["score_map"] = scores
        return state, out

    # ---------------------------------------------------------------- localization

    def _localize(self, state: ToMPState, scores, sample_pos, sample_scale, support):
        """Advanced localization (tomp.py:306-411); also returns the integer peak
        location for direct box regression."""
        p = self.params
        sz = scores.shape
        score_center = (jnp.array(sz, jnp.float32) - 1) / 2
        output_sz = jnp.array(sz, jnp.float32)  # 1x1 kernel: output == feature size
        disp_to_img = (support / output_sz) * sample_scale

        max_score1, max_disp1 = dcf.max2d(scores)
        max_disp1 = max_disp1.astype(jnp.float32)
        target_disp1 = max_disp1 - score_center
        translation_vec1 = target_disp1 * disp_to_img

        if not p.advanced_localization:
            return translation_vec1, jnp.asarray(FLAG_NORMAL), max_score1, max_disp1

        target_neigh_sz = p.target_neighborhood_scale * (state.target_sz / sample_scale) \
            * (output_sz / support)
        iy = jnp.arange(sz[0], dtype=jnp.float32)[:, None]
        ix = jnp.arange(sz[1], dtype=jnp.float32)[None, :]
        in_neigh = ((jnp.abs(iy - max_disp1[0]) <= target_neigh_sz[0] / 2 + 0.5) &
                    (jnp.abs(ix - max_disp1[1]) <= target_neigh_sz[1] / 2 + 0.5))
        scores_masked = jnp.where(in_neigh, 0.0, scores)
        max_score2, max_disp2 = dcf.max2d(scores_masked)
        max_disp2 = max_disp2.astype(jnp.float32)
        target_disp2 = max_disp2 - score_center
        translation_vec2 = target_disp2 * disp_to_img

        prev_target_vec = (state.pos - sample_pos) / disp_to_img
        disp_norm1 = jnp.sqrt(jnp.sum((target_disp1 - prev_target_vec) ** 2))
        disp_norm2 = jnp.sqrt(jnp.sum((target_disp2 - prev_target_vec) ** 2))
        disp_threshold = p.displacement_scale * math.sqrt(sz[0] * sz[1]) / 2

        distractor = max_score2 > p.distractor_threshold * max_score1
        hn1 = distractor & (disp_norm2 > disp_threshold) & (disp_norm1 < disp_threshold)
        hn2 = distractor & (disp_norm2 < disp_threshold) & (disp_norm1 > disp_threshold)
        uncertain_both = distractor & ~hn1 & ~hn2
        hard_neg2 = (~distractor &
                     (max_score2 > p.hard_negative_threshold * max_score1) &
                     (max_score2 > p.target_not_found_threshold))

        flag = jnp.asarray(FLAG_NORMAL)
        trans = translation_vec1
        loc = max_disp1
        flag = jnp.where(hard_neg2, FLAG_HARD_NEG, flag)
        flag = jnp.where(uncertain_both, FLAG_UNCERTAIN, flag)
        flag = jnp.where(hn2, FLAG_HARD_NEG, flag)
        trans = jnp.where(hn2, translation_vec2, trans)
        loc = jnp.where(hn2, max_disp2, loc)
        flag = jnp.where(hn1, FLAG_HARD_NEG, flag)
        flag = jnp.where(max_score1 < p.hard_sample_threshold, FLAG_HARD_NEG, flag)
        flag = jnp.where(max_score1 < p.uncertain_threshold, FLAG_UNCERTAIN, flag)
        flag = jnp.where(max_score1 < p.target_not_found_threshold, FLAG_NOT_FOUND, flag)
        trans = jnp.where(max_score1 < p.target_not_found_threshold, translation_vec1,
                          trans)
        loc = jnp.where(max_score1 < p.target_not_found_threshold, max_disp1, loc)
        return trans, flag, max_score1, loc

    # ---------------------------------------------------------------- memory

    def _update_memory(self, state: ToMPState, sample, label, target_box, lr,
                       do_update):
        """(tomp.py:536-600), masked fixed-shape version."""
        p = self.params
        sw = state.mem_weights
        M = p.sample_memory_size
        num_init = state.num_init
        num_stored = state.num_stored

        init_w = p.init_samples_minimum_weight
        s_ind = jnp.where(init_w > 0, num_init, 0)
        idx = jnp.arange(M)
        masked_sw = jnp.where(idx >= s_ind, sw, jnp.inf)
        r_ind_full = jnp.argmin(masked_sw).astype(jnp.int32)
        r_ind = jnp.where(num_stored < M, num_stored, r_ind_full).astype(jnp.int32)

        prev = state.prev_ind
        sw_new = jnp.where(prev < 0, sw / (1 - lr), sw)
        new_w = jnp.where(prev < 0, lr, sw[jnp.maximum(prev, 0)] / (1 - lr))
        sw_new = sw_new.at[r_ind].set(new_w)
        sw_new = sw_new / sw_new.sum()
        if init_w and init_w > 0:
            init_mask = idx < num_init
            init_sum = jnp.where(init_mask, sw_new, 0.0).sum()
            rest_sum = jnp.where(~init_mask, sw_new, 0.0).sum()
            need = init_sum < init_w
            sw_adj = jnp.where(init_mask, init_w / jnp.maximum(num_init, 1),
                               sw_new / (init_w + rest_sum))
            sw_new = jnp.where(need, sw_adj, sw_new)

        return state.replace(
            mem_samples=_masked_slot_set(state.mem_samples, r_ind, sample,
                                         do_update),
            mem_labels=_masked_slot_set(state.mem_labels, r_ind, label,
                                        do_update),
            mem_boxes=_masked_slot_set(state.mem_boxes, r_ind, target_box,
                                       do_update),
            mem_weights=jnp.where(do_update, sw_new, state.mem_weights),
            num_stored=jnp.where(do_update, jnp.minimum(num_stored + 1, M), num_stored),
            prev_ind=jnp.where(do_update, r_ind, state.prev_ind))


def get_tracker_class():
    return ToMPTracker
