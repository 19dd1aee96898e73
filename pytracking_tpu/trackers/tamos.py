"""TaMOs tracker — transformer-based multi-object tracking with a shared model
predictor (one forward produces every object's target model).

Re-design of reference `pytracking/tracker/tamos/tamos.py` (TaMOs:28,
remap_object_ids:14): the whole frame (no target-centered crop) is resized to the
sample size; the GOT filter predictor emits K object filters in one forward; per-object
localization + direct LTRB box regression run on the high-res FPN level.

TPU-first: the object axis is a NATIVE array dimension (K fixed slots with a validity
mask) — per-object localization is a vmap over K, the memory stores per-object label
stacks, and the entire per-frame computation (all objects) is ONE jitted step. The
reference loops over objects in Python (tamos.py:180-220).
"""

from __future__ import annotations

import math
from collections import OrderedDict
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
                                          _masked_slot_set)


@dataclass(frozen=True)
class TaMOsParams:
    """(reference pytracking/parameter/tamos/tamos_resnet50.py)"""
    train_feature_size: Tuple[int, int] = (24, 36)
    feature_stride: int = 16
    search_area_scale: float = 5.0
    sample_memory_size: int = 2
    learning_rate: float = 0.01
    hard_negative_learning_rate: float = 0.02
    init_samples_minimum_weight: float = 0.25
    update_classifier: bool = True
    conf_ths: float = 0.85
    normalize_scores: bool = True
    output_sigma_factor: float = 1 / 4
    num_tokens: int = 10
    # localization (advanced, per object)
    advanced_localization: bool = True
    target_not_found_threshold: float = 0.25
    distractor_threshold: float = 0.8
    hard_negative_threshold: float = 0.5
    target_neighborhood_scale: float = 1.5
    displacement_scale: float = 0.8
    uncertain_threshold: float = -float("inf")
    hard_sample_threshold: float = -float("inf")

    @property
    def image_sample_size(self) -> Tuple[int, int]:
        return (self.train_feature_size[0] * self.feature_stride,
                self.train_feature_size[1] * self.feature_stride)


class TaMOsState(struct.PyTreeNode):
    pos: jnp.ndarray                 # (K, 2) (y, x) per object, image coords
    pos_prev: jnp.ndarray            # (K, 2) previous-frame positions (tamos.py:189)
    target_sz: jnp.ndarray           # (K, 2)
    obj_valid: jnp.ndarray           # (K,) bool
    image_sz: jnp.ndarray            # (2,)
    sigma: jnp.ndarray               # (K, 2) label sigmas (feature cells)
    mem_samples: jnp.ndarray         # (M, h, w, Cb) head-layer backbone features
    mem_labels: jnp.ndarray          # (M, K, h, w)
    mem_boxes: jnp.ndarray           # (M, K, 4) [x,y,w,h] in SAMPLE coords
    mem_weights: jnp.ndarray         # (M,)
    num_stored: jnp.ndarray
    prev_ind: jnp.ndarray
    frame_num: jnp.ndarray
    flag: jnp.ndarray                # (K,)
    max_score: jnp.ndarray           # (K,)


class TaMOsTracker(BaseTracker):
    multiobj_mode = "default"        # natively multi-object

    def __init__(self, params: TaMOsParams, net, variables):
        super().__init__(params)
        self.net = net
        # device_put ONCE: variables may arrive host/CPU-resident (CPU-side init,
        # msgpack load) — passing host arrays to a jitted call re-uploads them per
        # frame (~100MB through the axon tunnel)
        self.variables = jax.device_put(variables)
        self._jit_init = self._jit_with_variables(self._initialize_impl)
        self._jit_track = self._jit_with_variables(self._track_impl, donate_state=True)
        # split dispatch: shape-specialized whole-frame warp + shape-independent
        # heavy step (see DiMPTracker.__init__)
        self._jit_crop = jax.jit(self._track_crop_impl)
        self._jit_track_patch = self._jit_with_variables(self._track_from_patch,
                                                         donate_state=True)
        self._jit_init_crop = jax.jit(self._init_crop_impl)
        self._jit_init_patch = self._jit_with_variables(self._initialize_from_patch)
        self.state: Optional[TaMOsState] = None
        self.id_map: Dict[int, str] = {}
        self.mot_dataset = False

    # ---------------------------------------------------------------- net helpers

    def _backbone(self, im):
        return self.net.apply(self.variables, im,
                              method=lambda m, x: m.extract_backbone(x))

    def _head_feat(self, backbone_feat):
        return self.net.apply(self.variables, backbone_feat,
                              method=lambda m, f: m.extract_head_feat(f))

    def _predict_filters(self, train_feat, test_feat, train_label, frame_mask):
        return self.net.apply(
            self.variables, train_feat, test_feat, train_label,
            method=lambda m, a, b, c: m.predict_filters(a, b, c,
                                                        train_frame_mask=frame_mask))

    def _predict_filters_parallel(self, train_feat, test_feat, train_label,
                                  train_ltrb, frame_mask, gth_mask):
        return self.net.apply(
            self.variables, train_feat, test_feat, train_label, train_ltrb,
            method=lambda m, a, b, c, d: m.predict_filters_parallel(
                a, b, c, d, frame_mask, gth_mask))

    def _classify_trafo(self, test_feat_enc, filters, out_hw):
        return self.net.apply(
            self.variables, test_feat_enc, filters,
            method=lambda m, f, w: m.classify_trafo(f, w, out_hw))

    def _encode_ltrb(self, boxes):
        """(M, K, 4) [x,y,w,h] sample-coord boxes -> per-cell LTRB maps
        (M, K, h, w, 4) normalized by the sample size; zeros for empty boxes
        (reference tamos.py:114-154 encode_bbox)."""
        p = self.params
        Hs, Ws = p.image_sample_size
        h, w = p.train_feature_size
        stride = p.feature_stride
        xs = jnp.arange(w, dtype=jnp.float32) * stride + stride // 2   # (w,)
        ys = jnp.arange(h, dtype=jnp.float32) * stride + stride // 2   # (h,)
        x1 = boxes[..., 0]
        y1 = boxes[..., 1]
        x2 = boxes[..., 0] + boxes[..., 2]
        y2 = boxes[..., 1] + boxes[..., 3]
        l = (xs[None, None, None, :] - x1[..., None, None]) / Ws       # (M,K,1,w)/b
        t = (ys[None, None, :, None] - y1[..., None, None]) / Hs
        r = (x2[..., None, None] - xs[None, None, None, :]) / Ws
        b = (y2[..., None, None] - ys[None, None, :, None]) / Hs
        ltrb = jnp.stack([jnp.broadcast_to(l, l.shape[:2] + (h, w)),
                          jnp.broadcast_to(t, t.shape[:2] + (h, w)),
                          jnp.broadcast_to(r, r.shape[:2] + (h, w)),
                          jnp.broadcast_to(b, b.shape[:2] + (h, w))], axis=-1)
        valid = (boxes[..., 2] > 0) & (boxes[..., 3] > 0)
        return jnp.where(valid[..., None, None, None], ltrb, 0.0)

    def _fpn(self, te_enc, backbone_feat):
        return self.net.apply(self.variables, te_enc, backbone_feat,
                              method=lambda m, e, f: m.run_fpn(e, f))

    def _classify(self, feat, filters):
        return self.net.apply(self.variables, feat, filters,
                              method=lambda m, f, w: m.classify(f, w))

    def _bbreg(self, feat, filters):
        return self.net.apply(self.variables, feat, filters,
                              method=lambda m, f, w: m.bbreg(f, w))

    # ---------------------------------------------------------------- host API

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        p = self.params
        K = p.num_tokens

        im_np, true_hw = self._prepare_image(image)
        im = jnp.asarray(im_np)
        if "init_object_ids" in info or isinstance(info.get("init_bbox"), dict):
            self.mot_dataset = True
            bboxes_dict = info["init_bbox"]
            ext_ids = list(bboxes_dict.keys())
        else:
            self.mot_dataset = False
            bboxes_dict = {"1": info["init_bbox"]}
            ext_ids = ["1"]
        # object-id remapping to token slots (reference remap_object_ids :14-26)
        self.id_map = {i: oid for i, oid in enumerate(ext_ids)}

        boxes = np.zeros((K, 4), np.float32)
        valid = np.zeros((K,), bool)
        for i, oid in enumerate(ext_ids[:K]):
            boxes[i] = np.asarray(bboxes_dict[oid], np.float32)
            valid[i] = True

        image_sz = jnp.asarray(true_hw, jnp.float32)
        frame, sfac = self._jit_init_crop(im, image_sz)
        self.state = self._jit_init_patch(self.variables, frame, sfac,
                                          jnp.asarray(boxes),
                                          jnp.asarray(valid), image_sz)
        return {}

    def track(self, image, info: Optional[dict] = None) -> dict:
        im_np, _ = self._prepare_image(image)
        im = jnp.asarray(im_np)
        frame, sfac = self._jit_crop(self.state, im)
        self.state, out = self._jit_track_patch(self.variables, self.state,
                                                frame, sfac)
        boxes = np.asarray(out["target_bbox"])
        scores = np.asarray(out["max_score"])
        flags = np.asarray(out["flag"])
        not_found_box = getattr(self.params, "output_not_found_box", False)
        out_boxes = OrderedDict()
        out_scores = OrderedDict()
        for slot, oid in self.id_map.items():
            if not_found_box and int(flags[slot]) == FLAG_NOT_FOUND:
                # reference tamos.py:210-213
                out_boxes[oid] = [-1, -1, -1, -1]
            else:
                out_boxes[oid] = boxes[slot].tolist()
            out_scores[oid] = float(scores[slot])
        if not self.mot_dataset:
            result = {"target_bbox": out_boxes["1"],
                      "object_presence_score": out_scores["1"]}
        else:
            result = {"target_bbox": out_boxes,
                      "object_presence_score": out_scores}
        if "score_map" in out:
            result["score_map"] = np.asarray(out["score_map"][0])  # object slot 0
        return result

    # ---------------------------------------------------------------- impl

    def _whole_frame_sample(self, im, Hs: int, Ws: int, image_sz):
        """Resize the whole frame with ONE scale factor (aspect preserved) and
        replicate-pad to (Hs, Ws) (reference tamos.py:431-452). Returns
        (frame (Hs, Ws, 3), scale_factor).

        `image_sz` is the TRUE (H, W) as a traced (2,) array — the scale factor
        is traced, so the warp (a fixed-shape sample_patch whose triangle filter
        equals jax.image.resize's antialiased bilinear) compiles ONE program for
        every frame shape in a bucket; the area beyond the true frame replicates
        the border exactly like the reference's edge padding."""
        H_im, W_im = image_sz[0], image_sz[1]
        s = jnp.where(H_im / W_im <= float(Hs) / Ws, Ws / W_im, Hs / H_im)
        extent = jnp.array([Hs, Ws], jnp.float32) / s
        pos = extent / 2.0 - 0.5
        frame, _ = sample_patch(im, pos, extent, (Hs, Ws), mode="replicate")
        return frame, s

    def _label_batch(self, centers, sigmas, feat_sz):
        """Per-object Gaussian labels (K, h, w); zero for invalid objects handled by
        caller."""
        h, w = feat_sz

        def one(c, s):
            return dcf.gauss_2d((h, w), s, c[None])[0]

        return jax.vmap(one)(centers, sigmas)

    def _initialize_impl(self, im, boxes, valid, image_sz) -> TaMOsState:
        frame, sfac = self._init_crop_impl(im, image_sz)
        return self._initialize_from_patch(frame, sfac, boxes, valid, image_sz)

    def _initialize_from_patch(self, frame, sfac, boxes, valid, image_sz
                               ) -> TaMOsState:
        p = self.params
        Hs, Ws = p.image_sample_size
        h, w = p.train_feature_size
        K = p.num_tokens

        # whole-frame sample with PRESERVED aspect ratio: one isotropic scale
        # factor + replicate padding (reference extract_backbone_features
        # :431-452; an anisotropic resize distorts objects and breaks the
        # box/label geometry). im.shape is static per sequence, so the scale
        # and padded extents are trace-time constants.
        backbone_feat = self._backbone(frame[None])
        x = self.net.apply(self.variables, backbone_feat,
                           method=lambda m, f: f[m.head_layer])  # (1, h, w, Cb)

        pos = jnp.stack([boxes[:, 1] + (boxes[:, 3] - 1) / 2,
                         boxes[:, 0] + (boxes[:, 2] - 1) / 2], axis=-1)
        target_sz = jnp.stack([boxes[:, 3], boxes[:, 2]], axis=-1)

        # label sigma per object (reference init_target_labels :475-494)
        sz_sample = target_sz * sfac
        sigma = jnp.sqrt(jnp.prod(sz_sample / p.feature_stride, axis=-1,
                                  keepdims=True)) * p.output_sigma_factor * \
            jnp.ones((1, 2))
        centers = (pos * sfac) / p.feature_stride - \
            jnp.array([(h - 1) / 2, (w - 1) / 2])
        labels = self._label_batch(centers, sigma, (h, w))
        labels = jnp.where(valid[:, None, None], labels, 0.0)

        M = p.sample_memory_size
        # memory caches EXTRACTED head features (the reference re-runs the head
        # feature extractor on the whole memory every frame, tamos.py:290; the
        # extractor is per-sample deterministic so store-time extraction is
        # mathematically identical and cheaper per frame)
        x_head = self._head_feat_mem(x)[:, 0]                  # (1, h, w, C)
        mem_samples = jnp.zeros((M,) + x_head.shape[1:]).at[0].set(x_head[0])
        mem_labels = jnp.zeros((M, K, h, w)).at[0].set(labels)
        # boxes in sample coordinates (isotropic scale)
        sample_boxes = boxes * sfac
        sample_boxes = jnp.where(valid[:, None], sample_boxes, 0.0)
        mem_boxes = jnp.zeros((M, K, 4)).at[0].set(sample_boxes)
        mem_weights = jnp.zeros((M,)).at[0].set(1.0)

        return TaMOsState(pos=pos, pos_prev=pos, target_sz=target_sz,
                          obj_valid=valid,
                          image_sz=image_sz, sigma=sigma,
                          mem_samples=mem_samples, mem_labels=mem_labels,
                          mem_boxes=mem_boxes, mem_weights=mem_weights,
                          num_stored=jnp.asarray(1, jnp.int32),
                          prev_ind=jnp.asarray(-1, jnp.int32),
                          frame_num=jnp.asarray(1, jnp.int32),
                          flag=jnp.zeros((K,), jnp.int32),
                          max_score=jnp.ones((K,)))

    def _init_crop_impl(self, im, image_sz):
        Hs, Ws = self.params.image_sample_size
        return self._whole_frame_sample(im.astype(jnp.float32), Hs, Ws, image_sz)

    def _track_crop_impl(self, state: TaMOsState, im):
        Hs, Ws = self.params.image_sample_size
        return self._whole_frame_sample(im.astype(jnp.float32), Hs, Ws,
                                        state.image_sz)

    def _track_impl(self, state: TaMOsState, im):
        frame, sfac = self._track_crop_impl(state, im)
        return self._track_from_patch(state, frame, sfac)

    def _track_from_patch(self, state: TaMOsState, frame, sfac):
        p = self.params
        Hs, Ws = p.image_sample_size
        h, w = p.train_feature_size
        K = p.num_tokens
        stride = p.feature_stride
        state = state.replace(frame_num=state.frame_num + 1)

        backbone_feat = self._backbone(frame[None])
        test_x = self.net.apply(self.variables, backbone_feat,
                                method=lambda m, f: f[m.head_layer])

        M = p.sample_memory_size
        frame_mask = jnp.arange(M) < state.num_stored

        train_feat = state.mem_samples[:, None]    # cached extracted head feats
        test_feat = self._head_feat_mem(test_x)

        # parallel cls/bbreg filter prediction with LTRB box-token encodings
        # (reference tamos.py:290-307): cls sees every valid memory frame,
        # bbreg only the ground-truth init frame (memory slot 0)
        train_ltrb = self._encode_ltrb(state.mem_boxes)[:, None]  # (M,1,K,h,w,4)
        gth_mask = jnp.arange(M) == 0
        cls_w, bb_w, cls_enc, bb_enc = self._predict_filters_parallel(
            train_feat, test_feat, state.mem_labels[:, None], train_ltrb,
            frame_mask, gth_mask)
        pyr = self._fpn(bb_enc, backbone_feat)
        h2w2 = (pyr["feat2"].shape[2], pyr["feat2"].shape[3])
        # classification on the transformer stride-16 feature, bicubically
        # upsampled to the high-res grid (reference tamos.py:313-321 'trafo')
        scores = self._classify_trafo(cls_enc, cls_w, h2w2)[0, 0]  # (h2, w2, K)
        ltrb = self._bbreg(pyr["feat2"], bb_w)[0, 0]               # (h2, w2, K, 4)
        if p.normalize_scores:
            scores = jax.nn.sigmoid(scores)

        h2, w2 = scores.shape[0], scores.shape[1]
        stride2 = Hs // h2

        # per-object localization + direct box regression, vmapped over K
        cell_px = stride2 / sfac  # image px per score cell (tamos.py:372)

        def per_object(score_k, ltrb_k, pos_k, pos_prev_k, sz_k):
            flag, loc, max_score = self._localize_one(score_k, pos_k,
                                                      pos_prev_k, sz_k,
                                                      (h2, w2), cell_px)
            lv = ltrb_k[loc[0], loc[1]] * jnp.array([Ws, Hs, Ws, Hs])
            xc = loc[1].astype(jnp.float32) * stride2 + stride2 / 2
            yc = loc[0].astype(jnp.float32) * stride2 + stride2 / 2
            # sample coords -> image coords via the isotropic scale factor
            x1 = (xc - lv[0]) / sfac
            y1 = (yc - lv[1]) / sfac
            x2 = (xc + lv[2]) / sfac
            y2 = (yc + lv[3]) / sfac
            x1 = jnp.clip(x1, 0.0, state.image_sz[1] - 10.0)
            y1 = jnp.clip(y1, 0.0, state.image_sz[0] - 10.0)
            x2 = jnp.clip(x2, x1 + 10.0, state.image_sz[1])
            y2 = jnp.clip(y2, y1 + 10.0, state.image_sz[0])
            found = flag != FLAG_NOT_FOUND
            new_pos = jnp.where(found,
                                jnp.stack([(y1 + y2) / 2, (x1 + x2) / 2]), pos_k)
            new_sz = jnp.where(found, jnp.stack([y2 - y1, x2 - x1]), sz_k)
            return new_pos, new_sz, flag, max_score

        scores_k = scores.transpose(2, 0, 1)                     # (K, h2, w2)
        ltrb_k = ltrb.transpose(2, 0, 1, 3)                      # (K, h2, w2, 4)
        new_pos, new_sz, flags, max_scores = jax.vmap(per_object)(
            scores_k, ltrb_k, state.pos, state.pos_prev, state.target_sz)

        # pos_prev follows the old pos only on found frames (tamos.py:188-191)
        moved = state.obj_valid & (flags != FLAG_NOT_FOUND)
        state = state.replace(
            pos_prev=jnp.where(moved[:, None], state.pos, state.pos_prev),
            pos=jnp.where(state.obj_valid[:, None], new_pos, state.pos),
            target_sz=jnp.where(state.obj_valid[:, None], new_sz, state.target_sz),
            flag=flags, max_score=max_scores)

        # ---- memory update: only when EVERY valid object is confidently found
        # (reference tamos.py:218-221)
        per_obj_ok = (~state.obj_valid) | ((flags != FLAG_NOT_FOUND) &
                                           (flags != FLAG_UNCERTAIN) &
                                           (max_scores > p.conf_ths))
        do_update = per_obj_ok.all() & p.update_classifier
        # learning rate follows the LAST valid object's flag — the reference's
        # per-object loop variable survives into its single update_memory call
        # (tamos.py:196-197,220)
        K = state.obj_valid.shape[0]
        last_obj = (K - 1) - jnp.argmax(state.obj_valid[::-1].astype(jnp.int32))
        lr = jnp.where(flags[last_obj] == FLAG_HARD_NEG,
                       p.hard_negative_learning_rate, p.learning_rate)
        centers = (state.pos * sfac) / stride - \
            jnp.array([(h - 1) / 2, (w - 1) / 2])
        labels = self._label_batch(centers, state.sigma, (h, w))
        labels = jnp.where(state.obj_valid[:, None, None], labels, 0.0)
        cur_boxes = jnp.concatenate(
            [state.pos[:, ::-1] - (state.target_sz[:, ::-1] - 1) / 2,
             state.target_sz[:, ::-1]], axis=-1)
        sample_boxes = cur_boxes * sfac
        sample_boxes = jnp.where(state.obj_valid[:, None], sample_boxes, 0.0)
        # store this frame's EXTRACTED head feature (already computed above)
        state = self._update_memory(state, test_feat[0, 0], labels, sample_boxes,
                                    lr, do_update)

        boxes = jnp.concatenate([state.pos[:, ::-1] - (state.target_sz[:, ::-1] - 1)
                                 / 2, state.target_sz[:, ::-1]], axis=-1)
        out = {"target_bbox": boxes, "max_score": max_scores, "flag": flags}
        if self._debug_outputs:
            out["score_map"] = scores_k
        return state, out

    def _head_feat_mem(self, feats):
        """(B, h, w, Cb) -> (B, 1, h, w, C) head features."""
        out = self.net.apply(self.variables, feats,
                             method=lambda m, f: m.head_feature_extractor(f))
        return out[:, None]

    def _localize_one(self, score, pos, pos_prev, sz, score_shape, cell_px):
        """Advanced localization for one object (reference tamos.py:366-427,
        ATOM-style): object-position-relative displacements, integer-rounded
        neighborhood rectangle, distractor displacement analysis with
        second-peak recovery. `cell_px` = image px per score cell =
        (img_support_sz/output_sz)/scale_factor."""
        p = self.params
        h2, w2 = score_shape
        score_center = pos / cell_px                          # (y, x) cells

        max1, disp1 = dcf.max2d(score)
        disp1f = disp1.astype(jnp.float32)
        target_disp1 = disp1f - score_center

        # neighborhood rectangle, rounded and clamped exactly as the reference
        # (tamos.py:396-401; round() is round-half-even, as jnp.round)
        neigh = p.target_neighborhood_scale * sz / cell_px
        top = jnp.clip(jnp.round(disp1f[0] - neigh[0] / 2), 0, h2)
        bottom = jnp.clip(jnp.round(disp1f[0] + neigh[0] / 2 + 1), 0, h2)
        left = jnp.clip(jnp.round(disp1f[1] - neigh[1] / 2), 0, w2)
        right = jnp.clip(jnp.round(disp1f[1] + neigh[1] / 2 + 1), 0, w2)
        iy = jnp.arange(h2, dtype=jnp.float32)[:, None]
        ix = jnp.arange(w2, dtype=jnp.float32)[None, :]
        in_neigh = (iy >= top) & (iy < bottom) & (ix >= left) & (ix < right)
        masked = jnp.where(in_neigh, 0.0, score)
        max2, disp2 = dcf.max2d(masked)
        disp2f = disp2.astype(jnp.float32)
        target_disp2 = disp2f - score_center

        prev_target_vec = (pos - pos_prev) / cell_px
        disp_norm1 = jnp.sqrt(jnp.sum((target_disp1 - prev_target_vec) ** 2))
        disp_norm2 = jnp.sqrt(jnp.sum((target_disp2 - prev_target_vec) ** 2))
        disp_threshold = p.displacement_scale * math.sqrt(h2 * w2) / 2

        distractor = max2 > p.distractor_threshold * max1
        hn1 = distractor & (disp_norm2 > disp_threshold) & \
            (disp_norm1 < disp_threshold)
        hn2 = distractor & (disp_norm2 < disp_threshold) & \
            (disp_norm1 > disp_threshold)
        uncertain_both = distractor & ~hn1 & ~hn2
        hard_neg_plain = (~distractor &
                          (max2 > p.hard_negative_threshold * max1) &
                          (max2 > p.target_not_found_threshold))

        # explicit int32 (not weak-typed): a weak-typed flag in the output
        # state retraces the whole track program on the SECOND frame — the
        # same bug 3f5bdd7 fixed for max_score; pinned by test_one_compile
        flag = jnp.asarray(FLAG_NORMAL, jnp.int32)
        loc = disp1
        flag = jnp.where(hard_neg_plain, FLAG_HARD_NEG, flag)
        flag = jnp.where(uncertain_both, FLAG_UNCERTAIN, flag)
        flag = jnp.where(hn2, FLAG_HARD_NEG, flag)
        loc = jnp.where(hn2, disp2, loc)
        flag = jnp.where(hn1, FLAG_HARD_NEG, flag)
        loc = jnp.where(hn1, disp1, loc)
        # score-threshold flags dominate (tamos.py:386-391)
        flag = jnp.where(max1 < p.hard_sample_threshold, FLAG_HARD_NEG, flag)
        loc = jnp.where(max1 < p.hard_sample_threshold, disp1, loc)
        flag = jnp.where(max1 < p.uncertain_threshold, FLAG_UNCERTAIN, flag)
        # reference tamos.py:388-389 early-returns max_disp1 here, so an
        # uncertain score also discards any hn2-selected distractor peak
        loc = jnp.where(max1 < p.uncertain_threshold, disp1, loc)
        flag = jnp.where(max1 < p.target_not_found_threshold, FLAG_NOT_FOUND, flag)
        loc = jnp.where(max1 < p.target_not_found_threshold, disp1, loc)
        return flag, loc, max1

    def _update_memory(self, state: TaMOsState, sample, labels, boxes, lr,
                       do_update):
        p = self.params
        M = p.sample_memory_size
        sw = state.mem_weights
        num_stored = state.num_stored
        init_w = p.init_samples_minimum_weight

        idx = jnp.arange(M)
        masked_sw = jnp.where(idx >= 1, sw, jnp.inf)     # slot 0 = init frame
        r_ind_full = jnp.argmin(masked_sw).astype(jnp.int32)
        r_ind = jnp.where(num_stored < M, num_stored, r_ind_full).astype(jnp.int32)

        prev = state.prev_ind
        sw_new = jnp.where(prev < 0, sw / (1 - lr), sw)
        new_w = jnp.where(prev < 0, lr, sw[jnp.maximum(prev, 0)] / (1 - lr))
        sw_new = sw_new.at[r_ind].set(new_w)
        sw_new = sw_new / sw_new.sum()
        if init_w and init_w > 0:
            init_mask_ = idx < 1
            init_sum = jnp.where(init_mask_, sw_new, 0.0).sum()
            rest_sum = jnp.where(~init_mask_, sw_new, 0.0).sum()
            need = init_sum < init_w
            sw_adj = jnp.where(init_mask_, init_w, sw_new / (init_w + rest_sum))
            sw_new = jnp.where(need, sw_adj, sw_new)

        return state.replace(
            mem_samples=_masked_slot_set(state.mem_samples, r_ind, sample,
                                         do_update),
            mem_labels=_masked_slot_set(state.mem_labels, r_ind, labels,
                                        do_update),
            mem_boxes=_masked_slot_set(state.mem_boxes, r_ind, boxes,
                                       do_update),
            mem_weights=jnp.where(do_update, sw_new, state.mem_weights),
            num_stored=jnp.where(do_update, jnp.minimum(num_stored + 1, M),
                                 num_stored),
            prev_ind=jnp.where(do_update, r_ind, state.prev_ind))


def get_tracker_class():
    return TaMOsTracker
