"""LWL tracker — video object segmentation with a few-shot-learned target model.

Re-design of reference `pytracking/tracker/lwl/lwl.py` (LWL:14): per frame, the
previous frame's (merged) segmentation updates the target model and determines the
search region; the target model + decoder predict the current mask, which is pasted
back into full-image score maps.

TPU-first details:
  * `convert_scores_crop_to_image` (reference :330-360) resizes the crop scores by a
    dynamic scale factor and pastes with dynamic slicing; here it is ONE inverse
    bilinear warp — each image pixel samples the crop at its (traced) back-projected
    coordinate, outside pixels get −100 — fixed shapes, no host sync.
  * The previous frame's full-image raw scores stay ON DEVICE between frames (they are
    both an output and the next step's input); only the final uint8 mask is fetched.
  * The 32-slot sample memory stores target-model features + crop-resolution masks with
    a weight vector; empty slots have zero weight.

Multi-object: `merge_results` implements the soft-aggregation merge (reference
:211-275) and is called by the MultiObjectWrapper.
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

from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.trackers.base import BaseTracker
from pytracking_tpu.trackers.dimp import _masked_slot_set


@dataclass(frozen=True)
class LWLParams:
    """Static config (reference pytracking/parameter/lwl/lwl_ytvos.py)."""
    image_sample_size: Tuple[int, int] = (30 * 16, 52 * 16)
    search_area_scale: float = 5.0
    border_mode: str = "inside_major"
    patch_max_scale_change: Optional[float] = None
    feature_stride: int = 16
    kernel_size: int = 3
    sample_memory_size: int = 32
    learning_rate: float = 0.1
    init_samples_minimum_weight: float = 0.25
    train_skipping: int = 1
    train_sample_interval: int = 1
    update_target_model: bool = True
    net_opt_iter: int = 20
    net_opt_update_iter: int = 3
    seg_to_bb_mode: str = "var"
    seg_to_bb_sz_factor: float = 4.0
    min_mask_area: float = 100.0
    max_scale_change: Tuple[float, float] = (0.95, 1.1)


class LWLState(struct.PyTreeNode):
    pos: jnp.ndarray
    target_sz: jnp.ndarray
    target_scale: jnp.ndarray
    base_target_sz: jnp.ndarray
    image_sz: jnp.ndarray
    prev_pos: jnp.ndarray            # search-region center of the previous frame
    prev_scale: jnp.ndarray
    prev_test_x: jnp.ndarray         # (1, h, w, C) previous frame's tm features
    target_filter: jnp.ndarray       # (1, fs, fs, C, K)
    mem_samples: jnp.ndarray         # (M, h, w, C)
    mem_masks: jnp.ndarray           # (M, Hs, Ws) crop-resolution soft masks
    mem_weights: jnp.ndarray
    num_stored: jnp.ndarray
    num_init: jnp.ndarray
    prev_ind: jnp.ndarray
    frame_num: jnp.ndarray
    seg_raw: jnp.ndarray             # (H, W) full-image raw scores of last frame


class LWLTracker(BaseTracker):
    supports_shape_buckets = False   # image-shaped mask outputs; see BaseTracker
    multiobj_mode = "parallel"
    predicts_segmentation_mask = True

    def __init__(self, params: LWLParams, net, variables):
        super().__init__(params)
        self.net = net
        # device_put ONCE: variables may arrive host/CPU-resident (CPU-side init,
        # msgpack load) — passing host arrays to a jitted call re-uploads them per
        # frame (~100MB through the axon tunnel)
        self.variables = jax.device_put(variables)
        self._jit_init = self._jit_with_variables(self._initialize_impl)
        # donate_state: the target-model sample memory + feature caches are
        # full-resolution buffers — in-place reuse instead of a per-frame copy
        self._jit_track = self._jit_with_variables(self._track_impl,
                                                   donate_state=True)
        self.state: Optional[LWLState] = None
        self.object_id = None

    # ---------------------------------------------------------------- net helpers

    def _backbone(self, im_patches):
        return self.net.apply(self.variables, im_patches,
                              method=lambda m, x: m.extract_backbone(x))

    def _tm_features(self, backbone_feat):
        return self.net.apply(self.variables, backbone_feat,
                              method=lambda m, f: m.extract_target_model_features(f))

    def _label_encode(self, masks, feat=None):
        return self.net.apply(self.variables, masks, feat,
                              method=lambda m, ma, fe: m.label_encode(ma, fe))

    def _get_filter(self, feat, label, sw, num_iter):
        return self.net.apply(
            self.variables, feat, label, sw,
            method=lambda m, f, l, w: m.tm_get_filter(f, l, w, num_iter=num_iter))

    def _update_filter(self, filt, feat, label, sw, num_iter):
        return self.net.apply(
            self.variables, filt, feat, label, sw,
            method=lambda m, ft, f, l, w: m.tm_update_filter(ft, f, l, w,
                                                             num_iter=num_iter))

    def _segment(self, filt, test_feat_tm, backbone_feat, image_size):
        return self.net.apply(
            self.variables, filt, test_feat_tm, backbone_feat,
            method=lambda m, ft, tf, bf: m.segment_target(ft, tf, bf, image_size))

    # ---------------------------------------------------------------- initialize

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        self.object_id = (info.get("object_ids") or [None])[0]
        im = jnp.asarray(image)
        bbox = jnp.asarray(info["init_bbox"], jnp.float32)
        init_mask = info.get("init_mask")
        if init_mask is None:
            if getattr(self.net, "box_label_encoder", None) is None:
                raise Exception("No init mask provided for LWL")
            # box-initialized VOS (reference lwl_boxinit): bootstrap the mask from
            # the box via the box label encoder + decoder
            if not hasattr(self, "_jit_boxinit"):
                self._jit_boxinit = self._jit_with_variables(self._boxinit_mask_impl)
            mask = self._jit_boxinit(self.variables, im, bbox)
        else:
            mask = jnp.asarray(np.asarray(init_mask), jnp.float32)
        self.state = self._jit_init(self.variables, im, bbox, mask)
        # state.seg_raw at init is the 0/1 mask (probabilities). The output
        # convention differs per mode (mirrors track()): multi-object emits raw
        # LOGITS for merge_results' sigmoid (binary mask -> +/-100 pseudo-logits,
        # the reference's (mask-0.5)*200 convention, lwl.py:253), single-object
        # emits probabilities.
        mask_np = np.asarray(self.state.seg_raw, np.float32)
        seg = (mask_np > 0.5).astype(np.uint8)
        if self.object_id is None:
            raw = mask_np
        else:
            raw = (mask_np - 0.5) * 200.0
        return {"segmentation": seg, "segmentation_raw": raw}

    def _boxinit_mask_impl(self, im, bbox):
        """First-frame mask from a box (reference lwl_box_net.py:126-136 via
        parameter/lwl/lwl_boxinit.py): crop around the box, box-encode, decode a
        mask, paste its probabilities back to image coordinates."""
        from pytracking_tpu.ops.patch import _resample_weights

        p = self.params
        im_f = im.astype(jnp.float32)
        Hs, Ws = p.image_sample_size
        support = jnp.array([float(Hs), float(Ws)])
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        search_area = jnp.prod(target_sz * p.search_area_scale)
        target_scale = jnp.sqrt(search_area) / jnp.sqrt(jnp.prod(support))
        patch, coords = sample_patch(im_f, jnp.round(pos), target_scale * support,
                                     (Hs, Ws), mode=p.border_mode,
                                     max_scale_change=p.patch_max_scale_change)
        backbone_feat = self._backbone(patch[None])
        feat_tm = self._tm_features(backbone_feat)            # (1, h, w, C)

        # box in crop coordinates
        tl = coords[:2]
        sz = coords[2:] - coords[:2]
        scale_yx = jnp.array([Hs, Ws]) / sz
        bb_crop = jnp.array([(bbox[0] - tl[1]) * scale_yx[1],
                             (bbox[1] - tl[0]) * scale_yx[0],
                             bbox[2] * scale_yx[1], bbox[3] * scale_yx[0]])
        mask_logits, _ = self.net.apply(
            self.variables, bb_crop[None, None], feat_tm[:, None], backbone_feat,
            (Hs, Ws),
            method=lambda m, b, f, bf, s: m.segment_target_from_box(b, f, bf, s))

        # paste probabilities to image coords (separable resample)
        H, W = im.shape[0], im.shape[1]
        cy = (jnp.arange(H, dtype=jnp.float32) - tl[0]) * Hs / sz[0] - 0.5
        cx = (jnp.arange(W, dtype=jnp.float32) - tl[1]) * Ws / sz[1] - 0.5
        ry = _resample_weights(cy, Hs, jnp.asarray(1.0))
        rx = _resample_weights(cx, Ws, jnp.asarray(1.0))
        vals = jnp.einsum("ih,hw->iw", ry, mask_logits)
        vals = jnp.einsum("jw,iw->ij", rx, vals)
        inside = ((cy >= -0.5) & (cy <= Hs - 0.5))[:, None] & \
            ((cx >= -0.5) & (cx <= Ws - 0.5))[None, :]
        return ((jax.nn.sigmoid(vals) > 0.5) & inside).astype(jnp.float32)

    def _initialize_impl(self, im, bbox, init_mask) -> LWLState:
        p = self.params
        im = im.astype(jnp.float32)
        Hs, Ws = p.image_sample_size
        support = jnp.array([float(Hs), float(Ws)])

        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        image_sz = jnp.array(im.shape[:2], jnp.float32)
        search_area = jnp.prod(target_sz * p.search_area_scale)
        target_scale = jnp.sqrt(search_area) / jnp.sqrt(jnp.prod(support))
        base_target_sz = target_sz / target_scale

        init_pos = jnp.round(pos)
        patch, coords = sample_patch(im, init_pos, target_scale * support, (Hs, Ws),
                                     mode=p.border_mode,
                                     max_scale_change=p.patch_max_scale_change)
        mask_patch, _ = sample_patch(init_mask[..., None], init_pos,
                                     target_scale * support, (Hs, Ws),
                                     mode=p.border_mode,
                                     max_scale_change=p.patch_max_scale_change,
                                     is_mask=True)
        mask_patch = mask_patch[..., 0]

        backbone_feat = self._backbone(patch[None])
        x = self._tm_features(backbone_feat)                  # (1, h, w, C)

        label, sw = self._label_encode(mask_patch[None, None], x[:, None])
        target_filter, _, _ = self._get_filter(x[:, None], label, sw, p.net_opt_iter)

        M = p.sample_memory_size
        mem_samples = jnp.zeros((M,) + x.shape[1:]).at[0].set(x[0])
        mem_masks = jnp.zeros((M, Hs, Ws)).at[0].set(mask_patch)
        mem_weights = jnp.zeros((M,)).at[0].set(1.0)

        # fallback previous-frame probabilities: the 0/1 init mask itself
        seg_raw = init_mask

        return LWLState(
            pos=pos, target_sz=target_sz, target_scale=target_scale,
            base_target_sz=base_target_sz, image_sz=image_sz,
            prev_pos=init_pos, prev_scale=target_scale, prev_test_x=x,
            target_filter=target_filter, mem_samples=mem_samples,
            mem_masks=mem_masks, mem_weights=mem_weights,
            num_stored=jnp.asarray(1, jnp.int32), num_init=jnp.asarray(1, jnp.int32),
            prev_ind=jnp.asarray(-1, jnp.int32), frame_num=jnp.asarray(1, jnp.int32),
            seg_raw=seg_raw)

    # ---------------------------------------------------------------- track

    def track(self, image, info: Optional[dict] = None) -> dict:
        """NOTE convention (matches the reference, lwl.py:108-116, 192-198):
        `previous_output['segmentation_raw']` carries per-pixel target PROBABILITIES —
        the tracker's own sigmoid output in single-object mode, or the
        soft-aggregated per-object probabilities from `merge_results` in multi-object
        mode."""
        im = jnp.asarray(image)
        prev = (info or {}).get("previous_output", {})
        prev_prob = prev.get("segmentation_raw")
        if prev_prob is not None and isinstance(prev_prob, dict):
            prev_prob = prev_prob[self.object_id]
        if prev_prob is None or self.object_id is None:
            # single-object: state.seg_raw on device IS last frame's probability map
            # (identical to the harness-threaded previous_output) — avoids a
            # full-image host->device round trip per frame
            prev_prob = self.state.seg_raw
        prev_prob = jnp.asarray(prev_prob, jnp.float32)

        self.state, out = self._jit_track(self.variables, self.state, im, prev_prob)
        if self.object_id is None:
            seg_out = np.asarray(jax.nn.sigmoid(out["segmentation_raw"]))
        else:
            seg_out = np.asarray(out["segmentation_raw"])
        return {"target_bbox": np.asarray(out["target_bbox"]).tolist(),
                "segmentation": np.asarray(out["segmentation"], np.uint8),
                "segmentation_raw": seg_out}

    def _track_impl(self, state: LWLState, im, prev_prob_im):
        p = self.params
        im = im.astype(jnp.float32)
        Hs, Ws = p.image_sample_size
        support = jnp.array([float(Hs), float(Ws)])
        state = state.replace(frame_num=state.frame_num + 1)

        # ---- update target model with the previous frame's merged mask (lwl.py:118-131)
        if p.update_target_model:
            # probabilities are continuous — the separable matmul resample path is
            # both exact enough and ~100x faster on TPU than the nearest gather
            prev_crop, _ = sample_patch(prev_prob_im[..., None], state.prev_pos,
                                        state.prev_scale * support, (Hs, Ws),
                                        mode=p.border_mode,
                                        max_scale_change=p.patch_max_scale_change)
            do = state.frame_num > 2
            state = self._update_memory(state, state.prev_test_x[0], prev_crop[..., 0],
                                        p.learning_rate, do)
            state = self._run_model_update(state, do)

        # ---- target state from the previous mask (lwl.py:135-149)
        pos, target_sz = self._seg_to_state(state, prev_prob_im)
        new_scale = jnp.sqrt(jnp.prod(target_sz) / jnp.prod(state.base_target_sz))
        ratio = new_scale / state.target_scale
        lo, hi = p.max_scale_change
        new_scale = jnp.where(ratio < lo, state.target_scale * lo,
                              jnp.where(ratio > hi, state.target_scale * hi, new_scale))
        state = state.replace(pos=pos, target_scale=new_scale,
                              target_sz=state.base_target_sz * new_scale)

        # ---- segment the current frame (lwl.py:152-186)
        patch, coords = sample_patch(im, state.pos, state.target_scale * support,
                                     (Hs, Ws), mode=p.border_mode,
                                     max_scale_change=p.patch_max_scale_change)
        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / support))

        backbone_feat = self._backbone(patch[None])
        test_x = self._tm_features(backbone_feat)
        seg_crop, _ = self._segment(state.target_filter, test_x[:, None],
                                    backbone_feat, (Hs, Ws))      # (Hs, Ws) raw

        state = state.replace(prev_pos=state.pos, prev_scale=state.target_scale,
                              prev_test_x=test_x)

        # ---- paste crop scores to image (inverse warp, reference :330-360).
        # The warp is axis-separable, so it is two MXU matmuls R_y·crop·R_xᵀ instead
        # of an (H·W)-sized gather (pathological on TPU).
        from pytracking_tpu.ops.patch import _resample_weights

        H, W = im.shape[0], im.shape[1]
        yy = jnp.arange(H, dtype=jnp.float32)
        xx = jnp.arange(W, dtype=jnp.float32)
        tl = coords[:2]
        sz = coords[2:] - coords[:2]
        cy = (yy - tl[0]) * Hs / sz[0] - 0.5            # crop row coord per image row
        cx = (xx - tl[1]) * Ws / sz[1] - 0.5
        ry = _resample_weights(cy, Hs, jnp.asarray(1.0))        # (H, Hs)
        rx = _resample_weights(cx, Ws, jnp.asarray(1.0))        # (W, Ws)
        vals = jnp.einsum("ih,hw->iw", ry, seg_crop,
                          preferred_element_type=jnp.float32)
        vals = jnp.einsum("jw,iw->ij", rx, vals,
                          preferred_element_type=jnp.float32)
        inside = ((cy >= -0.5) & (cy <= Hs - 0.5))[:, None] & \
            ((cx >= -0.5) & (cx <= Ws - 0.5))[None, :]
        seg_raw_im = jnp.where(inside, vals, -100.0)

        prob_im = jax.nn.sigmoid(seg_raw_im)
        out_pos, out_sz = self._seg_to_state(state, prob_im)
        bbox = jnp.concatenate([out_pos[::-1] - (out_sz[::-1] - 1) / 2, out_sz[::-1]])

        # state.seg_raw keeps PROBABILITIES (self-fallback when the harness does not
        # thread previous_output); the raw scores go out for multi-object merging
        state = state.replace(seg_raw=prob_im)
        out = {"target_bbox": bbox, "segmentation_raw": seg_raw_im,
               "segmentation": (seg_raw_im > 0.0).astype(jnp.uint8)}
        return state, out

    def _seg_to_state(self, state: LWLState, prob_im):
        """Box from mask via center-of-mass + variance (reference :277-303)."""
        p = self.params
        s = prob_im.sum()
        ys = jnp.arange(prob_im.shape[0], dtype=jnp.float32)
        xs = jnp.arange(prob_im.shape[1], dtype=jnp.float32)
        py = prob_im.sum(axis=-1)
        px = prob_im.sum(axis=-2)
        e_y = jnp.sum(py * ys) / jnp.maximum(s, 1e-6)
        e_x = jnp.sum(px * xs) / jnp.maximum(s, 1e-6)
        e_h = jnp.sum(py * (ys - e_y) ** 2) / jnp.maximum(s, 1e-6)
        e_w = jnp.sum(px * (xs - e_x) ** 2) / jnp.maximum(s, 1e-6)
        k = p.seg_to_bb_sz_factor
        pos = jnp.stack([e_y, e_x])
        sz = jnp.stack([jnp.sqrt(e_h) * k, jnp.sqrt(e_w) * k])
        ok = s >= p.min_mask_area
        return (jnp.where(ok, pos, state.pos), jnp.where(ok, sz, state.target_sz))

    def _update_memory(self, state: LWLState, sample, mask, lr, do_update):
        """(reference :434-520), masked fixed-shape."""
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
            init_mask_ = idx < num_init
            init_sum = jnp.where(init_mask_, sw_new, 0.0).sum()
            rest_sum = jnp.where(~init_mask_, sw_new, 0.0).sum()
            need = init_sum < init_w
            sw_adj = jnp.where(init_mask_, init_w / jnp.maximum(num_init, 1),
                               sw_new / (init_w + rest_sum))
            sw_new = jnp.where(need, sw_adj, sw_new)

        return state.replace(
            mem_samples=_masked_slot_set(state.mem_samples, r_ind, sample,
                                         do_update),
            mem_masks=_masked_slot_set(state.mem_masks, r_ind, mask, do_update),
            mem_weights=jnp.where(do_update, sw_new, state.mem_weights),
            num_stored=jnp.where(do_update, jnp.minimum(num_stored + 1, M), num_stored),
            prev_ind=jnp.where(do_update, r_ind, state.prev_ind))

    def _run_model_update(self, state: LWLState, do_update):
        """Re-encode the memory masks and refine the filter (reference :545-581)."""
        p = self.params
        skip = ((state.frame_num - 1) % p.train_skipping) == 0

        def upd(filt):
            label, fs_sw = self._label_encode(state.mem_masks[:, None],
                                              state.mem_samples[:, None])
            sw = fs_sw * state.mem_weights[:, None, None, None, None]
            return self._update_filter(filt, state.mem_samples[:, None], label, sw,
                                       p.net_opt_update_iter)

        new_filter = jax.lax.cond(do_update & skip, upd, lambda f: f,
                                  state.target_filter)
        return state.replace(target_filter=new_filter)

    # ---------------------------------------------------------------- merging

    def merge_results(self, out_all: Dict) -> Dict:
        """Soft-aggregation merge of per-object raw scores (reference :211-275)."""
        obj_ids = list(out_all.keys())
        seg_scores = []
        for oid in obj_ids:
            o = out_all[oid]
            if "segmentation_raw" in o:
                seg_scores.append(np.asarray(o["segmentation_raw"], np.float32))
            else:
                seg_scores.append((np.asarray(o["segmentation"], np.float32) - 0.5)
                                  * 200.0)
        seg_scores = np.clip(np.stack(seg_scores), -50.0, 50.0)
        prob = 1.0 / (1.0 + np.exp(-seg_scores))
        eps = 1e-7
        bg_p = np.clip(np.prod(1 - prob, axis=0), eps, 1 - eps)
        bg_score = np.log(bg_p / (1 - bg_p))
        all_scores = np.concatenate([bg_score[None], seg_scores], axis=0)
        # per-label aggregated probability (reference :238-243)
        agg = np.stack([1.0 / np.exp(all_scores - s[None]).sum(axis=0)
                        for s in all_scores])
        ids_all = np.array([0] + [int(i) for i in obj_ids], np.uint8)
        merged_seg = ids_all[agg.argmax(axis=0)]

        out = OrderedDict()
        out["segmentation"] = merged_seg
        out["segmentation_raw"] = OrderedDict(
            (oid, agg[i + 1]) for i, oid in enumerate(obj_ids))
        out["target_bbox"] = {oid: out_all[oid].get("target_bbox")
                              for oid in obj_ids}
        return out


def get_tracker_class():
    return LWLTracker


class LWLMultiObjectTracker:
    """Device-native multi-object LWL: ALL objects tracked in ONE jitted step.

    The reference's MultiObjectWrapper runs N tracker instances sequentially per
    frame (multi_object_wrapper.py:103-180). Here the per-object `LWLState` pytrees
    are STACKED on a leading object axis and the frame step is `vmap`ped over it, so
    N objects cost one XLA execution whose batch dimension feeds the MXU; the
    soft-aggregation merge (reference lwl.py:211-275) also runs on device, and the
    aggregated per-object probabilities stay device-resident as the next frame's
    previous-mask input. This is the 'per-object parallelism' TPU win called out in
    SURVEY §2.
    """

    multiobj_mode = "vmap"

    def __init__(self, params: LWLParams, net, variables):
        self.params = params
        self._impl = LWLTracker(params, net, variables)
        self.states = None
        self.object_ids: list = []
        self._prev_probs = None

        def multi_init(variables, im, bboxes, masks):
            prev = self._impl.variables
            self._impl.variables = variables     # tracer pytree during trace
            try:
                return jax.vmap(self._impl._initialize_impl,
                                in_axes=(None, 0, 0))(im, bboxes, masks)
            finally:
                self._impl.variables = prev

        self._jit_init = jax.jit(multi_init)

        def multi_step(variables, states, im, prev_probs):
            prev = self._impl.variables
            self._impl.variables = variables
            try:
                states, outs = jax.vmap(self._impl._track_impl,
                                        in_axes=(0, None, 0))(states, im,
                                                              prev_probs)
            finally:
                self._impl.variables = prev
            raw = outs["segmentation_raw"]                        # (O, H, W) logits
            prob = jax.nn.sigmoid(raw)
            eps = 1e-7
            bg_p = jnp.clip(jnp.prod(1.0 - prob, axis=0), eps, 1 - eps)
            bg_score = jnp.log(bg_p / (1.0 - bg_p))
            all_scores = jnp.concatenate([bg_score[None], raw], axis=0)
            # aggregated per-label probability = softmax over (bg + objects)
            agg = jax.nn.softmax(all_scores, axis=0)
            label = jnp.argmax(agg, axis=0).astype(jnp.uint8)     # 0 = background
            return states, {"label": label, "agg_fg": agg[1:],
                            "target_bbox": outs["target_bbox"]}

        self._jit_step = jax.jit(multi_step, donate_argnums=(1,))

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        im = jnp.asarray(image)
        self.object_ids = [str(o) for o in (info.get("object_ids") or ["1"])]
        masks_full = np.asarray(info["init_mask"])
        masks, bboxes = [], []
        for oid in self.object_ids:
            m = (masks_full == int(oid)).astype(np.float32)
            ys, xs = np.nonzero(m)
            if len(ys):
                bb = [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                      ys.max() - ys.min() + 1]
            else:
                bb = [0, 0, 1, 1]
            masks.append(m)
            bboxes.append(bb)
        masks = jnp.asarray(np.stack(masks))
        bboxes = jnp.asarray(np.asarray(bboxes, np.float32))
        self.states = self._jit_init(self._impl.variables, im, bboxes, masks)
        self._prev_probs = masks
        return {"segmentation": np.asarray(masks_full, np.uint8)}

    def track(self, image, info: Optional[dict] = None) -> dict:
        im = jnp.asarray(image)
        self.states, out = self._jit_step(self._impl.variables, self.states,
                                           im, self._prev_probs)
        self._prev_probs = out["agg_fg"]

        ids_all = np.array([0] + [int(o) for o in self.object_ids], np.uint8)
        merged_seg = ids_all[np.asarray(out["label"])]
        bboxes = np.asarray(out["target_bbox"])
        agg = np.asarray(out["agg_fg"])
        return {
            "segmentation": merged_seg,
            "segmentation_raw": OrderedDict(
                (oid, agg[i]) for i, oid in enumerate(self.object_ids)),
            "target_bbox": {oid: bboxes[i].tolist()
                            for i, oid in enumerate(self.object_ids)},
        }


# opt-in device-native multi-object mode (PYTRACKING_TPU_VMAP_MULTIOBJ=1)
LWLTracker.vmap_multiobj_class = LWLMultiObjectTracker
