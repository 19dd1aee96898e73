"""ATOM tracker — online discriminative classifier (factorized conv, Gauss-Newton/CG)
with IoU-Net box refinement.

Re-design of reference `pytracking/tracker/atom/atom.py` (ATOM:16) and
`pytracking/tracker/atom/optim.py` (FactorizedConvProblem:6, ConvProblem:71):

  * The first-frame joint optimization of [filter, projection] becomes a pytree
    Gauss-Newton-CG solve (`ops/solvers.gauss_newton_cg`) with the reference's diagonal
    preconditioner — one jitted computation, Jacobians via jvp/vjp instead of the
    reference's autograd-graph residual bookkeeping.
  * Per-frame filter updates are one Gauss-Newton linearization + `CG_iter` CG steps on
    the 250-slot sample memory (zero weight == empty slot), selected via `lax.switch`
    on the localization flag.
  * Localization uses the Fourier-domain score upsampling from ops/fourier
    (reference atom.py:305-330): cfft2 → half-pixel shift for the even kernel →
    sample_fs to the image-support grid, argmax with wrap-around displacement.
  * The search-region size depends on the first-frame target size (reference
    atom.py:64-75); it is computed on the host at `initialize` and baked into that
    sequence's jitted step (a handful of distinct sizes ever materialize because the
    search area is clamped to [min,max]_image_sample_size).

Feature note: the reference extracts features through `ATOMResNet18`
(pytracking/features/deep.py:156) — ResNet-18 layer3. Here the ATOMnet backbone's
layer3 plays that role directly.
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
from jax import lax

from pytracking_tpu.ops import augmentation as aug
from pytracking_tpu.ops import dcf, fourier, solvers
from pytracking_tpu.ops.activation import mlu
from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.trackers.dimp import (FLAG_HARD_NEG, FLAG_NORMAL, FLAG_NOT_FOUND,
                                          FLAG_UNCERTAIN, FLAG_NAMES, _get_iounet_box,
                                          _masked_slot_set)
from pytracking_tpu.trackers.base import BaseTracker


@dataclass(frozen=True)
class ATOMParams:
    """Static config (reference pytracking/parameter/atom/default.py)."""
    max_image_sample_size: int = (18 * 16) ** 2
    min_image_sample_size: int = (18 * 16) ** 2
    search_area_scale: float = 5.0
    feature_size_odd: bool = False
    feature_stride: int = 16
    kernel_size: Tuple[int, int] = (4, 4)
    compressed_dim: int = 64
    filter_reg: float = 1e-1
    projection_reg: float = 1e-4
    use_projection_matrix: bool = True
    update_projection_matrix: bool = True
    proj_init_method: str = "randn"       # 'randn' | 'pca' (reference atom.py:534)
    filter_init_method: str = "randn"     # 'randn' | 'zeros' (reference atom.py:140)
    # per-sample power normalization of the deep feature (reference
    # featurebase.py:64-67 with the parameter file's normalize_power=2);
    # None disables
    feature_normalize_power: Optional[int] = 2
    projection_activation: str = "none"
    response_activation: Tuple[str, float] = ("mlu", 0.05)
    # optimization
    CG_iter: int = 5
    init_CG_iter: int = 60
    init_GN_iter: int = 6
    post_init_CG_iter: int = 0
    hard_negative_CG_iter: int = 5
    # learning
    learning_rate: float = 0.01
    init_samples_minimum_weight: float = 0.25
    output_sigma_factor: float = 1 / 4
    sample_memory_size: int = 250
    train_skipping: int = 10
    # detection
    scale_factors: Tuple[float, ...] = (1.0,)
    score_upsample_factor: int = 1
    window_output: bool = False
    perform_hn_without_windowing: bool = False
    border_mode: str = "replicate"
    patch_max_scale_change: Optional[float] = None
    # init augmentation
    use_augmentation: bool = True
    augmentation: tuple = (("fliplr", True),
                           ("rotate", (5, -5, 10, -10, 20, -20, 30, -30, 45, -45,
                                       -60, 60)),
                           ("blur", ((2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2))),
                           ("relativeshift", ((0.6, 0.6), (-0.6, 0.6), (0.6, -0.6),
                                              (-0.6, -0.6))),
                           ("dropout", (7, 0.2)))
    augmentation_expansion_factor: float = 2.0
    random_shift_factor: float = 1 / 3
    # advanced localization
    advanced_localization: bool = True
    target_not_found_threshold: float = 0.25
    distractor_threshold: float = 0.8
    hard_negative_threshold: float = 0.5
    target_neighborhood_scale: float = 2.2
    displacement_scale: float = 0.8
    hard_negative_learning_rate: float = 0.02
    update_scale_when_uncertain: bool = True
    target_inside_ratio: float = 0.2
    # IoU net
    use_iou_net: bool = True
    iounet_augmentation: bool = False
    iounet_k: int = 3
    num_init_random_boxes: int = 9
    box_jitter_pos: float = 0.1
    box_jitter_sz: float = 0.5
    maximal_aspect_ratio: float = 6.0
    box_refinement_iter: int = 5
    # scalar, or (pos, sz) pair -> per-coordinate [pos, pos, sz, sz] steps
    # (reference atom.py:761-765)
    box_refinement_step_length: object = 1.0
    box_refinement_step_decay: float = 1.0
    # 'default' | 'relative' — probabilistic variants (atom_prob_ml /
    # atom_gmm_sampl) ascend in the relative (cx/σ, cy/σ, log w, log h) space
    # (reference atom.py:798-833, parameter/atom/atom_prob_ml.py:89)
    box_refinement_space: str = "default"
    use_iounet_pos_for_learning: bool = True

    def aug_dict(self) -> dict:
        return dict(self.augmentation) if self.use_augmentation else {}


class ATOMState(struct.PyTreeNode):
    pos: jnp.ndarray
    target_sz: jnp.ndarray
    target_scale: jnp.ndarray
    base_target_sz: jnp.ndarray
    image_sz: jnp.ndarray
    min_scale: jnp.ndarray
    max_scale: jnp.ndarray
    sigma: jnp.ndarray               # (2,) label sigma in feature cells
    filt: jnp.ndarray                # (fh, fw, cdim, 1)
    proj: jnp.ndarray                # (1, 1, Cin, cdim)
    mem_samples: jnp.ndarray         # (M, Hf, Wf, cdim) compressed
    mem_y: jnp.ndarray               # (M, Hf, Wf)
    mem_weights: jnp.ndarray         # (M,)
    num_stored: jnp.ndarray
    num_init: jnp.ndarray
    prev_ind: jnp.ndarray
    iou_mod3: jnp.ndarray
    iou_mod4: jnp.ndarray
    frame_num: jnp.ndarray
    key: jax.Array
    flag: jnp.ndarray
    max_score: jnp.ndarray


def _conv_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Batched conv with a shared filter, reference 'same' mode (operation.py:17-21):
    pad f//2 both sides, drop trailing row/col for even filters. x (B,H,W,C),
    w (fh,fw,C,K) -> (B,H,W,K)."""
    fh, fw = w.shape[0], w.shape[1]
    out = lax.conv_general_dilated(x, w, (1, 1),
                                   [(fh // 2, fh // 2), (fw // 2, fw // 2)],
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                   preferred_element_type=jnp.float32)
    if fh % 2 == 0:
        out = out[:, :-1]
    if fw % 2 == 0:
        out = out[:, :, :-1]
    return out


class ATOMTracker(BaseTracker):
    multiobj_mode = "parallel"

    def __init__(self, params: ATOMParams, net, variables):
        super().__init__(params)
        self.net = net
        # device_put ONCE: variables may arrive host/CPU-resident (CPU-side init,
        # msgpack load) — passing host arrays to a jitted call re-uploads them per
        # frame (~100MB through the axon tunnel)
        self.variables = jax.device_put(variables)
        self.state: Optional[ATOMState] = None
        self._seed = 0
        self._jit_cache: Dict = {}

    # ---------------------------------------------------------------- net helpers

    def _normalize_feat(self, feat):
        """Per-sample power normalization (reference featurebase.py:64-67):
        feat / (mean(|feat|^p over CHW) + 1e-10)^(1/p)."""
        p = self.params.feature_normalize_power
        if p is None:
            return feat
        denom = (jnp.mean(jnp.abs(feat) ** p, axis=(1, 2, 3), keepdims=True)
                 + 1e-10) ** (1.0 / p)
        return feat / denom

    def _backbone(self, im_patches):
        return self.net.apply(self.variables, im_patches,
                              method=lambda m, x: m.extract_backbone(x))

    def _iou_modulation(self, backbone_feat, bb):
        return self.net.apply(self.variables, backbone_feat, bb,
                              method=lambda m, f, b: m.iou_get_modulation(f, b))

    def _iou_feat(self, backbone_feat):
        return self.net.apply(self.variables, backbone_feat,
                              method=lambda m, f: m.iou_get_iou_feat(f))

    def _predict_iou(self, modulation, iou_feat, boxes):
        return self.net.apply(self.variables, modulation, iou_feat, boxes,
                              method=lambda m, mo, f, b: m.iou_predict(mo, f, b))

    def _response_act(self, s):
        kind, a = self.params.response_activation
        if kind == "mlu":
            return mlu(s, a)
        if kind == "relu":
            return jax.nn.relu(s)
        if kind == "elu":
            return jax.nn.elu(s)
        return s

    def _projection_act(self, s):
        kind = self.params.projection_activation
        if kind == "relu":
            return jax.nn.relu(s)
        if kind == "elu":
            return jax.nn.elu(s)
        return s

    def _project(self, feat, proj):
        """1x1 conv projection + activation (reference atom.py:429-431)."""
        return self._projection_act(jnp.einsum("bhwc,cd->bhwd", feat, proj[0, 0],
                                               preferred_element_type=jnp.float32))

    # ---------------------------------------------------------------- geometry

    def _compute_sample_sz(self, target_sz) -> int:
        """Host-side: odd/even square search area rounded to stride multiples
        (reference atom.py:49-75). Returns a static int."""
        p = self.params
        search_area = float(np.prod(np.asarray(target_sz) * p.search_area_scale))
        target_scale = 1.0
        if search_area > p.max_image_sample_size:
            target_scale = math.sqrt(search_area / p.max_image_sample_size)
        elif search_area < p.min_image_sample_size:
            target_scale = math.sqrt(search_area / p.min_image_sample_size)
        base_target_sz = np.asarray(target_sz) / target_scale
        stride = p.feature_stride
        sz = round(math.sqrt(float(np.prod(base_target_sz * p.search_area_scale))))
        if p.feature_size_odd:
            sz += int(stride - sz % (2 * stride))
        else:
            sz += int(stride - (sz + stride) % (2 * stride))
        return int(sz), float(target_scale)

    # ---------------------------------------------------------------- initialize

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        im_np, true_hw = self._prepare_image(image)
        im = jnp.asarray(im_np)
        bbox = np.asarray(info["init_bbox"], np.float32)
        target_sz = np.array([bbox[3], bbox[2]])
        sample_sz, target_scale = self._compute_sample_sz(target_sz)
        self._sample_sz = sample_sz
        self._aug_rng = np.random.RandomState(self._seed)
        key = jax.random.PRNGKey(self._seed)

        crop = self._jit_cache.get(("init_crop", im.shape, sample_sz))
        if crop is None:
            crop = jax.jit(functools.partial(self._init_crop_impl,
                                             sample_sz=sample_sz))
            self._jit_cache[("init_crop", im.shape, sample_sz)] = crop
        fn = self._jit_cache.get(("init", sample_sz))
        if fn is None:
            fn = self._jit_with_variables(
                functools.partial(self._initialize_from_patch,
                                  sample_sz=sample_sz))
            self._jit_cache[("init", sample_sz)] = fn
        image_sz_arr = jnp.asarray(true_hw, jnp.float32)
        # explicit f32 (not weak-typed): a weak-typed target_scale in the init
        # state retraces the track program on the SECOND frame (test_one_compile)
        base_patch = crop(im, jnp.asarray(bbox),
                          jnp.asarray(target_scale, jnp.float32),
                          image_sz_arr)
        self.state = fn(self.variables, base_patch, jnp.asarray(bbox),
                        jnp.asarray(target_scale, jnp.float32), key,
                        image_sz_arr)
        return {}

    def _init_crop_impl(self, im, bbox, target_scale, image_sz, *,
                        sample_sz: int):
        p = self.params
        im = im.astype(jnp.float32)
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        init_pos = jnp.round(pos)
        exp_sz = int(round(sample_sz * p.augmentation_expansion_factor))
        exp_sz += (exp_sz - sample_sz) % 2
        base_patch, _ = sample_patch(im, init_pos, target_scale * exp_sz * jnp.ones(2),
                                     (exp_sz, exp_sz), mode=p.border_mode,
                                     im_sz=image_sz)
        return base_patch

    def _initialize_impl(self, im, bbox, target_scale, key, image_sz, *,
                         sample_sz: int) -> ATOMState:
        base_patch = self._init_crop_impl(im, bbox, target_scale, image_sz,
                                          sample_sz=sample_sz)
        return self._initialize_from_patch(base_patch, bbox, target_scale, key,
                                           image_sz, sample_sz=sample_sz)

    def _initialize_from_patch(self, base_patch, bbox, target_scale, key,
                               image_sz, *, sample_sz: int) -> ATOMState:
        p = self.params
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        base_target_sz = target_sz / target_scale
        min_scale = jnp.max(10.0 / base_target_sz)
        max_scale = jnp.min(image_sz / base_target_sz)
        feat_sz = sample_sz // p.feature_stride
        support = float(sample_sz)

        init_pos = jnp.round(pos)
        augs = p.aug_dict()
        transforms = aug.build_transforms(
            {k: v for k, v in augs.items() if k != "dropout"},
            (sample_sz, sample_sz), p.random_shift_factor, self._aug_rng)
        im_patches = aug.apply_all(base_patch, transforms, (sample_sz, sample_sz))

        backbone_feat = self._backbone(im_patches)
        x = self._normalize_feat(backbone_feat["layer3"])        # (T, Hf, Wf, 256)

        num_drop = 0
        if "dropout" in augs:
            num_drop, prob = augs["dropout"]
            key, dkey = jax.random.split(key)
            x = jnp.concatenate([x, aug.dropout2d(x, dkey, num_drop, prob)])
        T = x.shape[0]

        # ---- projection init (reference atom.py:534-546): 'pca' = top
        # compressed_dim eigenvectors of the channel covariance over the init
        # samples (deterministic); 'randn' as in the default parameter file
        key, pkey, fkey = jax.random.split(key, 3)
        cin = x.shape[-1]
        if p.proj_init_method == "pca":
            x_mat = x.reshape(-1, cin).T                      # (C, T*H*W)
            x_mat = x_mat - x_mat.mean(axis=1, keepdims=True)
            cov = x_mat @ x_mat.T
            _, _, vt = jnp.linalg.svd(cov)
            proj = vt[:p.compressed_dim].T.reshape(1, 1, cin, p.compressed_dim)
        else:
            proj = jax.random.normal(pkey, (1, 1, cin, p.compressed_dim)) / \
                math.sqrt(cin)
        fh, fw = p.kernel_size
        if p.filter_init_method == "zeros":
            filt = jnp.zeros((fh, fw, p.compressed_dim, 1))
        else:
            filt = jax.random.normal(fkey, (fh, fw, p.compressed_dim, 1))
            filt = filt / filt.size

        # ---- label functions (reference atom.py:549-570)
        sigma_val = jnp.sqrt(jnp.prod(feat_sz / support * base_target_sz)) * \
            p.output_sigma_factor
        sigma = sigma_val * jnp.ones(2)
        target_center_norm = (pos - init_pos) / (target_scale * support)
        center_pos = feat_sz * target_center_norm + 0.5 * jnp.array(
            [(fh + 1) % 2, (fw + 1) % 2], jnp.float32)
        shifts = jnp.asarray([[t.shift[0], t.shift[1]] for t in transforms]
                             + [[transforms[0].shift[0], transforms[0].shift[1]]] * num_drop,
                             jnp.float32)
        centers = center_pos[None] + shifts / support * feat_sz
        init_y = self._label_batch(centers, feat_sz, sigma)       # (T, Hf, Wf)

        # ---- joint optimization (reference atom.py:156-186 + optim.py:6-68)
        sw = jnp.full((T,), 1.0 / T)

        def joint_residual(v):
            comp = self._project(x, v["proj"])
            scores = self._response_act(_conv_same(comp, v["filt"])[..., 0])
            data = jnp.sqrt(sw)[:, None, None] * (scores - init_y)
            return {"data": data,
                    "f_reg": math.sqrt(p.filter_reg) * v["filt"],
                    "p_reg": math.sqrt(p.projection_reg) * v["proj"]}

        def precond(v):
            return {"filt": v["filt"] / p.filter_reg,
                    "proj": v["proj"] / p.projection_reg}

        num_gn = p.init_GN_iter
        num_cg = max(p.init_CG_iter // max(p.init_GN_iter, 1), 1)
        if p.update_projection_matrix:
            res = solvers.gauss_newton_cg(joint_residual, {"filt": filt, "proj": proj},
                                          num_gn_iter=num_gn, num_cg_iter=num_cg,
                                          precond=precond)
            filt, proj = res.x["filt"], res.x["proj"]

        # ---- memory of compressed samples (reference atom.py:191-196, 572-590)
        comp = self._project(x, proj)
        M = p.sample_memory_size
        mem_samples = jnp.zeros((M,) + comp.shape[1:]).at[:T].set(comp)
        mem_y = jnp.zeros((M, comp.shape[1], comp.shape[2])).at[:T].set(init_y)
        mem_weights = jnp.zeros((M,)).at[:T].set(1.0 / T)

        if p.post_init_CG_iter > 0:
            filt = self._filter_cg(filt, mem_samples, mem_y, mem_weights,
                                   p.post_init_CG_iter)

        # ---- IoU net modulation (reference atom.py:666-700)
        iou_box = _get_iounet_box(pos, target_sz, init_pos, target_scale,
                                  jnp.full(2, float(sample_sz)))
        bfeat_first = {k: v[:1] for k, v in backbone_feat.items()}
        mod3, mod4 = self._iou_modulation(bfeat_first, iou_box[None])

        return ATOMState(
            pos=pos, target_sz=target_sz, target_scale=jnp.asarray(target_scale),
            base_target_sz=base_target_sz, image_sz=image_sz, min_scale=min_scale,
            max_scale=max_scale, sigma=sigma, filt=filt, proj=proj,
            mem_samples=mem_samples, mem_y=mem_y, mem_weights=mem_weights,
            num_stored=jnp.asarray(T, jnp.int32), num_init=jnp.asarray(T, jnp.int32),
            prev_ind=jnp.asarray(-1, jnp.int32), iou_mod3=mod3, iou_mod4=mod4,
            frame_num=jnp.asarray(1, jnp.int32), key=key,
            flag=jnp.asarray(0, jnp.int32), max_score=jnp.asarray(1.0, jnp.float32))

    def _label_batch(self, centers, feat_sz: int, sigma):
        """CENTERED Gaussian labels (reference dcf.label_function_spatial /
        gauss_spatial: grid coordinate k = i - (sz-1)/2, origin in the middle,
        NO wrap). The wrap-around convention enters later, in localization: the
        π phase shift for even kernels (reference atom.py:309) moves the
        center-origin response to the corner-origin grid that `sample_fs`
        produces, where the mod-arithmetic displacement decode applies. Labels
        must therefore be centered — corner-origin labels here would double the
        half-grid shift and force the 4x4 filter to fire half a grid off-target
        (it can't, so the learned response degrades: found via trace-parity
        against the reference with ported weights)."""
        k = jnp.arange(feat_sz, dtype=jnp.float32) - (feat_sz - 1) / 2
        dy = k[None, :] - centers[:, 0:1]
        dx = k[None, :] - centers[:, 1:2]
        gy = jnp.exp(-0.5 / sigma[0] ** 2 * dy ** 2)
        gx = jnp.exp(-0.5 / sigma[1] ** 2 * dx ** 2)
        return gy[:, :, None] * gx[:, None, :]

    def _filter_cg(self, filt, mem_samples, mem_y, mem_weights, num_iter: int):
        """One Gauss-Newton linearization + CG on the conv problem (reference
        ConjugateGradient over ConvProblem, optim.py:71-99)."""
        p = self.params

        def residual(f):
            scores = self._response_act(_conv_same(mem_samples, f)[..., 0])
            data = jnp.sqrt(mem_weights)[:, None, None] * (scores - mem_y)
            return {"data": data, "reg": math.sqrt(p.filter_reg) * f}

        res = solvers.gauss_newton_cg(residual, filt, num_gn_iter=1,
                                      num_cg_iter=num_iter)
        return res.x

    # ---------------------------------------------------------------- track

    def track_async(self, image, info: Optional[dict] = None):
        im_np, _ = self._prepare_image(image)
        im = jnp.asarray(im_np)
        crop = self._jit_cache.get(("crop", im.shape, self._sample_sz))
        if crop is None:
            crop = jax.jit(functools.partial(self._track_crop_impl,
                                             sample_sz=self._sample_sz))
            self._jit_cache[("crop", im.shape, self._sample_sz)] = crop
        fn = self._jit_cache.get(("track", self._sample_sz))
        if fn is None:
            fn = self._jit_with_variables(
                functools.partial(self._track_from_patch,
                                  sample_sz=self._sample_sz),
                donate_state=True)  # (M, ...) Fourier memory reused in place
            self._jit_cache[("track", self._sample_sz)] = fn
        patches = crop(self.state, im)
        self.state, out = fn(self.variables, self.state, patches)
        return out

    def fetch_output(self, out) -> dict:
        result = {"target_bbox": np.asarray(out["target_bbox"]).tolist(),
                  "max_score": float(out["max_score"]),
                  "flag": FLAG_NAMES[int(out["flag"])]}
        if "score_map" in out:
            result["score_map"] = np.asarray(out["score_map"])
        return result

    def track(self, image, info: Optional[dict] = None) -> dict:
        return self.fetch_output(self.track_async(image, info))

    def _track_crop_impl(self, state: ATOMState, im, *, sample_sz: int):
        """Shape-specialized head of the track step: the 5-scale crop pyramid
        only — a new frame-shape bucket recompiles just these warp matmuls."""
        p = self.params
        im = im.astype(jnp.float32)
        support = jnp.full(2, float(sample_sz))
        sample_pos = jnp.round(state.pos)
        scale_factors = jnp.asarray(p.scale_factors) * state.target_scale
        return jax.vmap(
            lambda s: sample_patch(im, sample_pos, s * support,
                                   (sample_sz, sample_sz), mode=p.border_mode,
                                   im_sz=state.image_sz)[0]
        )(scale_factors)

    def _track_impl(self, state: ATOMState, im, *, sample_sz: int):
        patches = self._track_crop_impl(state, im, sample_sz=sample_sz)
        return self._track_from_patch(state, patches, sample_sz=sample_sz)

    def _track_from_patch(self, state: ATOMState, patches, *, sample_sz: int):
        p = self.params
        support = jnp.full(2, float(sample_sz))
        feat_sz = sample_sz // p.feature_stride
        out_sz = p.score_upsample_factor * sample_sz
        state = state.replace(frame_num=state.frame_num + 1)

        sample_pos = jnp.round(state.pos)
        scale_factors = jnp.asarray(p.scale_factors) * state.target_scale
        S = len(p.scale_factors)

        backbone_feat = self._backbone(patches)
        feat = self._normalize_feat(backbone_feat["layer3"])     # (S, Hf, Wf, C)
        comp = self._project(feat, state.proj)                   # (S, Hf, Wf, cdim)
        scores_raw = _conv_same(comp, state.filt)[..., 0]        # (S, Hf, Wf)

        # Fourier-domain upsampling (reference atom.py:305-330)
        sf = fourier.cfft2(scores_raw) / (feat_sz * feat_sz)
        fh, fw = p.kernel_size
        shift = math.pi * jnp.array([1 - (fh % 2) / feat_sz, 1 - (fw % 2) / feat_sz])
        sf = fourier.shift_fs(sf, shift)
        scores = jnp.real(fourier.sample_fs(sf, (out_sz, out_sz)))  # (S, out, out)

        # output windowing on the wrap-around grid (reference atom.py:91-96,
        # 315-316, 346-352,369-370): the primary peak is ALWAYS found on the
        # windowed scores; the second-peak (distractor) search runs on the raw
        # scores when perform_hn_without_windowing, else on the windowed ones
        scores_hn = scores
        if p.window_output:
            win = dcf.hann2d_uncentered((out_sz, out_sz))[None]
            scores = scores * win
            if not p.perform_hn_without_windowing:
                scores_hn = scores

        (translation_vec, scale_ind, flag,
         max_score) = self._localize(state, scores, scale_factors, out_sz, support,
                                     scores_hn=scores_hn)
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
                                            scale_factors, scale_ind, support,
                                            found, update_scale)
        else:
            chosen_scale = scale_factors[scale_ind]
            new_scale = jnp.clip(chosen_scale, state.min_scale, state.max_scale)
            state = state.replace(
                target_scale=jnp.where(found, new_scale, state.target_scale),
                target_sz=jnp.where(found, state.base_target_sz * new_scale,
                                    state.target_sz))

        # ---- memory + filter update
        update_flag = (flag != FLAG_NOT_FOUND) & (flag != FLAG_UNCERTAIN)
        hard_negative = flag == FLAG_HARD_NEG
        lr = jnp.where(hard_negative, p.hard_negative_learning_rate, p.learning_rate)

        sample = comp[scale_ind]
        target_center_norm = (state.pos - sample_pos) / \
            (scale_factors[scale_ind] * support)
        center = feat_sz * target_center_norm + 0.5 * jnp.array(
            [(fh + 1) % 2, (fw + 1) % 2])
        y = self._label_batch(center[None], feat_sz, state.sigma)[0]
        state = self._update_memory(state, sample, y, lr, update_flag)

        skip_update = ((state.frame_num - 1) % p.train_skipping) == 0
        branch = jnp.where(update_flag & hard_negative, 1,
                           jnp.where(skip_update, 2, 0))
        state = state.replace(filt=lax.switch(
            branch,
            [lambda f: f,
             lambda f: self._filter_cg(f, state.mem_samples, state.mem_y,
                                       state.mem_weights, p.hard_negative_CG_iter),
             lambda f: self._filter_cg(f, state.mem_samples, state.mem_y,
                                       state.mem_weights, p.CG_iter)],
            state.filt))

        state = state.replace(flag=flag.astype(jnp.int32), max_score=max_score)
        bbox = jnp.concatenate([state.pos[::-1] - (state.target_sz[::-1] - 1) / 2,
                                state.target_sz[::-1]])
        out = {"target_bbox": bbox, "max_score": max_score, "flag": flag}
        if self._debug_outputs:
            out["score_map"] = scores[scale_ind]
        return state, out

    # ---------------------------------------------------------------- localization

    def _localize(self, state: ATOMState, scores, scale_factors, out_sz, support,
                  scores_hn=None):
        """Advanced localization on the wrap-around upsampled score grid
        (reference atom.py:330-430). `scores_hn` is the map the second-peak
        search masks (the raw scores under perform_hn_without_windowing)."""
        p = self.params
        if scores_hn is None:
            scores_hn = scores
        disp_to_img = support[0] / out_sz  # image px per score cell (per unit scale)

        max_score1, max_disp1 = dcf.max2d(scores)        # (S,), (S, 2)
        scale_ind = jnp.argmax(max_score1)
        max_score_s = max_score1[scale_ind]
        disp1 = max_disp1[scale_ind].astype(jnp.float32)
        disp1_mod = (disp1 + out_sz / 2) % out_sz - out_sz / 2
        sample_scale = scale_factors[scale_ind]
        translation_vec1 = disp1_mod * disp_to_img * sample_scale

        if not p.advanced_localization:
            return translation_vec1, scale_ind, jnp.asarray(FLAG_NORMAL), max_score_s

        sc = scores_hn[scale_ind]
        # neighborhood mask with wrap-around distance
        target_neigh_sz = p.target_neighborhood_scale * state.target_sz / sample_scale \
            * (out_sz / support)
        iy = jnp.arange(out_sz, dtype=jnp.float32)[:, None]
        ix = jnp.arange(out_sz, dtype=jnp.float32)[None, :]
        dy = (iy - disp1[0] + out_sz / 2) % out_sz - out_sz / 2
        dx = (ix - disp1[1] + out_sz / 2) % out_sz - out_sz / 2
        in_neigh = (jnp.abs(dy) <= target_neigh_sz[0] / 2 + 0.5) & \
                   (jnp.abs(dx) <= target_neigh_sz[1] / 2 + 0.5)
        masked = jnp.where(in_neigh, 0.0, sc)
        max_score2, max_disp2 = dcf.max2d(masked)
        disp2 = max_disp2.astype(jnp.float32)
        disp2_mod = (disp2 + out_sz / 2) % out_sz - out_sz / 2
        translation_vec2 = disp2_mod * disp_to_img * sample_scale

        disp_norm1 = jnp.sqrt(jnp.sum(disp1_mod ** 2))
        disp_norm2 = jnp.sqrt(jnp.sum(disp2_mod ** 2))
        disp_threshold = p.displacement_scale * out_sz / 2

        distractor = max_score2 > p.distractor_threshold * max_score_s
        hn1 = distractor & (disp_norm2 > disp_threshold) & (disp_norm1 < disp_threshold)
        hn2 = distractor & (disp_norm2 < disp_threshold) & (disp_norm1 > disp_threshold)
        uncertain_both = distractor & ~hn1 & ~hn2
        hard_neg2 = (~distractor &
                     (max_score2 > p.hard_negative_threshold * max_score_s) &
                     (max_score2 > p.target_not_found_threshold))

        flag = jnp.asarray(FLAG_NORMAL)
        trans = translation_vec1
        flag = jnp.where(hard_neg2, FLAG_HARD_NEG, flag)
        flag = jnp.where(uncertain_both, FLAG_UNCERTAIN, flag)
        flag = jnp.where(hn2, FLAG_HARD_NEG, flag)
        trans = jnp.where(hn2, translation_vec2, trans)
        flag = jnp.where(hn1, FLAG_HARD_NEG, flag)
        trans = jnp.where(hn1, translation_vec1, trans)
        flag = jnp.where(max_score_s < p.target_not_found_threshold, FLAG_NOT_FOUND,
                         flag)
        trans = jnp.where(max_score_s < p.target_not_found_threshold,
                          translation_vec1, trans)
        return trans, scale_ind, flag, max_score_s

    # ---------------------------------------------------------------- refinement

    def _refine_target_box(self, state: ATOMState, backbone_feat, sample_pos,
                           scale_factors, scale_ind, support, found, update_scale):
        """IoU-Net gradient ascent (reference atom.py:702-788, same math as DiMP)."""
        p = self.params
        sample_scale = scale_factors[scale_ind]
        init_box = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                   sample_scale, support)
        iou_feat_all = self._iou_feat(backbone_feat)
        iou_feat = [jnp.take(f, scale_ind[None], axis=0) for f in iou_feat_all]

        key, k1 = jax.random.split(state.key)
        state = state.replace(key=key)
        B = p.num_init_random_boxes
        square_sz = jnp.sqrt(jnp.prod(init_box[2:]))
        rand_factor = square_sz * jnp.array([p.box_jitter_pos, p.box_jitter_pos,
                                             p.box_jitter_sz, p.box_jitter_sz])
        minimal_edge = jnp.min(init_box[2:]) / 3
        rand_bb = (jax.random.uniform(k1, (B, 4)) - 0.5) * rand_factor
        new_sz = jnp.maximum(init_box[2:] + rand_bb[:, 2:], minimal_edge)
        new_center = (init_box[:2] + init_box[2:] / 2) + rand_bb[:, :2]
        jittered = jnp.concatenate([new_center - new_sz / 2, new_sz], axis=1)
        init_boxes = jnp.concatenate([init_box[None], jittered])

        modulation = (state.iou_mod3, state.iou_mod4)

        def iou_fn(boxes):
            return self._predict_iou(modulation, iou_feat, boxes[None])[0]

        step0 = p.box_refinement_step_length
        step0 = jnp.array([step0[0], step0[0], step0[1], step0[1]]) \
            if isinstance(step0, (tuple, list)) else jnp.asarray(step0)

        if p.box_refinement_space == "relative":
            # ascent in (cx/σ, cy/σ, log w, log h) space (reference
            # atom.py:798-833); used by atom_prob_ml / atom_gmm_sampl
            from pytracking_tpu.ops.bbox import rect_to_rel, rel_to_rect
            sz_norm = init_boxes[0:1, 2:]

            def iou_rel(boxes_rel):
                return iou_fn(rel_to_rect(boxes_rel, sz_norm))

            def ga_step(carry, _):
                boxes_rel, step = carry
                iou, g = jax.vjp(iou_rel, boxes_rel)
                grad = g(jnp.ones_like(iou))[0]
                boxes_rel = boxes_rel + step * grad
                return (boxes_rel, step * p.box_refinement_step_decay), None

            (boxes_rel, _), _ = lax.scan(
                ga_step, (rect_to_rel(init_boxes, sz_norm), step0),
                None, length=p.box_refinement_iter)
            boxes = rel_to_rect(boxes_rel, sz_norm)
        else:
            def ga_step(carry, _):
                boxes, step = carry
                iou, g = jax.vjp(iou_fn, boxes)
                grad = g(jnp.ones_like(iou))[0]
                boxes = boxes + step * grad * jnp.tile(boxes[:, 2:], (1, 2))
                return (boxes, step * p.box_refinement_step_decay), None

            (boxes, _), _ = lax.scan(
                ga_step, (init_boxes, step0),
                None, length=p.box_refinement_iter)
        iou = iou_fn(boxes)

        boxes = boxes.at[:, 2:].set(jnp.maximum(boxes[:, 2:], 1.0))
        ar = boxes[:, 2] / boxes[:, 3]
        valid = (ar < p.maximal_aspect_ratio) & (ar > 1 / p.maximal_aspect_ratio)
        iou = jnp.where(valid, iou, -jnp.inf)

        k = min(p.iounet_k, boxes.shape[0])
        top_iou, top_idx = lax.top_k(iou, k)
        top_valid = jnp.isfinite(top_iou)
        denom = jnp.maximum(top_valid.sum(), 1)
        pred_box = jnp.where(top_valid[:, None], boxes[top_idx], 0.0).sum(0) / denom
        any_valid = valid.any()

        new_pos = pred_box[:2] + pred_box[2:] / 2
        new_pos = (new_pos[::-1] - (support - 1) / 2) * sample_scale + sample_pos
        new_target_sz = pred_box[2:][::-1] * sample_scale
        new_scale = jnp.sqrt(jnp.prod(new_target_sz) / jnp.prod(state.base_target_sz))

        apply = found & any_valid
        pos = jnp.where(apply & p.use_iounet_pos_for_learning, new_pos, state.pos)
        tsz = jnp.where(apply, new_target_sz, state.target_sz)
        tscale = jnp.where(apply & update_scale,
                           jnp.clip(new_scale, state.min_scale, state.max_scale),
                           state.target_scale)
        return state.replace(pos=pos, target_sz=tsz, target_scale=tscale)

    # ---------------------------------------------------------------- memory

    def _update_memory(self, state: ATOMState, sample, y, lr, do_update):
        """Weighted-replacement memory (reference atom.py:592-640), masked."""
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
            mem_y=_masked_slot_set(state.mem_y, r_ind, y, do_update),
            mem_weights=jnp.where(do_update, sw_new, state.mem_weights),
            num_stored=jnp.where(do_update, jnp.minimum(num_stored + 1, M),
                                 num_stored),
            prev_ind=jnp.where(do_update, r_ind, state.prev_ind))


def get_tracker_class():
    return ATOMTracker
