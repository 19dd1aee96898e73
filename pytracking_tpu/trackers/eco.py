"""ECO tracker — factorized correlation filters learned in the Fourier domain.

Re-design of reference `pytracking/tracker/eco/eco.py` (ECO:18) and `eco/optim.py`
(FactorizedConvProblem:8, FilterOptim:121) with native complex64 (the reference
emulates complex as (...,2) real pairs through `pytracking/libs/complex.py`):

  * Per feature block b, the variables are Fourier filters hf_b (fh, fw, c_b) and
    projection matrices P_b; the data residual is elementwise complex math
    r_s = √w_s (Σ_c (x̂_s P)_c ⊙ hf_c − ŷ); the spatial regularization residual is the
    Parseval-equivalent SPATIAL product √N · w(x)·h(x) (the reference convolves the
    spectrum with the DFT of w, optim.py:51-69 — identical objective, far simpler
    program).
  * Joint init optimization and the per-update filter solves both run through the
    pytree Gauss-Newton-CG (ops/solvers.py) with ECO's diagonal preconditioner
    (sample-energy + reg-energy mix, optim.py:24-31).
  * Two feature blocks from the ResNet18-VGG-m1 hybrid backbone (the reference's
    ResNet18m1, features/deep.py:15): the VGG-m 7x7 'vggconv1' block (stride 2,
    pooled x2 -> stride 4, compressed to 16) and layer3 (stride 16, compressed to
    64) — built by parameter/eco/default.py via
    models/backbones/vggm_resnet.resnet18_vggmconv1.
  * Localization: per-block score spectra, weighted `sum_fs`, `sample_fs` to the
    output grid, wrap-around argmax over 5 scales (reference eco.py:246-287).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pytracking_tpu.ops import augmentation as aug
from pytracking_tpu.ops import dcf, fourier, solvers
from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.trackers.base import BaseTracker


@dataclass(frozen=True)
class ECOParams:
    """(reference pytracking/parameter/eco/default.py)"""
    max_image_sample_size: int = 250 ** 2
    min_image_sample_size: int = 200 ** 2
    search_area_scale: float = 4.5
    # optimization
    CG_iter: int = 5
    init_CG_iter: int = 100
    init_GN_iter: int = 10
    post_init_CG_iter: int = 0
    projection_reg: float = 5e-8
    precond_data_param: float = 0.3
    precond_reg_param: float = 0.15
    precond_proj_param: float = 35.0
    # learning
    learning_rate: float = 0.0075          # deep block lr (used for sample weights)
    sample_memory_size: int = 200          # matches reference parameter/eco/default.py:42
    train_skipping: int = 10
    # features: (stride, compressed_dim, output_sigma_factor, translation_weight,
    #            reg_window_edge)
    blocks: tuple = ((4, 16, 1 / 16, 0.4, 10e-3), (16, 64, 1 / 4, 0.6, 50e-3))
    # backbone feature taps: (layer name, avg-pool stride); the reference default
    # is ResNet18-VGG-m1 vggconv1 (stride 2, pooled x2) + layer3 (reference
    # parameter/eco/default.py:92, features/featurebase.py:59-67)
    feature_blocks: tuple = (("vggconv1", 2), ("layer3", 1))
    normalize_power: Optional[int] = 2
    reg_window_min: float = 1e-4
    reg_window_power: int = 2
    # detection
    scale_factors: Tuple[float, ...] = tuple(float(1.02 ** x) for x in range(-2, 3))
    score_upsample_factor: int = 1
    border_mode: str = "replicate"
    # init augmentation
    use_augmentation: bool = True
    augmentation: tuple = (("fliplr", True),
                           ("rotate", (5, -5, 10, -10, 20, -20, 30, -30, 45, -45,
                                       -60, 60)),
                           ("blur", ((2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2))),
                           ("shift", ((6, 6), (-6, 6), (6, -6), (-6, -6))),
                           ("dropout", (7, 0.2)))
    augmentation_expansion_factor: float = 2.0
    target_inside_ratio: float = 0.2

    def aug_dict(self):
        return dict(self.augmentation) if self.use_augmentation else {}


class ECOState(struct.PyTreeNode):
    pos: jnp.ndarray
    target_sz: jnp.ndarray
    target_scale: jnp.ndarray
    base_target_sz: jnp.ndarray
    image_sz: jnp.ndarray
    min_scale: jnp.ndarray
    max_scale: jnp.ndarray
    filters: Tuple[jnp.ndarray, ...]        # per block (fh, fw, c) complex64
    proj: Tuple[jnp.ndarray, ...]           # per block (Cin, c)
    samples_f: Tuple[jnp.ndarray, ...]      # per block (M, fh, fw, c) complex64
    sample_energy: Tuple[jnp.ndarray, ...]  # per block (fh, fw, c)
    sample_weights: jnp.ndarray             # (M,)
    num_stored: jnp.ndarray
    prev_ind: jnp.ndarray
    frame_num: jnp.ndarray
    max_score: jnp.ndarray


class ECOTracker(BaseTracker):
    multiobj_mode = "parallel"

    def __init__(self, params: ECOParams, net, variables):
        super().__init__(params)
        self.net = net            # backbone providing 'conv1' and 'layer3'
        # device_put ONCE: variables may arrive host/CPU-resident (CPU-side init,
        # msgpack load) — passing host arrays to a jitted call re-uploads them per
        # frame (~100MB through the axon tunnel)
        self.variables = jax.device_put(variables)
        self.state: Optional[ECOState] = None
        self._jit_cache: Dict = {}
        self._seed = 0

    # ---------------------------------------------------------------- features

    def _backbone_blocks(self, im_patches):
        """(B, s, s, 3) -> list of per-block features [(B, h_b, w_b, C_b)]:
        per-block avg pooling + power normalization (reference
        features/featurebase.py:59-67)."""
        p = self.params
        feats = self.net.apply(self.variables, im_patches,
                               method=lambda m, x: m.extract_backbone(x))
        out = []
        for layer, pool in p.feature_blocks:
            f = feats[layer]
            if pool > 1:
                f = jax.lax.reduce_window(
                    f, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1),
                    "VALID") / (pool * pool)
            if p.normalize_power is not None:
                q = p.normalize_power
                n = f.shape[1] * f.shape[2] * f.shape[3]
                norm = (jnp.sum(jnp.abs(f) ** q, axis=(1, 2, 3), keepdims=True)
                        / n + 1e-10) ** (1.0 / q)
                f = f / norm
            out.append(f)
        return out

    # ---------------------------------------------------------------- geometry

    def _compute_sizes(self, target_sz):
        p = self.params
        search_area = float(np.prod(np.asarray(target_sz) * p.search_area_scale))
        target_scale = 1.0
        if search_area > p.max_image_sample_size:
            target_scale = math.sqrt(search_area / p.max_image_sample_size)
        elif search_area < p.min_image_sample_size:
            target_scale = math.sqrt(search_area / p.min_image_sample_size)
        base_target_sz = np.asarray(target_sz) / target_scale
        sz = round(math.sqrt(float(np.prod(base_target_sz * p.search_area_scale))))
        stride = max(b[0] for b in p.blocks)
        # reference eco.py:60: sz ends up ≡ stride (mod 2·stride), so the
        # deepest feature grid is ODD — the DCF spectra are then symmetric and
        # filt_sz == feat_sz. (An even grid here shifts the whole score map by
        # one cell through the even→odd filter padding: found via trace-parity
        # against the reference.)
        sz += int(stride - sz % (2 * stride))
        feat_szs = [sz // b[0] for b in p.blocks]
        filt_szs = [f + (f + 1) % 2 for f in feat_szs]
        return int(sz), float(target_scale), feat_szs, filt_szs

    def _reg_window(self, filt_sz: int, base_target_grid) -> jnp.ndarray:
        """Spatial regularization window on the filter grid (same polynomial as
        reference dcf.get_reg_filter:106-154)."""
        p = self.params
        g = jnp.arange(filt_sz, dtype=jnp.float32) - (filt_sz - 1) / 2
        wr = (2.0 / base_target_grid[0]) * jnp.abs(g)
        wc = (2.0 / base_target_grid[1]) * jnp.abs(g)
        return (wr[:, None] ** p.reg_window_power + wc[None, :] ** p.reg_window_power)

    def _fourier_sample(self, feat, feat_sz: int, filt_sz: int):
        """Window, FFT, pad to the odd filter grid, bicubic interpolation kernels
        (reference preprocess_sample eco.py:299-303).

        The channel axis MUST be moved out of the trailing two dims BEFORE
        cfft2 — cfft2 transforms the last two axes, and on an NHWC array those
        are (width, channels): the height axis never gets transformed, which
        silently kills y-axis localization while x half-works (and the learned
        filter absorbs the invertible channel mixing, so self-consistency
        checks still pass). Found via axis-isolation probes against the
        reference."""
        win = dcf.hann2d((feat_sz, feat_sz))
        x = feat * (win[None, :, :, None] if feat.ndim == 4 else win[:, :, None])
        xf = fourier.cfft2(jnp.moveaxis(x, -1, -3))   # (..., C, h, w)
        xf = fourier.pad_fs(xf, (filt_sz, filt_sz))
        fy, fx = dcf.get_interp_fourier((filt_sz, filt_sz), "bicubic")
        xf = xf * fy * fx
        return jnp.moveaxis(xf, -3, -1)        # (..., h, w, C)

    # ---------------------------------------------------------------- residuals

    def _make_residual(self, samples_f, yf, sample_weights, reg_windows, filt_szs,
                       with_proj, raw_samples=None):
        """Residual function over {'hf': [...], 'P': [...]} (or filters only)."""
        p = self.params
        sqrt_w = jnp.sqrt(sample_weights)

        def residual(v):
            res = {}
            for b in range(len(filt_szs)):
                hf = v["hf"][b]
                if with_proj:
                    xf = jnp.einsum("mhwc,cd->mhwd", raw_samples[b], v["P"][b])
                else:
                    xf = samples_f[b]
                scores_f = jnp.sum(xf * hf[None], axis=-1)        # (M, fh, fw)
                res[f"data{b}"] = sqrt_w[:, None, None] * (scores_f - yf[b][None])
                n = filt_szs[b] ** 2
                h_spatial = jnp.fft.ifft2(jnp.fft.ifftshift(hf, axes=(0, 1)),
                                          axes=(0, 1))
                res[f"reg{b}"] = math.sqrt(n) * reg_windows[b][:, :, None] * h_spatial
                if with_proj:
                    res[f"preg{b}"] = math.sqrt(p.projection_reg) * v["P"][b]
            return res

        return residual

    def _precond(self, sample_energy, reg_energies, filt_szs, with_proj,
                 proj_energy=None):
        p = self.params

        def M(v):
            out = {"hf": [], "P": [] if with_proj else None}
            for b in range(len(filt_szs)):
                se = sample_energy[b]
                diag = (1 - p.precond_reg_param) * (
                    p.precond_data_param * se +
                    (1 - p.precond_data_param) * se.mean(-1, keepdims=True)) + \
                    p.precond_reg_param * reg_energies[b]
                out["hf"].append(v["hf"][b] / jnp.maximum(diag, 1e-10))
                if with_proj:
                    out["P"].append(v["P"][b] /
                                    (p.precond_proj_param *
                                     (proj_energy[b] + p.projection_reg)))
            if not with_proj:
                out.pop("P")
            return out

        return M

    # ---------------------------------------------------------------- initialize

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        p = self.params
        im_np, true_hw = self._prepare_image(image)
        im = jnp.asarray(im_np)
        bbox = np.asarray(info["init_bbox"], np.float32)
        target_sz = np.array([bbox[3], bbox[2]])
        sample_sz, target_scale, feat_szs, filt_szs = self._compute_sizes(target_sz)
        self._sample_sz = sample_sz
        self._feat_szs = feat_szs
        self._filt_szs = filt_szs
        self._frame_num_host = 1      # host mirror of state.frame_num
        self._aug_rng = np.random.RandomState(self._seed)
        key = jax.random.PRNGKey(self._seed)

        # labels / regularization windows are static per sequence: host-side
        base_target_sz = target_sz / target_scale
        yfs, reg_windows, reg_energies = [], [], []
        for b, (stride, cdim, sigma_f, _w, reg_edge) in enumerate(p.blocks):
            sigma = (filt_szs[b] / float(sample_sz)) * \
                math.sqrt(float(np.prod(base_target_sz))) * sigma_f
            yfs.append(jnp.asarray(
                dcf.label_function((filt_szs[b], filt_szs[b]), (sigma, sigma)),
                jnp.complex64))
            tgrid = jnp.asarray(base_target_sz * filt_szs[b] / float(sample_sz))
            w = (reg_edge - p.reg_window_min) * self._reg_window(filt_szs[b], tgrid) \
                + p.reg_window_min
            reg_windows.append(w)
            reg_energies.append(float(jnp.sum(w * w)) / (filt_szs[b] ** 2))
        self._static = {"yfs": yfs, "reg_windows": reg_windows,
                        "reg_energies": reg_energies}

        ckey = ("init_crop", im.shape, sample_sz)
        crop = self._jit_cache.get(ckey)
        if crop is None:
            crop = jax.jit(functools.partial(self._init_crop_impl,
                                             sample_sz=sample_sz))
            self._jit_cache[ckey] = crop
        fn = self._jit_cache.get(("init", sample_sz))
        if fn is None:
            fn = self._jit_with_variables(
                functools.partial(self._initialize_from_patch,
                                  sample_sz=sample_sz,
                                  feat_szs=tuple(feat_szs),
                                  filt_szs=tuple(filt_szs)))
            self._jit_cache[("init", sample_sz)] = fn
        image_sz_arr = jnp.asarray(true_hw, jnp.float32)
        # explicit f32 (not weak-typed): a weak-typed target_scale in the init
        # state retraces the track program on the SECOND frame (test_one_compile)
        base_patch = crop(im, jnp.asarray(bbox),
                          jnp.asarray(target_scale, jnp.float32),
                          image_sz_arr)
        self.state = fn(self.variables, base_patch, jnp.asarray(bbox),
                        jnp.asarray(target_scale, jnp.float32), key, yfs,
                        reg_windows,
                        image_sz_arr)
        return {}

    def _init_crop_impl(self, im, bbox, target_scale, image_sz, *, sample_sz):
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

    def _initialize_impl(self, im, bbox, target_scale, key, yfs, reg_windows,
                         image_sz, *, sample_sz, feat_szs, filt_szs) -> ECOState:
        base_patch = self._init_crop_impl(im, bbox, target_scale, image_sz,
                                          sample_sz=sample_sz)
        return self._initialize_from_patch(base_patch, bbox, target_scale, key,
                                           yfs, reg_windows, image_sz,
                                           sample_sz=sample_sz,
                                           feat_szs=feat_szs, filt_szs=filt_szs)

    def _initialize_from_patch(self, base_patch, bbox, target_scale, key, yfs,
                               reg_windows, image_sz, *, sample_sz, feat_szs,
                               filt_szs) -> ECOState:
        p = self.params
        pos = jnp.array([bbox[1] + (bbox[3] - 1) / 2, bbox[0] + (bbox[2] - 1) / 2])
        target_sz = jnp.array([bbox[3], bbox[2]])
        base_target_sz = target_sz / target_scale
        min_scale = jnp.max(10.0 / base_target_sz)
        max_scale = jnp.min(image_sz / base_target_sz)

        init_pos = jnp.round(pos)
        augs = p.aug_dict()
        transforms = aug.build_transforms(
            {k: v for k, v in augs.items() if k != "dropout"},
            (sample_sz, sample_sz), 0.0, self._aug_rng)
        im_patches = aug.apply_all(base_patch, transforms, (sample_sz, sample_sz))
        feats = self._backbone_blocks(im_patches)
        if "dropout" in augs:
            num_drop, prob = augs["dropout"]
            keys = jax.random.split(key, len(feats) + 1)
            key = keys[0]
            feats = [jnp.concatenate([f, aug.dropout2d(f, k, num_drop, prob)])
                     for f, k in zip(feats, keys[1:])]
        T = feats[0].shape[0]

        # PCA projections (reference eco.py:111-115)
        projs = []
        for f, (_, cdim, *_rest) in zip(feats, p.blocks):
            mat = f.reshape(-1, f.shape[-1])
            mat = mat - mat.mean(axis=0, keepdims=True)
            cov = mat.T @ mat
            _, _, vt = jnp.linalg.svd(cov)
            projs.append(vt[:cdim].T)                        # (Cin, cdim)

        # fourier samples, shift-corrected so every training sample has a
        # CENTERED target (reference eco.py:117-128): undo the pure-shift
        # augmentations (patch pixels) and the sub-pixel residual of the
        # non-integer target position (image pixels / target_scale). Without
        # this the init filter is learned on ±shift-displaced targets against a
        # centered label — a blurred filter whose smoother response biases the
        # 5-scale argmax toward larger scales (found via scale-trace parity).
        shift_back = np.zeros((T, 2), np.float32)
        for i, t in enumerate(transforms):
            if t.kind == "identity":
                shift_back[i] = t.shift
        sub_pix = (pos - init_pos) / target_scale          # patch pixels
        shift_norm = (2 * math.pi / float(sample_sz)) * \
            (jnp.asarray(shift_back) + sub_pix[None, :])    # (T, 2)

        raw = []
        samples_f = []
        reg_energies = []
        for b, f in enumerate(feats):
            xf = self._fourier_sample(f, feat_szs[b], filt_szs[b])   # (T, fh, fw, C)
            xf = jnp.moveaxis(fourier.shift_fs(jnp.moveaxis(xf, -1, -3),
                                               shift_norm[:, None, :]), -3, -1)
            raw.append(xf)
            xfp = jnp.einsum("mhwc,cd->mhwd", xf, projs[b])
            samples_f.append(xfp)
            w = reg_windows[b]
            reg_energies.append(jnp.sum(w * w) / (filt_szs[b] ** 2))

        M = p.sample_memory_size
        mem = []
        for b in range(len(p.blocks)):
            buf = jnp.zeros((M,) + samples_f[b].shape[1:], jnp.complex64)
            mem.append(buf.at[:T].set(samples_f[b]))
        sample_weights = jnp.zeros((M,)).at[:T].set(1.0 / T)

        sample_energy = [(jnp.abs(s[:T]) ** 2).mean(axis=0) for s in samples_f]
        proj_energy = [2 * jnp.real(jnp.vdot(yf, yf)) / (filt_szs[b] ** 2) *
                       jnp.ones_like(pr)
                       for b, (yf, pr) in enumerate(zip(yfs, projs))]

        # joint optimization over {hf, P} (reference eco.py:151-158)
        filters0 = [jnp.zeros(s.shape[1:], jnp.complex64) for s in samples_f]
        residual = self._make_residual(None, yfs, sample_weights[:T] * 0 + 1.0 / T,
                                       reg_windows, list(filt_szs), True,
                                       raw_samples=raw)
        precond = self._precond(sample_energy, reg_energies, list(filt_szs), True,
                                proj_energy)
        num_cg = max(p.init_CG_iter // max(p.init_GN_iter, 1), 1)
        res = solvers.gauss_newton_cg(residual, {"hf": filters0, "P": projs},
                                      num_gn_iter=p.init_GN_iter, num_cg_iter=num_cg,
                                      precond=precond)
        filters = res.x["hf"]
        projs = res.x["P"]

        # re-project memory with the optimized projections
        for b in range(len(p.blocks)):
            mem[b] = mem[b].at[:T].set(
                jnp.einsum("mhwc,cd->mhwd", raw[b], projs[b]))

        state = ECOState(
            pos=pos, target_sz=target_sz, target_scale=jnp.asarray(target_scale),
            base_target_sz=base_target_sz, image_sz=image_sz, min_scale=min_scale,
            max_scale=max_scale, filters=tuple(filters), proj=tuple(projs),
            samples_f=tuple(mem), sample_energy=tuple(sample_energy),
            sample_weights=sample_weights, num_stored=jnp.asarray(T, jnp.int32),
            prev_ind=jnp.asarray(-1, jnp.int32), frame_num=jnp.asarray(1, jnp.int32),
            max_score=jnp.asarray(1.0, jnp.float32))
        return state

    # ---------------------------------------------------------------- track

    def track(self, image, info: Optional[dict] = None) -> dict:
        im_np, _ = self._prepare_image(image)
        im = jnp.asarray(im_np)
        ckey = ("crop", im.shape, self._sample_sz)
        crop = self._jit_cache.get(ckey)
        if crop is None:
            crop = jax.jit(functools.partial(self._track_crop_impl,
                                             sample_sz=self._sample_sz))
            self._jit_cache[ckey] = crop
        key = ("track", self._sample_sz)
        fn = self._jit_cache.get(key)
        if fn is None:
            # donate_state: the sample memory is (M, ...) complex64 per block —
            # at the reference's M=200 a non-donated step COPIES those buffers
            # every frame (measured on v5e: 15.3 ms/frame undonated vs 2.85
            # donated; M=50 hid it at 2.6 vs 2.4)
            fn = self._jit_with_variables(functools.partial(
                self._track_from_patch, sample_sz=self._sample_sz,
                feat_szs=tuple(self._feat_szs), filt_szs=tuple(self._filt_szs)),
                donate_state=True)
            self._jit_cache[key] = fn
        patches = crop(self.state, im)
        self.state, out = fn(self.variables, self.state, patches,
                             self._static["yfs"], self._static["reg_windows"])
        # periodic filter CG update, host-scheduled (the schedule is purely
        # frame-count periodic, reference eco.py:233-235) — a separate jitted
        # program so the per-frame step never pays the conditional's memory
        # traffic (see note in _track_impl)
        self._frame_num_host += 1
        if (self._frame_num_host % self.params.train_skipping) == 1:
            ufn = self._jit_cache.get("update")
            if ufn is None:
                ufn = self._jit_with_variables(functools.partial(
                    self._update_impl, filt_szs=tuple(self._filt_szs)),
                    donate_state=True)
                self._jit_cache["update"] = ufn
            self.state = ufn(self.variables, self.state, self._static["yfs"],
                             self._static["reg_windows"])
        result = {"target_bbox": np.asarray(out["target_bbox"]).tolist(),
                  "max_score": float(out["max_score"])}
        if "score_map" in out:
            result["score_map"] = np.asarray(out["score_map"])
        return result

    def _update_impl(self, state: ECOState, yfs, reg_windows, *, filt_szs):
        """Filter-only GN-CG over the sample memory (reference eco.py:233-235,
        train_filter); runs every `train_skipping` frames."""
        p = self.params
        reg_energies = [jnp.sum(w * w) / (filt_szs[b] ** 2)
                        for b, w in enumerate(reg_windows)]
        residual = self._make_residual(state.samples_f, yfs,
                                       state.sample_weights, reg_windows,
                                       list(filt_szs), False)

        def res_hf(v):
            return residual({"hf": v["hf"]})

        precond = self._precond(state.sample_energy, reg_energies,
                                list(filt_szs), False)
        r = solvers.gauss_newton_cg(res_hf, {"hf": list(state.filters)},
                                    num_gn_iter=1, num_cg_iter=p.CG_iter,
                                    precond=lambda v: {"hf": precond(
                                        {"hf": v["hf"]})["hf"]})
        return state.replace(filters=tuple(r.x["hf"]))

    def _track_crop_impl(self, state: ECOState, im, *, sample_sz):
        """Shape-specialized head: the scale-pyramid crop only (see
        DiMPTracker._track_crop_impl for the rationale)."""
        p = self.params
        im = im.astype(jnp.float32)
        support = jnp.full(2, float(sample_sz))
        sample_pos = jnp.round(state.pos)
        scales = jnp.asarray(p.scale_factors) * state.target_scale
        return jax.vmap(
            lambda s: sample_patch(im, sample_pos, s * support,
                                   (sample_sz, sample_sz), mode=p.border_mode,
                                   im_sz=state.image_sz)[0]
        )(scales)

    def _track_impl(self, state: ECOState, im, yfs, reg_windows, *, sample_sz,
                    feat_szs, filt_szs):
        patches = self._track_crop_impl(state, im, sample_sz=sample_sz)
        return self._track_from_patch(state, patches, yfs, reg_windows,
                                      sample_sz=sample_sz, feat_szs=feat_szs,
                                      filt_szs=filt_szs)

    def _track_from_patch(self, state: ECOState, patches, yfs, reg_windows, *,
                          sample_sz, feat_szs, filt_szs):
        p = self.params
        support = jnp.full(2, float(sample_sz))
        out_sz = p.score_upsample_factor * sample_sz
        state = state.replace(frame_num=state.frame_num + 1)

        sample_pos = jnp.round(state.pos)
        scales = jnp.asarray(p.scale_factors) * state.target_scale
        feats = self._backbone_blocks(patches)

        # scores per block, weighted fourier sum (reference localize_target :246-287)
        score_spectra = []
        test_xf = []
        for b, (f, (stride, cdim, _sf, tw, _re)) in enumerate(zip(feats, p.blocks)):
            xf = self._fourier_sample(f, feat_szs[b], filt_szs[b])
            xfp = jnp.einsum("shwc,cd->shwd", xf, state.proj[b])
            test_xf.append(xfp)
            sf = jnp.sum(xfp * state.filters[b][None], axis=-1)   # (S, fh, fw)
            score_spectra.append(tw * sf)
        scores_fs = fourier.sum_fs([jnp.moveaxis(s, 0, 0) for s in score_spectra])
        scores = jnp.real(fourier.sample_fs(scores_fs, (out_sz, out_sz)))  # (S,o,o)

        max_sc, max_disp = dcf.max2d(scores)
        scale_ind = jnp.argmax(max_sc)
        disp = max_disp[scale_ind].astype(jnp.float32)
        disp_mod = (disp + out_sz / 2) % out_sz - out_sz / 2
        translation = disp_mod * (float(sample_sz) / out_sz) * state.target_scale * \
            jnp.asarray(p.scale_factors)[scale_ind]
        new_pos = sample_pos + translation
        new_scale = jnp.clip(state.target_scale *
                             jnp.asarray(p.scale_factors)[scale_ind],
                             state.min_scale, state.max_scale)

        inside_offset = (p.target_inside_ratio - 0.5) * state.base_target_sz * \
            new_scale
        pos = jnp.maximum(jnp.minimum(new_pos, state.image_sz - inside_offset),
                          inside_offset)
        state = state.replace(pos=pos, target_scale=new_scale,
                              target_sz=state.base_target_sz * new_scale)

        # ---- memory update (min-weight replacement, reference :358-380)
        M = p.sample_memory_size
        sw = state.sample_weights
        r_ind = jnp.where(state.num_stored < M, state.num_stored,
                          jnp.argmin(sw).astype(jnp.int32)).astype(jnp.int32)
        prev = state.prev_ind
        sw_new = jnp.where(prev < 0, sw / (1 - p.learning_rate), sw)
        new_w = jnp.where(prev < 0, p.learning_rate,
                          sw[jnp.maximum(prev, 0)] / (1 - p.learning_rate))
        sw_new = sw_new.at[r_ind].set(new_w)
        sw_new = sw_new / sw_new.sum()

        # store the sample shifted so the target sits at the patch center
        # (reference eco.py:226-228): pos moved by `translation` since the crop
        shift_samp = (2 * math.pi) * (state.pos - sample_pos) / \
            (scales[scale_ind] * float(sample_sz))
        new_mem = []
        new_energy = []
        for b in range(len(p.blocks)):
            xf_b = test_xf[b][scale_ind]
            xf_b = jnp.moveaxis(fourier.shift_fs(jnp.moveaxis(xf_b, -1, -3),
                                                 shift_samp), -3, -1)
            new_mem.append(state.samples_f[b].at[r_ind].set(xf_b))
            lr = p.learning_rate
            new_energy.append((1 - lr) * state.sample_energy[b] +
                              lr * jnp.abs(xf_b) ** 2)
        state = state.replace(samples_f=tuple(new_mem), sample_weights=sw_new,
                              sample_energy=tuple(new_energy),
                              num_stored=jnp.minimum(state.num_stored + 1, M),
                              prev_ind=r_ind)

        # NOTE: the periodic filter CG update is NOT in this step. ECO's update
        # schedule is purely frame-count periodic (reference eco.py:233-235) —
        # host-known — so `track()` dispatches `_update_impl` as a SEPARATE
        # jitted program on update frames. Keeping it here as a lax.cond cost
        # ~6.5 ms/frame on v5e: the conditional's operands (the full 50-sample
        # Fourier memory, ~25 MB) round-trip through the branch buffers every
        # frame even when the branch is not taken (measured: 9.1 ms/frame avg
        # with the cond vs 2.5 + amortized 2.5/train_skipping without).
        state = state.replace(max_score=max_sc[scale_ind])

        bbox = jnp.concatenate([state.pos[::-1] - (state.target_sz[::-1] - 1) / 2,
                                state.target_sz[::-1]])
        out = {"target_bbox": bbox, "max_score": max_sc[scale_ind]}
        if self._debug_outputs:
            # wrap-around grid -> centered view for human inspection
            out["score_map"] = jnp.fft.fftshift(scores[scale_ind])
        return state, out


def get_tracker_class():
    return ECOTracker
