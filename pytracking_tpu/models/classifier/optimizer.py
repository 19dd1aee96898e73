"""Meta-learned unrolled filter optimizers (DiMP / PrDiMP).

Re-design of reference `ltr/models/target_classifier/optimizer.py`:
  DiMPSteepestDescentGN (:11)        -> `DiMPSteepestDescentGN`
  PrDiMPSteepestDescentNewton (:294) -> `PrDiMPSteepestDescentNewton`

TPU-first: the iteration loop is a `lax.scan` with a STATIC iteration count, so the
whole optimize-the-filter computation traces into one XLA program — at tracking time it
runs inside the jitted track step with zero host sync (the reference's Python loop
launches ~10 kernels per iteration). All learned quantities (step length, regularizer,
label/mask/weight predictors) are flax parameters, so training differentiates through
the unrolled iterations exactly like the reference.

Shapes: weights (S, fh, fw, C, 1); feat (N, S, H, W, C); bb (N, S, 4) xywh in image
coords; sample_weight (N, S) or None.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.ops import activation as act
from pytracking_tpu.ops.distance import distance_map
from pytracking_tpu.ops.filter import apply_feat_transpose, apply_filter


def _score_sz(feat_shape, filt_shape) -> Tuple[int, int]:
    """Score-map size convention of the reference (optimizer.py:105): feat size +1 for
    even filters (apply_filter pads fsz//2 on both sides)."""
    return (feat_shape[-3] + (filt_shape[1] + 1) % 2,
            feat_shape[-2] + (filt_shape[2] + 1) % 2)


def _apply_filter_ns(feat: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """apply_filter over (N, S, H, W, C) with per-sequence weights (S, fh, fw, C, 1)
    -> (N, S, H, W, 1)."""
    return jax.vmap(lambda f: apply_filter(f, weights))(feat)


def _feat_transpose_ns(feat: jnp.ndarray, res: jnp.ndarray, fsz) -> jnp.ndarray:
    """Sum of per-image filter gradients -> (S, fh, fw, C, 1)."""
    g = jax.vmap(lambda f, r: apply_feat_transpose(f, r, fsz))(feat, res)
    return g.sum(axis=0)


class DiMPSteepestDescentGN(nn.Module):
    """Unrolled steepest-descent Gauss-Newton filter optimizer with learned residual
    (label map y, target mask m, spatial weight v predicted from a distance map) —
    reference optimizer.py:11-170."""
    num_iter: int = 1
    feat_stride: int = 16
    init_step_length: float = 1.0
    init_filter_reg: float = 1e-2
    init_gauss_sigma: float = 1.0
    num_dist_bins: int = 5
    bin_displacement: float = 1.0
    mask_init_factor: float = 4.0
    score_act: str = "relu"          # 'relu' (LeakyReluPar) or 'bentpar'
    act_param: Optional[float] = None
    min_filter_reg: float = 1e-3
    mask_act: str = "sigmoid"
    alpha_eps: float = 0.0

    def setup(self):
        self.log_step_length = self.param(
            "log_step_length", lambda k: jnp.full((1,), math.log(self.init_step_length)))
        self.filter_reg = self.param(
            "filter_reg", lambda k: jnp.full((1,), self.init_filter_reg))

        d = jnp.arange(self.num_dist_bins, dtype=jnp.float32) * self.bin_displacement
        if self.init_gauss_sigma == 0:
            init_gauss = jnp.zeros(self.num_dist_bins).at[0].set(1.0)
        else:
            init_gauss = jnp.exp(-0.5 * (d / self.init_gauss_sigma) ** 2)
        # 1x1 convs over the bin axis == dot products with per-bin weight vectors
        self.label_map_w = self.param(
            "label_map_w", lambda k: init_gauss - init_gauss.min())
        init_bias = 0.0 if self.mask_act == "sigmoid" else 0.5
        self.target_mask_w = self.param(
            "target_mask_w", lambda k: self.mask_init_factor * jnp.tanh(2.0 - d) + init_bias)
        self.spatial_weight_w = self.param(
            "spatial_weight_w", lambda k: jnp.ones(self.num_dist_bins))

    def _predictors(self, bb: jnp.ndarray, filter_sz, output_sz):
        """Label map / target mask / spatial weight from the target-center distance map
        (reference optimizer.py:111-119)."""
        dmap_offset = (jnp.asarray(filter_sz, jnp.float32) % 2) / 2.0
        center = ((bb[..., :2] + bb[..., 2:] / 2) / self.feat_stride)
        center = center.reshape(-1, 2)[:, ::-1] - dmap_offset  # (x,y)->(y,x)
        dmap = distance_map(center, output_sz, self.num_dist_bins,
                            self.bin_displacement)  # (N*S, H, W, bins)
        label = dmap @ self.label_map_w
        mask = dmap @ self.target_mask_w
        if self.mask_act == "sigmoid":
            mask = jax.nn.sigmoid(mask)
        weight = dmap @ self.spatial_weight_w
        return label, mask, weight

    def __call__(self, weights: jnp.ndarray, feat: jnp.ndarray, bb: jnp.ndarray,
                 sample_weight: Optional[jnp.ndarray] = None,
                 num_iter: Optional[int] = None, compute_losses: bool = False):
        num_iter = self.num_iter if num_iter is None else num_iter
        N, S = feat.shape[0], feat.shape[1]
        fsz = (weights.shape[1], weights.shape[2])
        out_sz = _score_sz(feat.shape, weights.shape)

        step_length = jnp.exp(self.log_step_length)
        reg = jnp.clip(self.filter_reg * self.filter_reg, self.min_filter_reg ** 2, None)

        label, mask, sw = self._predictors(bb, fsz, out_sz)
        shape_ns = (N, S) + out_sz + (1,)
        label = label.reshape(shape_ns)
        mask = mask.reshape(shape_ns)
        sw = sw.reshape(shape_ns)

        if sample_weight is None:
            sample_weight = math.sqrt(1.0 / N) * sw
        else:
            sample_weight = jnp.sqrt(sample_weight).reshape(N, S, 1, 1, 1) * sw

        if self.score_act == "bentpar":
            s_act = lambda s, m: act.bent_ident_par(s, m, self.act_param)
            s_act_deriv = lambda s, m: act.bent_ident_par_deriv(s, m, self.act_param)
        else:
            s_act = act.leaky_relu_par
            s_act_deriv = act.leaky_relu_par_deriv

        def loss_of(w):
            scores = _apply_filter_ns(feat, w)
            r = sample_weight * (s_act(scores, mask) - label)
            return (jnp.sum(r * r) + reg[0] * jnp.sum(w * w)) / S

        def step(w, _):
            scores = _apply_filter_ns(feat, w)                     # (N,S,H,W,1)
            scores_act = s_act(scores, mask)
            score_mask = s_act_deriv(scores, mask)
            residuals = sample_weight * (scores_act - label)
            loss = (jnp.sum(residuals ** 2) + reg[0] * jnp.sum(w * w)) / S

            residuals_mapped = score_mask * (sample_weight * residuals)
            w_grad = _feat_transpose_ns(feat, residuals_mapped, fsz) + reg[0] * w

            scores_grad = _apply_filter_ns(feat, w_grad)
            scores_grad = sample_weight * (score_mask * scores_grad)

            alpha_num = jnp.sum(w_grad * w_grad, axis=(1, 2, 3, 4))        # (S,)
            alpha_den = jnp.clip(
                jnp.sum(scores_grad ** 2, axis=(0, 2, 3, 4))
                + (reg[0] + self.alpha_eps) * alpha_num, 1e-8, None)
            alpha = alpha_num / alpha_den

            w = w - (step_length[0] * alpha)[:, None, None, None, None] * w_grad
            return w, (w, loss)

        weights, (w_iters, losses) = jax.lax.scan(step, weights, None, length=num_iter)
        if compute_losses:
            losses = jnp.concatenate([losses, loss_of(weights)[None]])
        else:
            losses = jnp.zeros((0,))
        return weights, w_iters, losses


class PrDiMPSteepestDescentNewton(nn.Module):
    """Unrolled steepest-descent Newton optimizer on the KL divergence between the
    softmax of the scores and a Gaussian label density — reference optimizer.py:294-439."""
    num_iter: int = 1
    feat_stride: int = 16
    init_step_length: float = 1.0
    init_filter_reg: float = 1e-2
    gauss_sigma: float = 1.0
    min_filter_reg: float = 1e-3
    alpha_eps: float = 0.0
    init_uni_weight: Optional[float] = None
    normalize_label: bool = False
    label_shrink: float = 0.0
    softmax_reg: Optional[float] = None
    label_threshold: float = 0.0

    def setup(self):
        self.log_step_length = self.param(
            "log_step_length", lambda k: jnp.full((1,), math.log(self.init_step_length)))
        self.filter_reg = self.param(
            "filter_reg", lambda k: jnp.full((1,), self.init_filter_reg))

    def get_label_density(self, center: jnp.ndarray, output_sz) -> jnp.ndarray:
        """(B, 2) centers -> (B, H, W, 1) label densities (reference :331-353)."""
        H, W = output_sz
        k0 = jnp.arange(H, dtype=jnp.float32)
        k1 = jnp.arange(W, dtype=jnp.float32)
        d0 = (k0[None, :] - center[:, 0:1]) ** 2
        d1 = (k1[None, :] - center[:, 1:2]) ** 2
        if self.gauss_sigma == 0:
            g0 = (d0 == d0.min(axis=1, keepdims=True)).astype(jnp.float32)
            g1 = (d1 == d1.min(axis=1, keepdims=True)).astype(jnp.float32)
            gauss = g0[:, :, None] * g1[:, None, :]
        else:
            g0 = jnp.exp(-d0 / (2 * self.gauss_sigma ** 2)) / (2 * math.pi * self.gauss_sigma ** 2)
            g1 = jnp.exp(-d1 / (2 * self.gauss_sigma ** 2))
            gauss = g0[:, :, None] * g1[:, None, :]
        gauss = gauss * (gauss > self.label_threshold)
        if self.normalize_label:
            gauss = gauss / (gauss.sum(axis=(-2, -1), keepdims=True) + 1e-8)
        uni = 0.0 if self.init_uni_weight is None else self.init_uni_weight
        dens = (1.0 - self.label_shrink) * ((1.0 - uni) * gauss + uni / (H * W))
        return dens[..., None]

    def __call__(self, weights: jnp.ndarray, feat: jnp.ndarray, bb: jnp.ndarray,
                 sample_weight: Optional[jnp.ndarray] = None,
                 num_iter: Optional[int] = None, compute_losses: bool = False):
        num_iter = self.num_iter if num_iter is None else num_iter
        N, S = feat.shape[0], feat.shape[1]
        fsz = (weights.shape[1], weights.shape[2])
        out_sz = _score_sz(feat.shape, weights.shape)

        step_length = jnp.exp(self.log_step_length)
        reg = jnp.clip(self.filter_reg * self.filter_reg, self.min_filter_reg ** 2, None)

        offset = (jnp.asarray(fsz, jnp.float32) % 2) / 2.0
        center = ((bb[..., :2] + bb[..., 2:] / 2) / self.feat_stride)
        center = center.reshape(-1, 2)[:, ::-1] - offset
        label_density = self.get_label_density(center, out_sz).reshape(
            (N, S) + out_sz + (1,))

        if sample_weight is None:
            sample_weight = jnp.full((N, S, 1, 1, 1), 1.0 / N)
        else:
            sample_weight = sample_weight.reshape(N, S, 1, 1, 1)

        exp_reg = 0.0 if self.softmax_reg is None else math.exp(self.softmax_reg)

        def softmax_scores(scores):
            flat = scores.reshape(N, S, -1)
            return act.softmax_reg(flat, axis=2, reg=self.softmax_reg).reshape(scores.shape)

        def loss_of(scores, w):
            lse = jnp.log(jnp.exp(scores).sum(axis=(-3, -2, -1)) + exp_reg)   # (N, S)
            xent = (label_density * scores).sum(axis=(-3, -2, -1))
            return (jnp.sum(sample_weight.reshape(N, S) * (lse - xent)) / S
                    + reg[0] * jnp.sum(w * w) / S)

        def step(w, _):
            scores = _apply_filter_ns(feat, w)
            sm = softmax_scores(scores)
            res = sample_weight * (sm - label_density)
            loss = loss_of(scores, w)

            w_grad = _feat_transpose_ns(feat, res, fsz) + reg[0] * w

            scores_grad = _apply_filter_ns(feat, w_grad)
            sm_scores_grad = sm * scores_grad
            hes_scores_grad = sm_scores_grad - sm * sm_scores_grad.sum(
                axis=(-3, -2), keepdims=True)
            ghg = jnp.clip((scores_grad * hes_scores_grad).reshape(N, S, -1).sum(-1),
                           0.0, None)
            ghg = (sample_weight.reshape(N, S) * ghg).sum(axis=0)              # (S,)

            alpha_num = jnp.sum(w_grad * w_grad, axis=(1, 2, 3, 4))
            alpha_den = jnp.clip(ghg + (reg[0] + self.alpha_eps) * alpha_num, 1e-8, None)
            alpha = alpha_num / alpha_den

            w = w - (step_length[0] * alpha)[:, None, None, None, None] * w_grad
            return w, (w, loss)

        weights, (w_iters, losses) = jax.lax.scan(step, weights, None, length=num_iter)
        if compute_losses:
            final = loss_of(_apply_filter_ns(feat, weights), weights)
            losses = jnp.concatenate([losses, final[None]])
        else:
            losses = jnp.zeros((0,))
        return weights, w_iters, losses
