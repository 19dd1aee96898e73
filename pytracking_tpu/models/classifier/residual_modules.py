"""Residual-module-driven filter optimizer (DiMP-simple / SuperDiMPSimple).

Re-design of reference `ltr/models/target_classifier/residual_modules.py`
(LinearFilterLearnGen:10) + `ltr/models/meta/steepestdescent.py` (GNSteepestDescent:8):
the same learned label/mask/weight predictors as DiMPSteepestDescentGN, but the
unrolled optimization is the GENERIC Gauss-Newton steepest descent over the residual
function — Jacobian products by autodiff instead of hand-derived updates. Interface
matches `DiMPSteepestDescentGN` so `LinearFilter`/the trackers use either
interchangeably.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.meta.steepestdescent import gn_steepest_descent
from pytracking_tpu.ops import activation as act
from pytracking_tpu.ops.distance import distance_map
from pytracking_tpu.ops.filter import apply_filter


def _apply_ns(feat, weights):
    return jax.vmap(lambda f: apply_filter(f, weights))(feat)


class GNSteepestDescentDiMP(nn.Module):
    """(reference dimpnet50_simple path: residual_modules.LinearFilterLearnGen driven
    by meta.GNSteepestDescent, ltr/models/tracking/dimpnet.py:202-253)."""
    num_iter: int = 1
    feat_stride: int = 16
    init_filter_reg: float = 1e-2
    init_gauss_sigma: float = 1.0
    num_dist_bins: int = 5
    bin_displacement: float = 1.0
    mask_init_factor: float = 4.0
    score_act: str = "bentpar"
    act_param: Optional[float] = None
    mask_act: str = "sigmoid"
    steplength_reg: float = 0.0

    def setup(self):
        d = jnp.arange(self.num_dist_bins, dtype=jnp.float32) * self.bin_displacement
        if self.init_gauss_sigma == 0:
            init_gauss = jnp.zeros(self.num_dist_bins).at[0].set(1.0)
        else:
            init_gauss = jnp.exp(-0.5 * (d / self.init_gauss_sigma) ** 2)
        self.filter_reg = self.param("filter_reg",
                                     lambda k: jnp.full((1,), self.init_filter_reg))
        self.label_map_w = self.param("label_map_w",
                                      lambda k: init_gauss - init_gauss.min())
        init_bias = 0.0 if self.mask_act == "sigmoid" else 0.5
        self.target_mask_w = self.param(
            "target_mask_w",
            lambda k: self.mask_init_factor * jnp.tanh(2.0 - d) + init_bias)
        self.spatial_weight_w = self.param("spatial_weight_w",
                                           lambda k: jnp.ones(self.num_dist_bins))

    def __call__(self, weights, feat, bb, sample_weight=None, num_iter=None,
                 compute_losses: bool = False):
        num_iter = self.num_iter if num_iter is None else num_iter
        N, S = feat.shape[0], feat.shape[1]
        out_sz = (feat.shape[2] + (weights.shape[1] + 1) % 2,
                  feat.shape[3] + (weights.shape[2] + 1) % 2)

        center = ((bb[..., :2] + bb[..., 2:] / 2) / self.feat_stride)
        center = center.reshape(-1, 2)[:, ::-1]
        dmap = distance_map(center, out_sz, self.num_dist_bins, self.bin_displacement)
        shape_ns = (N, S) + out_sz + (1,)
        label = (dmap @ self.label_map_w).reshape(shape_ns)
        mask = dmap @ self.target_mask_w
        if self.mask_act == "sigmoid":
            mask = jax.nn.sigmoid(mask)
        mask = mask.reshape(shape_ns)
        sw = (dmap @ self.spatial_weight_w).reshape(shape_ns)

        if sample_weight is None:
            sample_weight = math.sqrt(1.0 / N) * sw
        else:
            sample_weight = jnp.sqrt(sample_weight).reshape(N, S, 1, 1, 1) * sw

        if self.score_act == "bentpar":
            s_act = lambda s, m: act.bent_ident_par(s, m, self.act_param or 1.0)
        else:
            s_act = act.leaky_relu_par
        reg = self.filter_reg[0]

        def residual(w):
            scores = _apply_ns(feat, w)
            data = sample_weight * (s_act(scores, mask) - label)
            return {"data": data, "reg": reg * w.reshape(1, S, -1)}

        w, w_iters, losses = gn_steepest_descent(
            residual, weights, num_iter, residual_batch_dim=1,
            steplength_reg=self.steplength_reg, compute_losses=compute_losses)
        return w, w_iters, losses
