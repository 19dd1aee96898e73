"""LWL target model: a conv layer whose weights come from the few-shot learner.

Re-design of reference `ltr/models/lwl/linear_filter.py` (LinearFilter:7),
`lwl/initializer.py` (FilterInitializerZero) and `lwl/loss_residual_modules.py`
(LWTLResidual:8). The few-shot learner minimizes
‖W(y)·(T_τ(x) − E(y))‖² + λ‖τ‖² via the generic unrolled Gauss-Newton steepest descent
(models/meta/steepestdescent.py).

NOTE: the learned regularizer λ (`filter_reg`) is read OUT of the parameter store
before entering the unrolled solver — the residual passed to jvp/vjp must be a pure
function of the filter (a flax submodule call inside the solver would leak tracers).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.meta.steepestdescent import gn_steepest_descent
from pytracking_tpu.ops.filter import apply_filter


def _apply_ns(feat, weights):
    """(Nf, Ns, H, W, C) x (Ns, fh, fw, C, K) -> (Nf, Ns, H, W, K)."""
    return jax.vmap(lambda f: apply_filter(f, weights))(feat)


def lwl_residual(filt, feat, label, sample_weight, filter_reg):
    """Few-shot learning residuals (reference loss_residual_modules.py:8-41) — pure."""
    N = feat.shape[0]
    S = feat.shape[1]
    scores = _apply_ns(feat, filt)
    if sample_weight is None:
        sample_weight = math.sqrt(1.0 / N)
    data = sample_weight * (scores - label)
    reg = filter_reg * filt.reshape(1, S, -1)
    return {"data": data, "reg": reg}


class LWLLinearFilter(nn.Module):
    """Target model + few-shot learner (reference lwl/linear_filter.py:7-93)."""
    filter_size: int = 3
    num_filters: int = 16
    feature_dim: int = 512
    num_iter: int = 5
    init_filter_reg: float = 1e-2
    feature_extractor: Optional[nn.Module] = None

    def setup(self):
        self.filter_reg = self.param(
            "filter_reg", lambda k: jnp.full((1,), self.init_filter_reg))

    def _filter_reg(self):
        return self.filter_reg[0]

    def extract_target_model_features(self, feat, train: bool = False):
        if self.feature_extractor is None:
            return feat
        if feat.ndim == 5:
            n, s = feat.shape[:2]
            out = self.feature_extractor(feat.reshape((-1,) + feat.shape[2:]),
                                         train=train)
            return out.reshape((n, s) + out.shape[1:])
        return self.feature_extractor(feat, train=train)

    def apply_target_model(self, weights, feat):
        return _apply_ns(feat, weights)

    def get_filter(self, feat, label, sample_weight=None, num_iter=None):
        """feat (Nf, Ns, H, W, C), label (Nf, Ns, H, W, K) -> filter
        (Ns, fs, fs, C, K)."""
        num_iter = self.num_iter if num_iter is None else num_iter
        Ns = feat.shape[1]
        w0 = jnp.zeros((Ns, self.filter_size, self.filter_size, self.feature_dim,
                        self.num_filters), feat.dtype)
        return self.update_filter(w0, feat, label, sample_weight, num_iter)

    def update_filter(self, filt, feat, label, sample_weight=None, num_iter=2):
        reg = self._filter_reg()

        def residual_fn(w):
            return lwl_residual(w, feat, label, sample_weight, reg)

        return gn_steepest_descent(residual_fn, filt, num_iter, residual_batch_dim=1)

    def __call__(self, train_feat, test_feat, train_label, train_sw=None,
                 num_iter=None, train: bool = False):
        """Training forward: returns mask encodings for every filter iterate
        (num_iters, Nte, Ns, H, W, K)."""
        train_feat = self.extract_target_model_features(train_feat, train=train)
        test_feat = self.extract_target_model_features(test_feat, train=train)
        w, w_iters, _ = self.get_filter(train_feat, train_label, train_sw, num_iter)
        return jax.vmap(lambda wi: self.apply_target_model(wi, test_feat))(w_iters)
