"""Target classification filter module: feature extractor + initializer + optimizer.

Re-design of reference `ltr/models/target_classifier/linear_filter.py` (LinearFilter:6).
The training forward learns a filter on the train frames and scores the test frames with
every optimizer iterate; at tracking time the tracker calls `extract_classification_feat`
/ `get_filter` / `classify` individually from inside its jitted step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.ops.filter import apply_filter


class LinearFilter(nn.Module):
    filter_size: int
    filter_initializer: nn.Module
    filter_optimizer: Optional[nn.Module] = None
    feature_extractor: Optional[nn.Module] = None

    def extract_classification_feat(self, feat: jnp.ndarray, train: bool = False):
        """Backbone feature (..., H, W, C) -> classification feature. Works on 4-dim
        (B, H, W, C) or 5-dim (N, S, H, W, C) inputs (reference linear_filter.py:64-73)."""
        if self.feature_extractor is None:
            return feat
        if feat.ndim == 5:
            n, s = feat.shape[:2]
            out = self.feature_extractor(feat.reshape((-1,) + feat.shape[2:]), train=train)
            return out.reshape((n, s) + out.shape[1:])
        return self.feature_extractor(feat, train=train)

    def get_filter(self, feat: jnp.ndarray, bb: jnp.ndarray, num_iter=None,
                   sample_weight=None, compute_losses: bool = False, **opt_kwargs):
        """feat (N, S, H, W, C), bb (N, S, 4) -> optimized filter (S, fh, fw, C, 1)
        (reference linear_filter.py:82-102). Extra kwargs (e.g. train_label for the
        hinge optimizer) go to the filter optimizer."""
        weights = self.filter_initializer(feat, bb)
        if self.filter_optimizer is not None:
            weights, w_iters, losses = self.filter_optimizer(
                weights, feat=feat, bb=bb, sample_weight=sample_weight,
                num_iter=num_iter, compute_losses=compute_losses, **opt_kwargs)
        else:
            w_iters, losses = weights[None], jnp.zeros((0,))
        return weights, w_iters, losses

    def classify(self, weights: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
        """Score test features: feat (N, S, H, W, C) or (S, H, W, C) with weights
        (S, fh, fw, C, 1) (reference linear_filter.py:75-80)."""
        if feat.ndim == 5:
            return jax.vmap(lambda f: apply_filter(f, weights))(feat)
        return apply_filter(feat, weights)

    def __call__(self, train_feat, test_feat, train_bb, num_iter=None,
                 train: bool = False):
        """Training forward (reference linear_filter.py:36-62): returns scores of every
        filter iterate on the test samples, shape (num_iters, Ntest, S, H, W, 1)."""
        train_feat = self.extract_classification_feat(train_feat, train=train)
        test_feat = self.extract_classification_feat(test_feat, train=train)
        weights, w_iters, losses = self.get_filter(train_feat, train_bb, num_iter=num_iter,
                                                   compute_losses=True)
        scores = jax.vmap(lambda w: self.classify(w, test_feat))(w_iters)
        return scores, losses
