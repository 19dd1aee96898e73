"""ToMP head: feature stack + filter predictor + classifier + dense box regressor.

Re-design of reference `ltr/models/transformer/heads.py` (Head:17,
LinearFilterClassifier:84, DenseBoxRegressor:101, FPN:144, FPNHead:165 for TaMOs).

Shapes: head features (Nf, Ns, H, W, C); filters (Ns, 1, 1, C, 1); classifier scores
(Nf, Ns, H, W, 1); box predictions LTRB (Nf, Ns, H, W, 4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.ops.filter import apply_filter


def _apply_filter_ns(feat, weights):
    """(Nf, Ns, H, W, C) x (Ns, fh, fw, C, K) -> (Nf, Ns, H, W, K).

    impl='taps': the tap-einsum form partitions cleanly when the sequence axis
    is sharded over a mesh (the vmapped-conv form breaks the SPMD partitioner
    in the mesh train steps — see ops/filter.py)."""
    return jax.vmap(lambda f: apply_filter(f, weights, impl="taps"))(feat)


class LinearFilterClassifier(nn.Module):
    """Project the filter with a linear layer, then correlate (reference heads.py:84-98)."""
    num_channels: int
    project_filter: bool = True

    @nn.compact
    def __call__(self, feat, filt):
        if self.project_filter:
            # filt (Ns, fh, fw, C, K): project each filter's C-vector — move C
            # last so the reshape keeps channels together for K > 1 (TaMOs)
            ft = jnp.swapaxes(filt, -1, -2)
            w = nn.Dense(self.num_channels, name="linear")(
                ft.reshape(-1, self.num_channels)).reshape(ft.shape)
            w = jnp.swapaxes(w, -1, -2)
        else:
            w = filt
        return _apply_filter_ns(feat, w)


class DenseBoxRegressor(nn.Module):
    """Filter-attention over features → conv tower → exp(LTRB) dense box map
    (reference heads.py:101-141). GroupNorm(1) == LayerNorm over (H, W, C) per sample."""
    num_channels: int
    project_filter: bool = True

    @nn.compact
    def __call__(self, feat, filt):
        Nf, Ns, H, W, C = feat.shape
        if self.project_filter:
            w = nn.Dense(self.num_channels, name="linear")(
                filt.reshape(-1, self.num_channels)).reshape(filt.shape)
        else:
            w = filt
        attention = _apply_filter_ns(feat, w)                  # (Nf, Ns, H, W, 1)
        x = (attention * feat).reshape(-1, H, W, C)
        for i in range(4):
            x = nn.Conv(self.num_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"tower{i}_conv")(x)
            x = nn.GroupNorm(num_groups=1, name=f"tower{i}_gn")(x)
            x = nn.relu(x)
        ltrb = jnp.exp(nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                               name="bbreg_layer")(x))
        return ltrb.reshape(Nf, Ns, H, W, 4)


class Head(nn.Module):
    """(reference heads.py:17-81)"""
    filter_predictor: nn.Module
    feature_extractor: nn.Module
    classifier: LinearFilterClassifier
    bb_regressor: DenseBoxRegressor

    def extract_head_feat(self, feat, train: bool = False):
        """Backbone feature (Nf, Ns, H, W, C) -> head feature."""
        Nf, Ns = feat.shape[0], feat.shape[1]
        out = self.feature_extractor(feat.reshape((-1,) + feat.shape[2:]), train=train)
        return out.reshape((Nf, Ns) + out.shape[1:])

    def get_filter_and_features(self, train_feat, test_feat, train_label, train_ltrb,
                                train: bool = False):
        weights, test_feat_enc = self.filter_predictor(
            train_feat, test_feat, train_label, train_ltrb, train=train)
        return weights, weights, test_feat_enc

    def get_filter_and_features_in_parallel(self, train_feat, test_feat, train_label,
                                            train_ltrb, cls_frame_mask=None,
                                            bbreg_frame_mask=None,
                                            train: bool = False):
        return self.filter_predictor.predict_cls_bbreg_filters_parallel(
            train_feat, test_feat, train_label, train_ltrb,
            cls_frame_mask=cls_frame_mask, bbreg_frame_mask=bbreg_frame_mask,
            train=train)

    def run_classifier(self, feat, filt):
        return self.classifier(feat, filt)

    def run_bbreg(self, feat, filt):
        return self.bb_regressor(feat, filt)

    def __call__(self, train_feat, test_feat, train_bb_label, train_ltrb,
                 train: bool = False):
        train_feat = self.extract_head_feat(train_feat, train=train)
        test_feat = self.extract_head_feat(test_feat, train=train)
        cls_filter, breg_filter, test_feat_enc = self.get_filter_and_features(
            train_feat, test_feat, train_bb_label, train_ltrb, train=train)
        target_scores = self.classifier(test_feat_enc, cls_filter)
        bbox_preds = self.bb_regressor(test_feat_enc, breg_filter)
        return target_scores, bbox_preds
