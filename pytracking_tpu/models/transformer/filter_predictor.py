"""Transformer filter predictor (ToMP).

Re-design of reference `ltr/models/transformer/filter_predictor.py` (FilterPredictor:19,
predict_cls_bbreg_filters_parallel:92): tokens = train features + fg-token·label +
box-MLP(ltrb) encodings, plus test features (+ test token); the encoder enhances the
test features, the single-query decoder emits the target-model filter.

Batch-first shapes: feats (Nf, Ns, H, W, C); labels (Nf, Ns, H, W);
ltrb (Nf, Ns, H, W, 4). Token order matches the reference flatten: (frame, row, col).

The reference's "parallel" variant duplicates every sequence and masks the duplicate's
extra-memory train tokens so one forward yields the classification filter (sees all
memory frames) and the bbreg filter (sees only the ground-truth frames). The mask is a
traced per-frame boolean, so memory growth never recompiles.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.transformer.position_encoding import position_embedding_sine
from pytracking_tpu.models.transformer.transformer import Transformer


class BoxEncoder(nn.Module):
    """1x1-conv MLP [4 -> d/4 -> d -> d] with BN+ReLU between (reference
    filter_predictor.py:6-16). Operates tokenwise on (..., 4)."""
    d_model: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.d_model // 4, self.d_model, self.d_model]
        for i, d in enumerate(dims):
            x = nn.Dense(d, name=f"lin{i}")(x)
            if i < len(dims) - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"bn{i}")(x.reshape(-1, x.shape[-1])).reshape(x.shape)
                x = nn.relu(x)
        return x


class FilterPredictor(nn.Module):
    transformer: Transformer
    feature_sz: int = 18
    use_test_frame_encoding: bool = True

    def setup(self):
        d = self.transformer.d_model
        self.box_encoding = BoxEncoder(d)
        self.query_embed_fg = self.param("query_embed_fg",
                                         nn.initializers.normal(1.0), (1, d))
        if self.use_test_frame_encoding:
            self.query_embed_test = self.param("query_embed_test",
                                               nn.initializers.normal(1.0), (1, d))

    def _tokens(self, feat):
        """(Nf, Ns, H, W, C) -> (Ns, Nf*H*W, C) in (frame, row, col) order."""
        Nf, Ns, H, W, C = feat.shape
        return feat.transpose(1, 0, 2, 3, 4).reshape(Ns, Nf * H * W, C)

    def _pos(self, feat):
        Nf, Ns, H, W, C = feat.shape
        pos = position_embedding_sine((H, W), C, self.feature_sz)   # (H, W, C)
        return jnp.tile(pos.reshape(1, H * W, C), (Ns, Nf, 1))

    def _build_sequence(self, train_feat, test_feat, train_label, train_ltrb,
                        train: bool):
        train_tok = self._tokens(train_feat)
        test_tok = self._tokens(test_feat)
        label_tok = self._tokens(train_label[..., None])[..., 0]     # (Ns, Ltr)
        ltrb_tok = self._tokens(train_ltrb)                          # (Ns, Ltr, 4)

        fg = self.query_embed_fg.reshape(1, 1, -1)
        train_tok = train_tok + fg * label_tok[..., None] \
            + self.box_encoding(ltrb_tok, train=train)
        if self.use_test_frame_encoding:
            test_tok = test_tok + self.query_embed_test.reshape(1, 1, -1)
        seq = jnp.concatenate([train_tok, test_tok], axis=1)
        pos = jnp.concatenate([self._pos(train_feat), self._pos(test_feat)], axis=1)
        return seq, pos

    def predict_filter(self, train_feat, test_feat, train_label, train_ltrb,
                       train: bool = False):
        """Returns (filter (Ns, 1, 1, C, 1), enhanced test feat like test_feat)."""
        seq, pos = self._build_sequence(train_feat, test_feat, train_label, train_ltrb,
                                        train)
        dec, mem = self.transformer(seq, self.query_embed_fg, pos, train=train)
        Nf_te, Ns, h, w, C = test_feat.shape
        enc_opt = mem[:, -Nf_te * h * w:].reshape(Ns, Nf_te, h, w, C).transpose(
            1, 0, 2, 3, 4)
        filt = dec[:, 0].reshape(Ns, 1, 1, C, 1)
        return filt, enc_opt

    def __call__(self, train_feat, test_feat, train_label, train_ltrb,
                 train: bool = False):
        return self.predict_filter(train_feat, test_feat, train_label, train_ltrb,
                                   train=train)

    def predict_cls_bbreg_filters_parallel(self, train_feat, test_feat, train_label,
                                           train_ltrb, cls_frame_mask=None,
                                           bbreg_frame_mask=None,
                                           train: bool = False):
        """One forward producing (cls_filter, bbreg_filter, cls_test_enc,
        bbreg_test_enc) (reference filter_predictor.py:92-150).

        cls_frame_mask / bbreg_frame_mask: (Nf_tr,) bool — which memorized train frames
        each copy may attend to. The reference masks the bbreg copy down to the
        ground-truth frames (src_key_padding_mask at :134-136); here both copies take a
        traced mask so a fixed-shape memory with empty slots never recompiles.
        """
        Nf_tr, Ns, H, W, C = train_feat.shape
        Nf_te, _, h, w, _ = test_feat.shape

        def stack2(x):
            return jnp.concatenate([x, x], axis=1)

        seq, pos = self._build_sequence(stack2(train_feat), stack2(test_feat),
                                        stack2(train_label), stack2(train_ltrb), train)
        # sequences are ordered [orig..., copy...]; copy 0 = cls, copy 1 = bbreg
        L_tr = Nf_tr * H * W
        L = seq.shape[1]
        key_padding = jnp.zeros((2 * Ns, L), bool)
        for copy_idx, fmask in ((0, cls_frame_mask), (1, bbreg_frame_mask)):
            if fmask is None:
                continue
            tok_mask = jnp.repeat(~jnp.asarray(fmask, bool), H * W)
            pad_row = jnp.concatenate([tok_mask, jnp.zeros(L - L_tr, bool)])
            rows = slice(0, Ns) if copy_idx == 0 else slice(Ns, 2 * Ns)
            key_padding = key_padding.at[rows].set(pad_row[None])

        dec, mem = self.transformer(seq, self.query_embed_fg, pos,
                                    key_padding_mask=key_padding, train=train)
        enc = mem[:, -Nf_te * h * w:].reshape(2 * Ns, Nf_te, h, w, C).transpose(
            1, 0, 2, 3, 4)
        filt = dec[:, 0].reshape(2 * Ns, 1, 1, C, 1)
        cls_filter, bbreg_filter = filt[:Ns], filt[Ns:]
        cls_enc, bbreg_enc = enc[:, :Ns], enc[:, Ns:]
        return cls_filter, bbreg_filter, cls_enc, bbreg_enc
