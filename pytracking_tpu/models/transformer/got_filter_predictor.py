"""Multi-object (GOT) transformer filter predictor — TaMOs.

Re-design of reference `ltr/models/transformer/filter_predictor.py`
(GOTFilterPredictor:153): K learned object queries (orthogonally initialized); the
per-object Gaussian labels are injected into the train tokens as Σ_k fg_token[k] ·
label_k (label_enc='gaussian'); the decoder emits one filter per object token in a
single forward — the object axis is native batch work on the MXU, replacing the
reference's per-object tracker instances.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.transformer.filter_predictor import BoxEncoder
from pytracking_tpu.models.transformer.position_encoding import position_embedding_sine
from pytracking_tpu.models.transformer.transformer import Transformer


def _orthogonal_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.nn.initializers.orthogonal()(key, shape, dtype)


class GOTFilterPredictor(nn.Module):
    transformer: Transformer
    feature_sz: int = 24
    num_tokens: int = 10
    label_enc: str = "gaussian"
    box_enc: str = "ltrb"

    def setup(self):
        d = self.transformer.d_model
        self.box_encoding = BoxEncoder(d)
        self.query_embed_fg = self.param("query_embed_fg", _orthogonal_init,
                                         (self.num_tokens, d))

    def _tokens(self, feat):
        Nf, Ns, H, W, C = feat.shape
        return feat.transpose(1, 0, 2, 3, 4).reshape(Ns, Nf * H * W, C)

    def _pos(self, feat):
        Nf, Ns, H, W, C = feat.shape
        pos = position_embedding_sine((H, W), C, self.feature_sz)
        return jnp.tile(pos.reshape(1, H * W, C), (Ns, Nf, 1))

    def predict_filter(self, train_feat, test_feat, train_label, train_ltrb=None,
                       train_frame_mask=None, train: bool = False):
        """train_feat (Nf, Ns, H, W, C); train_label (Nf, Ns, K, H, W);
        train_ltrb (Nf, Ns, K, H, W, 4) (unused for box_enc='ltrb' with K>1, matching
        the reference :210-220); train_frame_mask (Nf,) traced bool.

        Returns (filters (Ns, K, 1, 1, C, 1), enhanced test feat (Nf_te, Ns, h, w, C)).
        """
        Nf, Ns, H, W, C = train_feat.shape
        Nf_te, _, h, w, _ = test_feat.shape
        K = self.num_tokens

        train_tok = self._tokens(train_feat)
        test_tok = self._tokens(test_feat)
        # (Ns, Ltr, K) label per token
        label_tok = train_label.transpose(1, 0, 3, 4, 2).reshape(Ns, Nf * H * W, K)
        fg = self.query_embed_fg                                  # (K, C)
        train_tok = train_tok + jnp.einsum("blk,kc->blc", label_tok, fg,
                                           preferred_element_type=jnp.float32)
        if self.box_enc == "ltrb_token" and train_ltrb is not None:
            ltrb_tok = train_ltrb.transpose(1, 0, 3, 4, 2, 5).reshape(
                Ns, Nf * H * W, K, 4)
            enc = self.box_encoding(ltrb_tok, train=train)        # (Ns, L, K, C)
            train_tok = train_tok + jnp.einsum("blkc,kc->blc", enc, fg)

        seq = jnp.concatenate([train_tok, test_tok], axis=1)
        pos = jnp.concatenate([self._pos(train_feat), self._pos(test_feat)], axis=1)

        key_padding = None
        if train_frame_mask is not None:
            tok_mask = jnp.repeat(~jnp.asarray(train_frame_mask, bool), H * W)
            pad_row = jnp.concatenate([tok_mask,
                                       jnp.zeros(Nf_te * h * w, bool)])
            key_padding = jnp.broadcast_to(pad_row[None], (Ns, pad_row.size))

        dec, mem = self.transformer(seq, self.query_embed_fg, pos,
                                    key_padding_mask=key_padding, train=train)
        enc_opt = mem[:, -Nf_te * h * w:].reshape(Ns, Nf_te, h, w, C).transpose(
            1, 0, 2, 3, 4)
        filters = dec.reshape(Ns, K, 1, 1, C, 1)
        return filters, enc_opt

    def predict_cls_bbreg_filters_parallel(self, train_feat, test_feat,
                                           train_label, train_ltrb,
                                           train_frame_mask, gth_frame_mask,
                                           train: bool = False):
        """Parallel cls/bbreg filter prediction (reference
        filter_predictor.py:235-318 GOTFilterPredictor
        ._predict_cls_bbreg_filters_parallel): the sequence batch is DUPLICATED
        — column 0 sees every valid memory frame (classification filter),
        column 1 additionally masks the non-ground-truth train tokens (box
        regression filter is predicted from the annotated init frame only).

        Fixed-shape/jit-stable version of the reference's dynamic fallback:
        when only ground-truth frames are stored, both columns see identical
        valid sets, so this equals the reference's shared `predict_filter`
        fallback (reference :237-240).

        train_feat (Nf, Ns, H, W, C); train_label (Nf, Ns, K, H, W);
        train_ltrb (Nf, Ns, K, H, W, 4); train_frame_mask / gth_frame_mask
        (Nf,) bool. Returns (cls_filters, bbreg_filters, cls_enc, bbreg_enc)
        with filters (Ns, K, 1, 1, C, 1) and enc (Nf_te, Ns, h, w, C)."""
        Nf, Ns, H, W, C = train_feat.shape
        Nf_te, _, h, w, _ = test_feat.shape
        K = self.num_tokens

        def stack2(x, axis=1):
            return jnp.concatenate([x, x], axis=axis)

        train_tok = self._tokens(stack2(train_feat))             # (2Ns, Ltr, C)
        test_tok = self._tokens(stack2(test_feat))
        label_tok = stack2(train_label).transpose(1, 0, 3, 4, 2).reshape(
            2 * Ns, Nf * H * W, K)
        fg = self.query_embed_fg
        train_tok = train_tok + jnp.einsum("blk,kc->blc", label_tok, fg,
                                           preferred_element_type=jnp.float32)
        if self.box_enc == "ltrb_token" and train_ltrb is not None:
            ltrb_tok = stack2(train_ltrb).transpose(1, 0, 3, 4, 2, 5).reshape(
                2 * Ns, Nf * H * W, K, 4)
            enc = self.box_encoding(ltrb_tok, train=train)       # (2Ns, L, K, C)
            train_tok = train_tok + jnp.einsum("blkc,kc->blc", enc, fg)

        seq = jnp.concatenate([train_tok, test_tok], axis=1)
        pos2 = jnp.concatenate([
            stack2(self._pos(train_feat), axis=0),
            stack2(self._pos(test_feat), axis=0)], axis=1)

        valid = jnp.asarray(train_frame_mask, bool)
        valid_gth = valid & jnp.asarray(gth_frame_mask, bool)
        row_cls = jnp.concatenate([jnp.repeat(~valid, H * W),
                                   jnp.zeros(Nf_te * h * w, bool)])
        row_bb = jnp.concatenate([jnp.repeat(~valid_gth, H * W),
                                  jnp.zeros(Nf_te * h * w, bool)])
        key_padding = jnp.concatenate([
            jnp.broadcast_to(row_cls[None], (Ns, row_cls.size)),
            jnp.broadcast_to(row_bb[None], (Ns, row_bb.size))], axis=0)

        dec, mem = self.transformer(seq, self.query_embed_fg, pos2,
                                    key_padding_mask=key_padding, train=train)
        enc_opt = mem[:, -Nf_te * h * w:].reshape(2 * Ns, Nf_te, h, w,
                                                  C).transpose(1, 0, 2, 3, 4)
        filters = dec.reshape(2 * Ns, K, 1, 1, C, 1)
        return (filters[:Ns], filters[Ns:],
                enc_opt[:, :Ns], enc_opt[:, Ns:])

    def __call__(self, train_feat, test_feat, train_label, train_ltrb=None,
                 train: bool = False):
        return self.predict_filter(train_feat, test_feat, train_label, train_ltrb,
                                   train=train)
