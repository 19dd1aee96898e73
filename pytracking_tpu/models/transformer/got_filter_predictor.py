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

    def __call__(self, train_feat, test_feat, train_label, train_ltrb=None,
                 train: bool = False):
        return self.predict_filter(train_feat, test_feat, train_label, train_ltrb,
                                   train=train)
