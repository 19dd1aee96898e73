"""DETR-style transformer (encoder-decoder) used by ToMP/TaMOs.

Re-design of reference `ltr/models/transformer/transformer.py` (Transformer:66,
TransformerEncoder:99, TransformerDecoder:118, post-norm layers :150-230): positional
embeddings are ADDED TO Q/K ONLY (values stay position-free), the decoder queries are
learned embeddings with zero-initialized targets. Batch-first (B, L, C) layout.

TPU-first: the layer stacks are `nn.scan`s — one layer is traced/compiled once and
iterated with stacked parameters (layer axis 0). This shrinks the XLA program by ~N
layers (essential: the tracker's full step must fit the compile service's program-size
limits) and cuts compile time, with identical math to the unrolled loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class _MHA(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, train: bool = False):
        """q/k/v (B, L, C); key_padding_mask (B, Lk) True = masked."""
        mask = None
        if key_padding_mask is not None:
            mask = ~key_padding_mask[:, None, None, :]        # (B, 1, 1, Lk)
        return nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train)(
                inputs_q=q, inputs_k=k, inputs_v=v, mask=mask)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, train: bool = False):
        q = k = src + pos
        src2 = _MHA(self.d_model, self.nhead, self.dropout)(
            q, k, src, key_padding_mask, train=train)
        src = nn.LayerNorm()(src + nn.Dropout(self.dropout,
                                              deterministic=not train)(src2))
        ff = nn.Dense(self.dim_feedforward)(src)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model)(ff)
        src = nn.LayerNorm()(src + nn.Dropout(self.dropout,
                                              deterministic=not train)(ff))
        return src


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, memory_key_padding_mask=None,
                 train: bool = False):
        q = k = tgt + query_pos
        tgt2 = _MHA(self.d_model, self.nhead, self.dropout)(q, k, tgt, train=train)
        tgt = nn.LayerNorm()(tgt + nn.Dropout(self.dropout,
                                              deterministic=not train)(tgt2))
        tgt2 = _MHA(self.d_model, self.nhead, self.dropout)(
            tgt + query_pos, memory + pos, memory, memory_key_padding_mask,
            train=train)
        tgt = nn.LayerNorm()(tgt + nn.Dropout(self.dropout,
                                              deterministic=not train)(tgt2))
        ff = nn.Dense(self.dim_feedforward)(tgt)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model)(ff)
        tgt = nn.LayerNorm()(tgt + nn.Dropout(self.dropout,
                                              deterministic=not train)(ff))
        return tgt


class _ScannedEncLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, carry, pos, key_padding_mask, train):
        out = TransformerEncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                                      self.dropout, name="layer")(
            carry, pos, key_padding_mask, train=train)
        return out, None


class _ScannedDecLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, carry, memory, pos, query_pos, key_padding_mask, train):
        out = TransformerDecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                                      self.dropout, name="layer")(
            carry, memory, pos, query_pos, key_padding_mask, train=train)
        return out, None


class Transformer(nn.Module):
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, query_embed, pos, key_padding_mask=None,
                 train: bool = False):
        """src (B, L, C); query_embed (Q, C); pos (B, L, C);
        key_padding_mask (B, L) True = ignore.

        Returns (decoder output (B, Q, C), encoder memory (B, L, C))."""
        EncScan = nn.scan(_ScannedEncLayer,
                          variable_axes={"params": 0, "batch_stats": 0},
                          split_rngs={"params": True, "dropout": True},
                          in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                          length=self.num_encoder_layers)
        memory, _ = EncScan(self.d_model, self.nhead, self.dim_feedforward,
                            self.dropout, name="encoder")(
            src, pos, key_padding_mask, train)

        B = src.shape[0]
        Q = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, self.d_model))
        tgt = jnp.zeros((B, Q, self.d_model), src.dtype)
        DecScan = nn.scan(_ScannedDecLayer,
                          variable_axes={"params": 0, "batch_stats": 0},
                          split_rngs={"params": True, "dropout": True},
                          in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                                   nn.broadcast, nn.broadcast),
                          length=self.num_decoder_layers)
        tgt, _ = DecScan(self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                         name="decoder")(
            tgt, memory, pos, query_pos, key_padding_mask, train)
        tgt = nn.LayerNorm(name="dec_norm")(tgt)
        return tgt, memory
