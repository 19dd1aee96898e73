"""DETR-style transformer (encoder-decoder) used by ToMP/TaMOs.

Re-design of reference `ltr/models/transformer/transformer.py` (Transformer:66,
TransformerEncoder:99, TransformerDecoder:118, post-norm layers :150-230): positional
embeddings are ADDED TO Q/K ONLY (values stay position-free), the decoder queries are
learned embeddings with zero-initialized targets. Batch-first (B, L, C) layout.

TPU-first: the layer stacks are `nn.scan`s — one layer is traced/compiled once and
iterated with stacked parameters (layer axis 0). This shrinks the XLA program by ~N
layers (essential: the tracker's full step must fit the compile service's program-size
limits) and cuts compile time, with identical math to the unrolled loop.

Mixed precision: `dtype=jnp.bfloat16` runs every matmul (QKV/out projections,
attention, feedforward) in bf16 on the MXU while parameters stay f32, softmax is
forced to f32, and LayerNorms compute in f32 — the standard TPU inference recipe.
Activations at layer boundaries stay f32 (the bf16 matmul outputs are promoted by
the f32 residual adds), so the numerics drift only inside each sub-block.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _flash_attention_fn(query, key, value, mask=None, dropout_rng=None,
                        dropout_rate=0.0, broadcast_dropout=True,
                        deterministic=True, dtype=None, precision=None,
                        force_fp32_for_softmax=True):
    """Drop-in `attention_fn` for flax MultiHeadDotProductAttention that routes
    long self-attention through the Pallas TPU flash-attention kernel.

    Why: the encoder's L≈1000-2600 token self-attention materializes the
    (B·H, L, L) attention matrix in HBM (e.g. ToMP-50: 60 MB/layer f32) — the
    dominant single-stream HBM traffic. The fused kernel streams K/V blocks
    through VMEM and never writes the matrix out.

    Routing: flash only on the TPU backend, at inference (attention-dropout off),
    for self-attention with L ≥ 256; everything else (decoder queries of length
    1, CPU tests, training with dropout) takes the standard XLA path. The
    key-padding mask becomes flash segment ids: valid keys get segment 1, masked
    keys 2, pad rows 0 — every real query keeps segment 1, so it attends exactly
    the valid keys (the reference's src_key_padding_mask semantics).

    MEASURED (v5e, ToMP-50 single stream, B=2 H=8 L=1024 D=64): flash is 2.2x
    SLOWER than XLA's fused attention (4.5 vs 2.06 ms/frame, outputs matching at
    corr 0.9985 / identical boxes) — at these tiny batch·head grids the kernel
    underfills the chip while XLA already keeps the (L, L) matrix in a fused
    softmax. OPT-IN via PYTRACKING_TPU_FLASH_ATTENTION=1 for long-sequence
    regimes; default off."""
    B, Lq, H, D = query.shape
    Lk = key.shape[1]
    # the backend check alone is not enough: variable init runs under a
    # `jax.default_device(cpu)` context even when the backend is TPU, and the
    # Pallas kernel only exists for TPU placement
    dd = jax.config.jax_default_device
    cpu_ctx = dd is not None and getattr(dd, "platform", None) == "cpu"
    on_tpu_inference = (jax.default_backend() == "tpu" and not cpu_ctx
                        and deterministic and Lq == Lk and Lq >= 256)

    # Our own fused kernel (ops/pallas_mha.py, D-on-sublanes layout, exact
    # blocked softmax, logits never leave VMEM). PYTRACKING_TPU_FUSED_MHA:
    # "1" always (also f32 — introduces bf16-matmul-level drift vs XLA f32),
    # "0" never, default AUTO = bf16 compute only, where the numerics are
    # indistinguishable from XLA's bf16 attention (measured max |Δ| 3.4e-3 at
    # L=2592 on v5e — same order as the XLA-bf16-vs-f32 drift the accuracy
    # gates in tests/test_bf16_harness_gate.py already cover) and the win is
    # the (B·H, L, L) logits HBM round-trip.
    fused_env = os.environ.get("PYTRACKING_TPU_FUSED_MHA", "auto")
    want_fused = (fused_env == "1" or
                  (fused_env not in ("0", "false") and dtype == jnp.bfloat16))
    if on_tpu_inference and want_fused and D <= 32:
        from pytracking_tpu.ops.pallas_mha import fused_self_attention
        keep = mask[:, 0, 0, :] if mask is not None else None
        q, k, v = (x.astype(dtype) if dtype is not None else x
                   for x in (query, key, value))
        return fused_self_attention(q, k, v, key_keep_mask=keep)

    use_flash = (on_tpu_inference
                 and os.environ.get("PYTRACKING_TPU_FLASH_ATTENTION", "0") == "1")
    if not use_flash:
        return nn.dot_product_attention(
            query, key, value, mask=mask, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, broadcast_dropout=broadcast_dropout,
            deterministic=deterministic, dtype=dtype, precision=precision,
            force_fp32_for_softmax=force_fp32_for_softmax)

    from jax.experimental.pallas.ops.tpu.flash_attention import (SegmentIds,
                                                                 flash_attention)

    L = Lq
    Lp = -(-L // 128) * 128                                # pad to lane multiples
    pad = Lp - L

    def to_bhld(x):
        x = jnp.swapaxes(x, 1, 2)                          # (B, H, L, D)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    q, k, v = to_bhld(query), to_bhld(key), to_bhld(value)

    seg_valid = jnp.ones((B, L), jnp.int32)
    if mask is not None:
        keep = mask[:, 0, 0, :]                            # (B, Lk) True = keep
        seg_kv = jnp.where(keep, 1, 2).astype(jnp.int32)
    else:
        seg_kv = seg_valid
    seg_q = jnp.pad(seg_valid, ((0, 0), (0, pad)))         # pad rows -> segment 0
    seg_kv = jnp.pad(seg_kv, ((0, 0), (0, pad)))
    out = flash_attention(q, k, v, segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
                          sm_scale=float(D) ** -0.5)
    return jnp.swapaxes(out[:, :, :L], 1, 2)               # (B, L, H, D)


class _MHA(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, train: bool = False):
        """q/k/v (B, L, C); key_padding_mask (B, Lk) True = masked."""
        mask = None
        if key_padding_mask is not None:
            mask = ~key_padding_mask[:, None, None, :]        # (B, 1, 1, Lk)
        return nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train,
            dtype=self.dtype, force_fp32_for_softmax=True,
            attention_fn=_flash_attention_fn)(
                inputs_q=q, inputs_k=k, inputs_v=v, mask=mask)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, train: bool = False):
        q = k = src + pos
        src2 = _MHA(self.d_model, self.nhead, self.dropout, self.dtype)(
            q, k, src, key_padding_mask, train=train)
        src = nn.LayerNorm(dtype=jnp.float32)(
            src + nn.Dropout(self.dropout, deterministic=not train)(src2))
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype)(src)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(ff)
        src = nn.LayerNorm(dtype=jnp.float32)(
            src + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return src


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, memory_key_padding_mask=None,
                 train: bool = False):
        q = k = tgt + query_pos
        tgt2 = _MHA(self.d_model, self.nhead, self.dropout, self.dtype)(
            q, k, tgt, train=train)
        tgt = nn.LayerNorm(dtype=jnp.float32)(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(tgt2))
        tgt2 = _MHA(self.d_model, self.nhead, self.dropout, self.dtype)(
            tgt + query_pos, memory + pos, memory, memory_key_padding_mask,
            train=train)
        tgt = nn.LayerNorm(dtype=jnp.float32)(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(tgt2))
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype)(tgt)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(ff)
        tgt = nn.LayerNorm(dtype=jnp.float32)(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return tgt


class _ScannedEncLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, pos, key_padding_mask, train):
        out = TransformerEncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                                      self.dropout, self.dtype, name="layer")(
            carry, pos, key_padding_mask, train=train)
        return out, None


class _ScannedDecLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, memory, pos, query_pos, key_padding_mask, train):
        out = TransformerDecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                                      self.dropout, self.dtype, name="layer")(
            carry, memory, pos, query_pos, key_padding_mask, train=train)
        return out, None


class Transformer(nn.Module):
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

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
                            self.dropout, self.dtype, name="encoder")(
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
                         self.dtype, name="decoder")(
            tgt, memory, pos, query_pos, key_padding_mask, train)
        tgt = nn.LayerNorm(name="dec_norm")(tgt)
        return tgt, memory
