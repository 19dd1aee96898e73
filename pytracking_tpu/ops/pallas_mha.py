"""Fused multi-head self-attention Pallas TPU kernel for small head dims.

Why this exists: the ToMP/TaMOs transformer encoder (reference
`ltr/models/transformer/transformer.py:99`,
`ltr/models/transformer/filter_predictor.py:153`) runs self-attention over
L ≈ 1000–2600 tokens with head_dim = 32. XLA's unfused path materializes the
(B·H, L, L) attention matrix in HBM (~430 MB/layer f32 for TaMOs), and the
stock `jax.experimental.pallas.ops.tpu.flash_attention` kernel pads the
32-lane head dim to the 128-lane tile (4× wasted VMEM/MXU per block) and
computes in f32 — measured SLOWER than XLA at these shapes (MODEL_ZOO.md).

This kernel instead keeps the head dim on the SUBLANE axis and the token
axis on the 128-lane axis — Q/K/V live as (B·H, D, L) with D = 32 ≤ the
32-sublane tile, so nothing pads:

  logits (blk_q, L)  = dot(QTᵀ blk, KT)     contraction over D (sublanes)
  outᵀ   (D, blk_q)  = dot(VT, Pᵀ)          contraction over L (lanes)

K/V for one (batch·head) are only (32, L) ≈ 172 KB bf16 — the ENTIRE key
space fits in VMEM, so the kernel does an exact blocked softmax (true row
max over the full row, no online rescaling) and never writes logits to HBM.
Grid = (B·H, L/blk_q); K/V block indices are constant along the q axis, so
Mosaic's pipeline fetches them once per (batch·head).

Numerics: matmuls accumulate f32 (`preferred_element_type`), softmax in f32,
probabilities cast to the input dtype for the AV matmul — identical recipe
to the XLA bf16 attention path the accuracy gates cover
(tests/test_bf16_harness_gate.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _mha_kernel(qt_ref, kt_ref, vt_ref, bias_ref, ot_ref, *, sm_scale: float):
    """One (batch·head, q-block) step.

    qt_ref   (1, D, blk_q)  query block, D on sublanes
    kt_ref   (1, D, L)      full keys for this batch·head
    vt_ref   (1, D, L)      full values
    bias_ref (1, 1, L)      additive key bias (0 valid / -inf masked+padded)
    ot_ref   (1, D, blk_q)  output block (same layout as qt)
    """
    qt = qt_ref[0]                                   # (D, blk_q)
    kt = kt_ref[0]                                   # (D, L)
    vt = vt_ref[0]                                   # (D, L)

    # logits (blk_q, L): contract the sublane D axis of both operands
    s = jax.lax.dot_general(
        qt, kt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (blk_q, L)
    s = s * sm_scale + bias_ref[0]                   # (1, L) broadcasts over rows

    # exact softmax over the full row (whole L is resident)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = p / denom
    p = p.astype(vt.dtype)

    # outᵀ (D, blk_q) = VT (D, L) · Pᵀ (L, blk_q): contract the lane L axis
    ot = jax.lax.dot_general(
        vt, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (D, blk_q)
    ot_ref[0] = ot.astype(ot_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "interpret"))
def _mha_dt_layout(qt, kt, vt, bias, *, sm_scale: float, block_q: int,
                   interpret: bool):
    """(BH, D, Lp) inputs, (BH, 1, Lp) additive bias -> (BH, D, Lp)."""
    BH, D, Lp = qt.shape
    nq = Lp // block_q
    return pl.pallas_call(
        functools.partial(_mha_kernel, sm_scale=sm_scale),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, D, block_q), lambda bh, qi: (bh, 0, qi)),
            pl.BlockSpec((1, D, Lp), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, D, Lp), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, 1, Lp), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, block_q), lambda bh, qi: (bh, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((BH, D, Lp), qt.dtype),
        interpret=interpret,
    )(qt, kt, vt, bias)


def fused_self_attention(query: jax.Array, key: jax.Array, value: jax.Array,
                         key_keep_mask: Optional[jax.Array] = None,
                         sm_scale: Optional[float] = None,
                         block_q: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Fused self-attention for (B, L, H, D) tensors with small D.

    query/key/value: (B, L, H, D), same L (self-attention). D ≤ 32 is the
    design point (it rides the sublane axis); any D works but D > 128 loses
    the layout advantage.
    key_keep_mask: optional (B, L) bool, True = key is attendable (the
    inverse of torch's src_key_padding_mask).
    Returns (B, L, H, D) in the input dtype.
    """
    B, L, H, D = query.shape
    if key.shape != query.shape or value.shape != query.shape:
        raise ValueError("fused_self_attention is self-attention only "
                         f"(got q {query.shape}, k {key.shape})")
    if sm_scale is None:
        sm_scale = float(D) ** -0.5

    Lp = -(-L // 128) * 128
    # block_q must be a lane-aligned (multiple-of-128) exact divisor of Lp:
    # pick the largest one not exceeding the request
    block_q = max(k * 128 for k in range(1, Lp // 128 + 1)
                  if (Lp // 128) % k == 0 and k * 128 <= max(block_q, 128))
    pad = Lp - L

    def to_dt(x):                          # (B, L, H, D) -> (B·H, D, Lp)
        x = jnp.transpose(x, (0, 2, 3, 1))            # (B, H, D, L)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return x.reshape(B * H, D, Lp)

    qt, kt, vt = to_dt(query), to_dt(key), to_dt(value)

    if key_keep_mask is None:
        bias = jnp.zeros((B, L), jnp.float32)
    else:
        bias = jnp.where(key_keep_mask, 0.0, _NEG_INF).astype(jnp.float32)
    bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=_NEG_INF)
    bias = jnp.broadcast_to(bias[:, None], (B, H, Lp)).reshape(B * H, 1, Lp)

    ot = _mha_dt_layout(qt, kt, vt, bias, sm_scale=sm_scale,
                        block_q=block_q, interpret=interpret)
    out = ot.reshape(B, H, D, Lp)[..., :L]            # (B, H, D, L)
    return jnp.transpose(out, (0, 3, 1, 2))           # (B, L, H, D)
