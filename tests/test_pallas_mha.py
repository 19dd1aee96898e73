"""Fused Pallas self-attention kernel (ops/pallas_mha.py) vs flax's reference
attention — interpret mode on CPU, exact same math XLA's path computes.

The kernel is the opt-in TPU fast path for the ToMP/TaMOs transformer
encoder (reference `ltr/models/transformer/transformer.py:99`): head_dim=32
rides the sublane axis, the full key space stays in VMEM, logits never touch
HBM. These tests pin the numerics (f32 ~1e-6, bf16 ~1e-2 vs the f32 oracle),
mask semantics (key-padding), and the lane-padding/odd-L handling."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytracking_tpu.ops.pallas_mha import fused_self_attention


def _ref(q, k, v, keep):
    mask = None if keep is None else keep[:, None, None, :]
    return nn.dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        mask=mask, force_fp32_for_softmax=True)


@pytest.mark.parametrize("B,L,H,D,masked", [
    (2, 300, 8, 32, True),     # odd L -> lane padding + padded-key masking
    (2, 256, 8, 32, False),    # exact lane multiple, no mask
    (1, 128, 4, 32, True),     # single q block
    (2, 640, 2, 16, True),     # D=16 still rides sublanes
])
def test_fused_mha_matches_reference_f32(B, L, H, D, masked):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    keep = jnp.asarray(rng.rand(B, L) > 0.3) if masked else None
    out = fused_self_attention(q, k, v, key_keep_mask=keep, interpret=True)
    ref = _ref(q, k, v, keep)
    assert out.dtype == q.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_fused_mha_bf16_close_to_f32_oracle():
    rng = np.random.RandomState(1)
    B, L, H, D = 2, 384, 8, 32
    q32 = rng.randn(B, L, H, D).astype(np.float32)
    k32 = rng.randn(B, L, H, D).astype(np.float32)
    v32 = rng.randn(B, L, H, D).astype(np.float32)
    keep = jnp.asarray(rng.rand(B, L) > 0.2)
    out = fused_self_attention(jnp.asarray(q32, jnp.bfloat16),
                               jnp.asarray(k32, jnp.bfloat16),
                               jnp.asarray(v32, jnp.bfloat16),
                               key_keep_mask=keep, interpret=True)
    ref = _ref(jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32), keep)
    assert out.dtype == jnp.bfloat16
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref)))
    assert err < 0.05, f"bf16 kernel drifted {err} from the f32 oracle"


def test_fused_mha_fully_masked_batch_entry_is_finite():
    """A batch entry whose keys are ALL masked must not NaN (softmax of an
    all -inf row) — the wrapper's -1e30 bias keeps exp() finite."""
    rng = np.random.RandomState(2)
    B, L, H, D = 2, 128, 4, 32
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    keep = jnp.asarray(np.stack([np.zeros(L, bool), np.ones(L, bool)]))
    out = fused_self_attention(q, q, q, key_keep_mask=keep, interpret=True)
    assert bool(jnp.isfinite(out).all())


def test_fused_mha_block_q_invariance():
    """Different q block sizes tile the same computation — results identical."""
    rng = np.random.RandomState(3)
    B, L, H, D = 1, 384, 4, 32
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    outs = [fused_self_attention(q, k, v, block_q=bq, interpret=True)
            for bq in (128, 384)]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               rtol=1e-6, atol=1e-6)


def test_fused_mha_rejects_cross_attention():
    q = jnp.zeros((1, 128, 4, 32))
    k = jnp.zeros((1, 256, 4, 32))
    with pytest.raises(ValueError):
        fused_self_attention(q, k, k, interpret=True)
