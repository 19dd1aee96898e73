"""Per-sample filter application — the core op of discriminative trackers.

TPU-native re-design of reference `ltr/models/layers/filter.py`:
  apply_filter (:5-34)          -> `apply_filter` — each batch sample gets its own filter
  apply_feat_transpose (:91-200)-> `apply_feat_transpose` — gradient-of-conv, via vjp
  filter_gradient (:203-220)    -> `filter_gradient`

Layout is NHWC (TPU-native). The reference implements the per-sample grouped conv with
`groups=num_sequences` reshape tricks; here we vmap a single-sample conv over the batch —
XLA fuses this into one batched convolution that tiles onto the MXU.

Shapes:
  feat:   (B, H, W, C)
  filt:   (B, fh, fw, C, K)   K output channels (K=1 for DiMP target scores)
  scores: (B, H, W, K)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def apply_filter(feat: jnp.ndarray, filt: jnp.ndarray, mode: str = "dimp",
                 impl: str = "conv") -> jnp.ndarray:
    """Cross-correlate each sample with its own filter.

    mode='dimp' (reference layers/filter.py:5-34): pad filter_sz//2 on BOTH sides —
    output is H+1 for even filters (centered score grid) and H for odd ones; the DiMP
    tracker's displacement math depends on this convention (dimp.py:232,243).

    mode='same' (reference libs/operation.py:17-21, used by ATOM/ECO): same padding but
    the trailing row/col is dropped for even filters — output is always H×W.
    """
    fh, fw = filt.shape[1], filt.shape[2]
    ph, pw = fh // 2, fw // 2

    if impl == "taps":
        # Tap-wise batched matmuls instead of a vmapped per-sample conv: each
        # of the fh*fw taps is one (B, Ho*Wo, C) x (B, C, K) einsum. The
        # vmap-of-conv lowering folds the sample axis into feature groups,
        # which breaks XLA's SPMD partitioner when the sample axis is sharded
        # over a mesh (the per-shard grouped conv keeps the full
        # feature_group_count against divided channels) — so the mesh-sharded
        # train steps (ToMP/TaMOs heads) use this form. The conv form stays the
        # default: it is ~50x faster in DiMP's unrolled-optimizer inner loop,
        # where XLA fuses the taps into one conv kernel.
        B, H, W, C = feat.shape
        featp = jnp.pad(feat, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        Ho = H + 2 * ph - fh + 1
        Wo = W + 2 * pw - fw + 1
        out = None
        for dy in range(fh):
            for dx in range(fw):
                t = jnp.einsum("bijc,bck->bijk",
                               featp[:, dy:dy + Ho, dx:dx + Wo, :],
                               filt[:, dy, dx],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
    else:
        pad = [(ph, ph), (pw, pw)]

        def one(f, w):
            return lax.conv_general_dilated(
                f[None], w, window_strides=(1, 1), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)[0]

        out = jax.vmap(one)(feat, filt)
    if mode == "same":
        if fh % 2 == 0:
            out = out[:, :-1]
        if fw % 2 == 0:
            out = out[:, :, :-1]
    return out


def apply_feat_transpose(feat: jnp.ndarray, activations: jnp.ndarray,
                         filter_shape) -> jnp.ndarray:
    """∂/∂filter of <apply_filter(feat, filter), activations> — i.e. the correlation of
    features with activations, producing a filter-shaped output. This is the reference's
    `apply_feat_transpose` (layers/filter.py:91-200, four hand-written conv-transpose
    variants); here it is *defined* as the VJP of `apply_filter`, so it is exact by
    construction and XLA picks the best conv algorithm."""
    fh, fw = int(filter_shape[0]), int(filter_shape[1])
    B, _, _, C = feat.shape
    K = activations.shape[-1]
    zero_filt = jnp.zeros((B, fh, fw, C, K), feat.dtype)
    _, vjp = jax.vjp(lambda w: apply_filter(feat, w), zero_filt)
    return vjp(activations)[0]


def filter_gradient(feat: jnp.ndarray, filt: jnp.ndarray,
                    label: jnp.ndarray | None = None,
                    training: bool = False) -> jnp.ndarray:
    """Gradient of the L2 classification loss w.r.t. the filter
    (reference layers/filter.py:203-220)."""
    residuals = apply_filter(feat, filt)
    if label is not None:
        residuals = residuals - label
    return apply_feat_transpose(feat, residuals, filt.shape[1:3])
