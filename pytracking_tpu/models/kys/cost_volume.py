"""Dense cost volume for scene propagation (KYS).

Re-design of reference `ltr/models/kys/cost_volume.py` (CostVolume:8 over the CUDA
`spatial_correlation_sampler` + remap_cost_volume:29). TPU-first: the local correlation
+ absolute remap is ONE batched einsum over all position pairs — a (HW, C) × (C, HW)
matmul per sequence that runs on the MXU — followed by a static displacement-window
mask (positions farther than max_displacement are zero, exactly like the remapped CUDA
output).
"""

from __future__ import annotations

import jax.numpy as jnp


def cost_volume_abs(feat_ref: jnp.ndarray, feat_prev: jnp.ndarray,
                    max_displacement: int) -> jnp.ndarray:
    """feat_ref/feat_prev: (B, H, W, C). Returns (B, H*W, H, W): entry
    [b, p*W+q, i, j] = <feat_ref[b,i,j], feat_prev[b,p,q]> if |p−i|,|q−j| ≤ md else 0
    (matching CostVolume(abs_coordinate_output=True) with feat1=ref)."""
    B, H, W, C = feat_ref.shape
    cv = jnp.einsum("bijc,bpqc->bpqij", feat_ref, feat_prev,
                    preferred_element_type=jnp.float32) / C
    ii = jnp.arange(H)
    jj = jnp.arange(W)
    mask_p = jnp.abs(ii[:, None] - ii[None, :]) <= max_displacement  # (p, i)
    mask_q = jnp.abs(jj[:, None] - jj[None, :]) <= max_displacement  # (q, j)
    mask = mask_p[None, :, None, :, None] & mask_q[None, None, :, None, :]
    cv = jnp.where(mask, cv, 0.0)
    return cv.reshape(B, H * W, H, W)
