"""Dense cost volume for scene propagation (KYS).

Re-design of reference `ltr/models/kys/cost_volume.py` (CostVolume:8 over the CUDA
`spatial_correlation_sampler` + remap_cost_volume:29). TPU-first: the local correlation
+ absolute remap is ONE batched einsum over all position pairs — a (HW, C) × (C, HW)
matmul per sequence that runs on the MXU — followed by a static displacement-window
mask (positions farther than max_displacement are zero, exactly like the remapped CUDA
output). The sampler's kernel window (cv_kernel_size=3 in kysnet_res50, reference
kysnet.py:120) is a diagonal box-sum of the einsum result — 8 shifted adds, no extra
matmuls.

Convention: matches `SpatialCorrelationSampler(kernel_size, 2*md+1, stride=1,
padding=(kernel_size-1)/2)` — a RAW sum of products over channels and the kernel
window, no normalization.
"""

from __future__ import annotations

import jax.numpy as jnp


def cost_volume_abs(feat_ref: jnp.ndarray, feat_prev: jnp.ndarray,
                    max_displacement: int, kernel_size: int = 1) -> jnp.ndarray:
    """feat_ref/feat_prev: (B, H, W, C). Returns (B, H*W, H, W): entry
    [b, p*W+q, i, j] = Σ_{u,v ∈ kernel} <feat_ref[b,i+u,j+v], feat_prev[b,p+u,q+v]>
    if |p−i|,|q−j| ≤ md else 0 (matching CostVolume(abs_coordinate_output=True) with
    feat1=ref; zero-padded at the borders like the sampler's `padding`)."""
    B, H, W, C = feat_ref.shape
    cv = jnp.einsum("bijc,bpqc->bpqij", feat_ref, feat_prev,
                    preferred_element_type=jnp.float32)
    if kernel_size > 1:
        r = kernel_size // 2
        pad = ((0, 0), (r, r), (r, r), (r, r), (r, r))
        cvp = jnp.pad(cv, pad)
        cv = sum(cvp[:, r + u:r + u + H, r + v:r + v + W,
                     r + u:r + u + H, r + v:r + v + W]
                 for u in range(-r, r + 1) for v in range(-r, r + 1))
    ii = jnp.arange(H)
    jj = jnp.arange(W)
    mask_p = jnp.abs(ii[:, None] - ii[None, :]) <= max_displacement  # (p, i)
    mask_q = jnp.abs(jj[:, None] - jj[None, :]) <= max_displacement  # (q, j)
    mask = mask_p[None, :, None, :, None] & mask_q[None, None, :, None, :]
    cv = jnp.where(mask, cv, 0.0)
    return cv.reshape(B, H * W, H, W)
