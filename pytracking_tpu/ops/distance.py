"""Distance-to-center maps, binned with linear interpolation.

Re-design of reference `ltr/models/layers/distance.py` (`DistanceMap:6`) — used by DiMP's
learned label/mask/weight predictors inside the steepest-descent optimizer
(`ltr/models/target_classifier/optimizer.py:57-79`). Functional, NHWC (bins last).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def distance_map(center: jnp.ndarray, output_sz: Tuple[int, int],
                 num_bins: int, bin_displacement: float = 1.0) -> jnp.ndarray:
    """Bin the distance of every pixel to `center` into `num_bins` channels with linear
    interpolation; the last bin saturates (clamp(1 + bin_diff, 0, 1)) so distances beyond
    the bin grid stay fully assigned to it (reference distance.py:17-39).

    Args:
      center: (B, 2) (y, x) continuous center positions.
      output_sz: static (H, W).

    Returns (B, H, W, num_bins) float32.
    """
    H, W = output_sz
    center = jnp.asarray(center, jnp.float32).reshape(-1, 2)
    k0 = jnp.arange(H, dtype=jnp.float32)
    k1 = jnp.arange(W, dtype=jnp.float32)
    d0 = k0[None, :, None] - center[:, 0][:, None, None]
    d1 = k1[None, None, :] - center[:, 1][:, None, None]
    dist = jnp.sqrt(d0 * d0 + d1 * d1)  # (B, H, W)
    bin_centers = jnp.arange(num_bins, dtype=jnp.float32)
    bin_diff = dist[..., None] / bin_displacement - bin_centers  # (B, H, W, num_bins)
    inner = jnp.maximum(1.0 - jnp.abs(bin_diff[..., :-1]), 0.0)
    last = jnp.clip(1.0 + bin_diff[..., -1:], 0.0, 1.0)
    return jnp.concatenate([inner, last], axis=-1)
