"""Probabilistic (KL) regression losses for PrDiMP.

Re-design of reference `ltr/models/loss/kl_regression.py`:
  KLRegression (:7)       -> `kl_regression`
  MLRegression (:30)      -> `ml_regression`
  KLRegressionGrid (:55)  -> `kl_regression_grid`
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_regression(scores: jnp.ndarray, sample_density: jnp.ndarray,
                  gt_density: jnp.ndarray, mc_dim: int = -1,
                  eps: float = 0.0) -> jnp.ndarray:
    """KL divergence between a Gibbs distribution exp(s)/Z and the ground-truth
    density, estimated with Monte-Carlo samples drawn from `sample_density`
    (reference kl_regression.py:7-27). The first sample along mc_dim is the GT."""
    exp_val = scores - jnp.log(sample_density + eps)
    n = scores.shape[mc_dim]
    L = jax.nn.logsumexp(exp_val, axis=mc_dim) - jnp.log(jnp.asarray(n, jnp.float32)) \
        - jnp.mean(scores * (gt_density / (sample_density + eps)), axis=mc_dim)
    return L.mean()


def ml_regression(scores: jnp.ndarray, sample_density: jnp.ndarray,
                  gt_density=None, mc_dim: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """Negative log-likelihood with importance-sampled normalizer (reference
    kl_regression.py:30-52). Sample 0 along mc_dim is the ground truth."""
    assert mc_dim in (1, -1)
    if mc_dim == -1:
        mc_dim = scores.ndim - 1
    n = scores.shape[mc_dim] - 1
    exp_val = scores - jnp.log(sample_density + eps)
    rest = jax.lax.slice_in_dim(exp_val, 1, scores.shape[mc_dim], axis=mc_dim)
    norm = jax.nn.logsumexp(rest, axis=mc_dim) - jnp.log(jnp.asarray(n, jnp.float32))
    gt_score = jax.lax.index_in_dim(scores, 0, axis=mc_dim, keepdims=False)
    return (norm - gt_score).mean()


def kl_regression_grid(scores: jnp.ndarray, gt_density: jnp.ndarray,
                       grid_dim=(-2, -1), grid_scale: float = 1.0) -> jnp.ndarray:
    """KL divergence on a uniform grid (reference kl_regression.py:55-71)."""
    score_corr = grid_scale * jnp.sum(scores * gt_density, axis=grid_dim)
    L = jax.nn.logsumexp(scores.reshape(scores.shape[:-2] + (-1,)), axis=-1) + \
        jnp.log(grid_scale) - score_corr
    return L.mean()
