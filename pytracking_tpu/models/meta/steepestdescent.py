"""Generic unrolled Gauss-Newton steepest descent for meta-learning.

Re-design of reference `ltr/models/meta/steepestdescent.py` (GNSteepestDescent:8):
given a residual module r(x), each iteration computes g = Jᵀr (vjp), h = Jg (jvp), a
per-sequence optimal step α = ‖g‖²/‖h‖², and x ← x − α·g. The reference realizes the
Jacobian products with `torch.autograd.grad(create_graph=True)` (:60-90); here they are
`jax.vjp`/`jax.jvp` and the loop is a `lax.scan` — one fused XLA computation,
differentiable end-to-end for training.

Used by LWL / RTS (residual modules in models/lwl/) and DiMP-simple
(target_classifier residual modules).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def _batch_sqr_norm(tree: Pytree, batch_dim_of: Callable[[jnp.ndarray], int],
                    num_batch: int) -> jnp.ndarray:
    """Sum of squares per batch element: each leaf is reduced over all dims except its
    batch dim (reference steepestdescent.py:23-26)."""
    total = jnp.zeros((num_batch,))
    for leaf in jax.tree_util.tree_leaves(tree):
        bd = batch_dim_of(leaf)
        axes = tuple(d for d in range(leaf.ndim) if d != bd)
        total = total + jnp.sum(leaf * leaf, axis=axes)
    return total


def gn_steepest_descent(residual_fn: Callable[[Pytree], Pytree],
                        x0: jnp.ndarray,
                        num_iter: int,
                        residual_batch_dim: int = 1,
                        steplength_reg: float = 0.0,
                        compute_losses: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the unrolled optimizer on a single-array variable x (batch dim 0 = the
    sequence axis). residual_fn returns a pytree of residual arrays whose
    `residual_batch_dim` is the sequence axis.

    Returns (x_final, iterates (num_iter, *x.shape), losses (num_iter+1,) or (0,))."""
    S = x0.shape[0]

    def loss_of(x):
        r = residual_fn(x)
        total = sum(jnp.sum(l * l) for l in jax.tree_util.tree_leaves(r))
        count = sum(l.size for l in jax.tree_util.tree_leaves(r))
        return total / count

    def step(x, _):
        r, vjp_fn = jax.vjp(residual_fn, x)
        g = vjp_fn(r)[0]
        _, h = jax.jvp(residual_fn, (x,), (g,))

        ip_gg = _batch_sqr_norm(g, lambda l: 0, S)
        ip_hh = _batch_sqr_norm(h, lambda l: residual_batch_dim, S)
        alpha = ip_gg / jnp.clip(ip_hh + steplength_reg * ip_gg, 1e-8, None)
        shape = (-1,) + (1,) * (x.ndim - 1)
        x_new = x - alpha.reshape(shape) * g
        loss = loss_of(x) if compute_losses else jnp.asarray(0.0)
        return x_new, (x_new, loss)

    x, (iters, losses) = jax.lax.scan(step, x0, None, length=num_iter)
    if compute_losses:
        losses = jnp.concatenate([losses, loss_of(x)[None]])
    else:
        losses = jnp.zeros((0,))
    return x, iters, losses
