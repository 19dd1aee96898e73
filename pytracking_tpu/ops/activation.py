"""Activations with analytic derivatives used inside unrolled optimizers.

Re-design of reference `ltr/models/layers/activation.py`. The reference carries explicit
derivative modules because its unrolled optimizers need them in the forward graph
(`DiMPSteepestDescentGN`, optimizer.py:132-163); we keep the same explicit forms (they
appear inside jitted solver iterations) — autodiff through them then gives the correct
second-order terms for training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_reg(x: jnp.ndarray, axis: int, reg=None) -> jnp.ndarray:
    """Softmax with an optional constant regularization logit appended to the
    denominator (reference activation.py:7-16). Used by PrDiMP localization."""
    if reg is None:
        return jax.nn.softmax(x, axis=axis)
    axis = axis % x.ndim
    reg_shape = tuple(1 if d == axis else x.shape[d] for d in range(x.ndim))
    xs = jnp.concatenate([x, jnp.broadcast_to(jnp.asarray(reg, x.dtype), reg_shape)], axis=axis)
    out = jax.nn.softmax(xs, axis=axis)
    return jax.lax.slice_in_dim(out, 0, x.shape[axis], axis=axis)


def mlu(x: jnp.ndarray, min_val: float) -> jnp.ndarray:
    """MLU activation: elu(leaky_relu(x, 1/min_val), min_val)
    (reference activation.py:20-29)."""
    y = jnp.where(x >= 0, x, x / min_val)
    return jnp.where(y >= 0, y, min_val * (jnp.exp(y) - 1.0))


def leaky_relu_par(x: jnp.ndarray, a) -> jnp.ndarray:
    """Parametric leaky ReLU: (1−a)/2·|x| + (1+a)/2·x (reference activation.py:32-37).
    Differentiable w.r.t. both x and the learned slope a — DiMP's target mask."""
    return (1.0 - a) / 2.0 * jnp.abs(x) + (1.0 + a) / 2.0 * x


def leaky_relu_par_deriv(x: jnp.ndarray, a) -> jnp.ndarray:
    """d/dx of leaky_relu_par; sign(x) on a stop-gradient of x like the reference's
    `.detach()` (activation.py:39-44)."""
    return (1.0 - a) / 2.0 * jnp.sign(jax.lax.stop_gradient(x)) + (1.0 + a) / 2.0


def bent_ident_par(x: jnp.ndarray, a, b: float = 1.0) -> jnp.ndarray:
    """Bent-identity parametric activation (reference activation.py:47-55)."""
    return (1.0 - a) / 2.0 * (jnp.sqrt(x * x + 4.0 * b * b) - 2.0 * b) + (1.0 + a) / 2.0 * x


def bent_ident_par_deriv(x: jnp.ndarray, a, b: float = 1.0) -> jnp.ndarray:
    """d/dx of bent_ident_par (reference activation.py:58-66)."""
    return (1.0 - a) / 2.0 * (x / jnp.sqrt(x * x + 4.0 * b * b)) + (1.0 + a) / 2.0
