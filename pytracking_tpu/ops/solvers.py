"""Online least-squares / minimization solvers, pytree-generic and jit-stable.

TPU-native re-design of reference `pytracking/libs/optimization.py`:
  ConjugateGradientBase.run_CG (:49-197)  -> `cg_solve`
  GaussNewtonCG (:293-436)                -> `gauss_newton_cg`
  GradientDescentL2 (:438-520)            -> `gradient_descent_l2`
  NewtonCG (:522-640)                     -> `newton_cg`
  GradientDescent (:642-714)              -> `gradient_descent`

Design differences from the reference (deliberate, TPU-first):
  * Variables are arbitrary pytrees (the reference's `TensorList` becomes "any pytree";
    arithmetic is via jax.tree_util) — solvers compose with vmap/pjit.
  * Iteration counts are static; loops are `lax.fori_loop`/`lax.scan` so the whole solve
    traces into ONE XLA computation with no host sync (the reference syncs per
    iteration via `.item()` debug hooks).
  * Jacobian/Hessian products come from `jax.jvp`/`jax.vjp`/`jax.grad` instead of
    `torch.autograd.grad(create_graph=True)` (reference :278-291).
  * Every solver optionally records per-iteration losses into a fixed-shape array
    (the reference's `debug`/`analyze_convergence` path) — still sync-free.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


# ---------------------------------------------------------------------------- pytree math

def tree_vdot(a: Pytree, b: Pytree) -> jnp.ndarray:
    """Sum of elementwise inner products over all leaves (real part for complex)."""
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x, y: jnp.real(jnp.vdot(x, y)), a, b))
    return functools.reduce(jnp.add, leaves)


def tree_add(a: Pytree, b: Pytree, alpha=1.0) -> Pytree:
    return jax.tree_util.tree_map(lambda x, y: x + alpha * y, a, b)


def tree_sub(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)


def tree_scale(a: Pytree, s) -> Pytree:
    return jax.tree_util.tree_map(lambda x: s * x, a)


def tree_zeros_like(a: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.zeros_like, a)


# ------------------------------------------------------------------ complex real-view
# Least squares over COMPLEX variables (ECO's Fourier-domain filters) must use
# the Wirtinger/real-pair formulation: jax.jvp/jax.vjp on C->C residuals follow
# JAX's holomorphic cotangent convention, under which the naive vjp(jvp(v))
# matvec is J^T J v instead of the required J^H J v — a non-SPD operator that
# makes CG freeze at iteration 0 (verified: gauss_newton_cg returned x0
# unchanged on a complex linear least-squares with a nonzero closed-form
# solution). The robust fix: split every complex leaf into a trailing
# [real, imag] pair, run the solver on the purely-real view (where the normal
# equations are provably correct and equal the complex J^H J), and map back.

def _complex_mask(tree) -> Pytree:
    return jax.tree_util.tree_map(jnp.iscomplexobj, tree)


def _any_complex(tree) -> bool:
    return any(jax.tree_util.tree_leaves(_complex_mask(tree)))


def _c2r(tree, mask) -> Pytree:
    return jax.tree_util.tree_map(
        lambda x, c: jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1) if c else x,
        tree, mask)


def _r2c(tree, mask) -> Pytree:
    return jax.tree_util.tree_map(
        lambda x, c: jax.lax.complex(x[..., 0], x[..., 1]) if c else x,
        tree, mask)


def _realview_residual(residual_fn, x_mask):
    """Wrap a residual on (possibly) complex pytrees as real-view -> real-view."""

    def wrapped(xr):
        r = residual_fn(_r2c(xr, x_mask))
        return _c2r(r, _complex_mask(r))

    return wrapped


# ------------------------------------------------------------------- conjugate gradient

class CGResult(NamedTuple):
    x: Pytree
    residual_norms: jnp.ndarray  # (max_iter + 1,) ||r||^2 per iteration (0-padded)


def cg_solve(A: Callable[[Pytree], Pytree],
             b: Pytree,
             x0: Optional[Pytree] = None,
             max_iter: int = 10,
             precond: Optional[Callable[[Pytree], Pytree]] = None,
             fletcher_reeves: bool = True,
             eps: float = 0.0) -> CGResult:
    """Preconditioned conjugate gradient for A x = b with A SPD.

    Mirrors reference `ConjugateGradientBase.run_CG` (optimization.py:72-197): standard
    alpha = rho / <p, Ap>, beta by Fletcher-Reeves (rho/rho_prev) or Polak-Ribiere. Fixed
    `max_iter` iterations traced as one `lax.scan`; a traced guard freezes updates once
    rho underflows (replaces the reference's early-return on host).
    """
    if x0 is None:
        x = tree_zeros_like(b)
        r = b
    else:
        x = x0
        r = tree_sub(b, A(x0))

    M = precond if precond is not None else (lambda v: v)

    z = M(r)
    rho0 = tree_vdot(r, z)
    p0 = z

    def step(carry, _):
        x, r, z, p, rho, ok = carry
        q = A(p)
        pq = tree_vdot(p, q)
        ok_i = ok & (pq > eps) & (rho > eps)
        alpha = jnp.where(ok_i, rho / jnp.where(pq == 0, 1.0, pq), 0.0)
        x = tree_add(x, p, alpha)
        r_prev = r
        r = tree_add(r, q, -alpha)
        z = M(r)
        rho_new = tree_vdot(r, z)
        if fletcher_reeves:
            beta = rho_new / jnp.where(rho == 0, 1.0, rho)
        else:
            # Polak-Ribiere (reference optimization.py:119-121):
            # beta = (<r, z> - <r_prev, z>) / rho_prev, clamped at 0
            rho2 = tree_vdot(r_prev, z)
            beta = jnp.maximum(
                (rho_new - rho2) / jnp.where(rho == 0, 1.0, rho), 0.0)
        beta = jnp.where(ok_i, beta, 0.0)
        p = tree_add(z, p, beta)
        return (x, r, z, p, rho_new, ok_i), tree_vdot(r, r)

    init = (x, r, z, p0, rho0, jnp.asarray(True))
    (x, r, *_), rnorms = jax.lax.scan(step, init, None, length=max_iter)
    rnorms = jnp.concatenate([tree_vdot(b, b)[None] if x0 is None
                              else tree_vdot(r, r)[None], rnorms])
    return CGResult(x, rnorms)


# ------------------------------------------------------------------------- Gauss-Newton

class SolveResult(NamedTuple):
    x: Pytree
    losses: jnp.ndarray  # per outer-iteration loss (squared residual norm)


def gauss_newton_cg(residual_fn: Callable[[Pytree], Pytree],
                    x0: Pytree,
                    num_gn_iter: int = 5,
                    num_cg_iter: int = 10,
                    precond: Optional[Callable[[Pytree], Pytree]] = None) -> SolveResult:
    """Gauss-Newton with inner CG (reference GaussNewtonCG optimization.py:293-436).

    Each outer iteration linearizes r(x) ≈ r + J dx and CG-solves the normal equations
    (JᵀJ) dx = Jᵀ r, then x ← x − dx. Jacobian products via jvp/vjp (no materialized J).

    Complex variables are solved in the real view (see `_realview_residual`).
    """
    if _any_complex(x0):
        mask = _complex_mask(x0)
        wrapped = _realview_residual(residual_fn, mask)
        if precond is not None:
            orig_precond = precond
            precond = lambda vr: _c2r(orig_precond(_r2c(vr, mask)), mask)
        res = gauss_newton_cg(wrapped, _c2r(x0, mask), num_gn_iter=num_gn_iter,
                              num_cg_iter=num_cg_iter, precond=precond)
        return SolveResult(_r2c(res.x, mask), res.losses)

    def outer(x, _):
        r, vjp_fn = jax.vjp(residual_fn, x)
        loss = tree_vdot(r, r)

        def JtJ(v):
            _, Jv = jax.jvp(residual_fn, (x,), (v,))
            return vjp_fn(Jv)[0]

        b = vjp_fn(r)[0]
        dx = cg_solve(JtJ, b, max_iter=num_cg_iter, precond=precond).x
        return tree_sub(x, dx), loss

    x, losses = jax.lax.scan(outer, x0, None, length=num_gn_iter)
    return SolveResult(x, losses)


def gradient_descent_l2(residual_fn: Callable[[Pytree], Pytree],
                        x0: Pytree,
                        num_iter: int = 10,
                        step_length: float = 1.0,
                        momentum: float = 0.0) -> SolveResult:
    """Momentum gradient descent on L(x) = ||r(x)||² (reference GradientDescentL2
    optimization.py:438-520). Gradient = 2 Jᵀ r computed via vjp."""
    if _any_complex(x0):
        mask = _complex_mask(x0)
        res = gradient_descent_l2(_realview_residual(residual_fn, mask),
                                  _c2r(x0, mask), num_iter=num_iter,
                                  step_length=step_length, momentum=momentum)
        return SolveResult(_r2c(res.x, mask), res.losses)

    def loss_fn(x):
        r = residual_fn(x)
        return tree_vdot(r, r)

    def step(carry, _):
        x, vel = carry
        loss, g = jax.value_and_grad(loss_fn)(x)
        vel = tree_add(tree_scale(vel, momentum), g)
        x = tree_add(x, vel, -step_length)
        return (x, vel), loss

    (x, _), losses = jax.lax.scan(step, (x0, tree_zeros_like(x0)), None, length=num_iter)
    return SolveResult(x, losses)


def newton_cg(loss_fn: Callable[[Pytree], jnp.ndarray],
              x0: Pytree,
              num_newton_iter: int = 5,
              num_cg_iter: int = 10,
              hessian_reg: float = 0.0) -> SolveResult:
    """Newton's method with CG inner solves on a general scalar loss (reference NewtonCG
    optimization.py:522-640). Hessian-vector products via jvp-of-grad."""
    if _any_complex(x0):
        mask = _complex_mask(x0)
        res = newton_cg(lambda xr: loss_fn(_r2c(xr, mask)), _c2r(x0, mask),
                        num_newton_iter=num_newton_iter, num_cg_iter=num_cg_iter,
                        hessian_reg=hessian_reg)
        return SolveResult(_r2c(res.x, mask), res.losses)

    grad_fn = jax.grad(loss_fn)

    def outer(x, _):
        g = grad_fn(x)

        def Hv(v):
            hv = jax.jvp(grad_fn, (x,), (v,))[1]
            if hessian_reg > 0:
                hv = tree_add(hv, v, hessian_reg)
            return hv

        dx = cg_solve(Hv, g, max_iter=num_cg_iter).x
        return tree_sub(x, dx), loss_fn(x)

    x, losses = jax.lax.scan(outer, x0, None, length=num_newton_iter)
    return SolveResult(x, losses)


def gradient_descent(loss_fn: Callable[[Pytree], jnp.ndarray],
                     x0: Pytree,
                     num_iter: int = 10,
                     step_length: float = 1.0,
                     momentum: float = 0.0) -> SolveResult:
    """Momentum gradient descent on a general scalar loss (reference GradientDescent
    optimization.py:642-714)."""
    if _any_complex(x0):
        mask = _complex_mask(x0)
        res = gradient_descent(lambda xr: loss_fn(_r2c(xr, mask)), _c2r(x0, mask),
                               num_iter=num_iter, step_length=step_length,
                               momentum=momentum)
        return SolveResult(_r2c(res.x, mask), res.losses)

    def step(carry, _):
        x, vel = carry
        loss, g = jax.value_and_grad(loss_fn)(x)
        vel = tree_add(tree_scale(vel, momentum), g)
        x = tree_add(x, vel, -step_length)
        return (x, vel), loss

    (x, _), losses = jax.lax.scan(step, (x0, tree_zeros_like(x0)), None, length=num_iter)
    return SolveResult(x, losses)
