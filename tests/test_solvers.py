import jax
import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops import solvers


def _spd_system(n=8, seed=0):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, n)
    A = jnp.asarray(m @ m.T + n * np.eye(n), jnp.float32)
    b = jnp.asarray(rng.randn(n), jnp.float32)
    return A, b


def test_cg_solves_spd_system():
    A, b = _spd_system()
    res = solvers.cg_solve(lambda x: A @ x, b, max_iter=20)
    np.testing.assert_allclose(np.asarray(A @ res.x), np.asarray(b), atol=1e-3)


def test_cg_pytree_variables():
    A1, b1 = _spd_system(6, 1)
    A2, b2 = _spd_system(4, 2)
    op = lambda x: {"a": A1 @ x["a"], "b": A2 @ x["b"]}
    res = solvers.cg_solve(op, {"a": b1, "b": b2}, max_iter=20)
    np.testing.assert_allclose(np.asarray(A1 @ res.x["a"]), np.asarray(b1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(A2 @ res.x["b"]), np.asarray(b2), atol=1e-3)


def test_cg_under_jit_and_early_freeze():
    A, b = _spd_system(4)
    # 50 iterations >> dimension: rho underflows, solver must stay finite (frozen)
    x = jax.jit(lambda b: solvers.cg_solve(lambda v: A @ v, b, max_iter=50).x)(b)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-3)


def test_gauss_newton_cg_linear_least_squares():
    # residual r(x) = J x - y  -> GN converges in one outer iteration
    rng = np.random.RandomState(3)
    J = jnp.asarray(rng.randn(12, 5), jnp.float32)
    y = jnp.asarray(rng.randn(12), jnp.float32)
    res = solvers.gauss_newton_cg(lambda x: J @ x - y, jnp.zeros(5), num_gn_iter=2,
                                  num_cg_iter=10)
    x_ref = np.linalg.lstsq(np.asarray(J), np.asarray(y), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-3)
    # losses are decreasing
    assert res.losses[1] <= res.losses[0]


def test_gauss_newton_cg_nonlinear():
    # r(x) = [x0^2 - 2, x1 - x0] -> x = (sqrt 2, sqrt 2)
    res = solvers.gauss_newton_cg(
        lambda x: jnp.array([x[0] ** 2 - 2.0, x[1] - x[0]]),
        jnp.array([1.0, 0.0]), num_gn_iter=10, num_cg_iter=5)
    np.testing.assert_allclose(np.asarray(res.x), [np.sqrt(2), np.sqrt(2)], atol=1e-4)


def test_gradient_descent_l2_quadratic():
    J = jnp.diag(jnp.array([1.0, 2.0]))
    y = jnp.array([1.0, 4.0])
    res = solvers.gradient_descent_l2(lambda x: J @ x - y, jnp.zeros(2),
                                      num_iter=200, step_length=0.1, momentum=0.5)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-3)


def test_newton_cg_quadratic_one_step():
    A, b = _spd_system(5, 4)
    loss = lambda x: 0.5 * x @ A @ x - b @ x
    res = solvers.newton_cg(loss, jnp.zeros(5), num_newton_iter=1, num_cg_iter=10)
    np.testing.assert_allclose(np.asarray(A @ res.x), np.asarray(b), atol=1e-3)


def test_gradient_descent_scalar_loss():
    loss = lambda x: jnp.sum((x - 3.0) ** 2)
    res = solvers.gradient_descent(loss, jnp.zeros(3), num_iter=100, step_length=0.1)
    np.testing.assert_allclose(np.asarray(res.x), 3.0 * np.ones(3), atol=1e-3)


def test_gauss_newton_cg_complex_least_squares():
    """Complex variables (ECO's Fourier filters) must solve in the real view:
    the naive jvp/vjp matvec under JAX's holomorphic cotangent convention is
    J^T J (not J^H J) — non-SPD, CG froze at iteration 0 and returned x0
    unchanged (the pre-fix behavior, which left ECO tracking on an unoptimized
    filter)."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((8, 4)) + 1j * rng.standard_normal((8, 4)),
                    jnp.complex64)
    b = jnp.asarray(rng.standard_normal(8) + 1j * rng.standard_normal(8),
                    jnp.complex64)
    res = solvers.gauss_newton_cg(lambda v: {"r": A @ v["x"] - b},
                                  {"x": jnp.zeros(4, jnp.complex64)},
                                  num_gn_iter=3, num_cg_iter=20)
    x_closed = jnp.linalg.lstsq(A, b)[0]
    np.testing.assert_allclose(np.asarray(res.x["x"]), np.asarray(x_closed),
                               atol=1e-4)


def test_gauss_newton_cg_mixed_real_complex_pytree():
    """ECO's joint problem mixes a real projection matrix with complex filters."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((6, 3)) + 1j * rng.standard_normal((6, 3)),
                    jnp.complex64)
    b = jnp.asarray(rng.standard_normal(6) + 1j * rng.standard_normal(6),
                    jnp.complex64)
    t = jnp.asarray(rng.standard_normal(3), jnp.float32)

    def residual(v):
        return {"r": A @ v["x"] - b, "s": v["w"] - t}

    res = solvers.gauss_newton_cg(residual,
                                  {"x": jnp.zeros(3, jnp.complex64),
                                   "w": jnp.zeros(3, jnp.float32)},
                                  num_gn_iter=3, num_cg_iter=20)
    np.testing.assert_allclose(np.asarray(res.x["x"]),
                               np.asarray(jnp.linalg.lstsq(A, b)[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x["w"]), np.asarray(t), atol=1e-4)
