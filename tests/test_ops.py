import jax
import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops import activation, distance, filter as filter_ops, patch


# ------------------------------------------------------------------ filter ops

def test_apply_filter_matches_manual_correlation():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    filt = jnp.asarray(rng.randn(2, 3, 3, 3, 1), jnp.float32)
    out = filter_ops.apply_filter(feat, filt)
    assert out.shape == (2, 8, 8, 1)
    # manual cross-correlation at interior position (4, 4) of sample 0
    f = np.asarray(feat[0])
    w = np.asarray(filt[0, ..., 0])
    manual = sum(f[4 - 1 + i, 4 - 1 + j, c] * w[i, j, c]
                 for i in range(3) for j in range(3) for c in range(3))
    np.testing.assert_allclose(float(out[0, 4, 4, 0]), manual, rtol=1e-4)


def test_apply_feat_transpose_is_adjoint():
    """<apply_filter(x, w), a> == <w, apply_feat_transpose(x, a)> — adjoint identity."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(2, 6, 6, 2), jnp.float32)
    filt = jnp.asarray(rng.randn(2, 3, 3, 2, 1), jnp.float32)
    act = jnp.asarray(rng.randn(2, 6, 6, 1), jnp.float32)
    lhs = jnp.vdot(filter_ops.apply_filter(feat, filt), act)
    rhs = jnp.vdot(filt, filter_ops.apply_feat_transpose(feat, act, (3, 3)))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_filter_gradient_zero_at_perfect_fit():
    feat = jnp.ones((1, 4, 4, 1))
    filt = jnp.zeros((1, 1, 1, 1, 1))
    label = jnp.zeros((1, 4, 4, 1))
    g = filter_ops.filter_gradient(feat, filt, label)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


# ------------------------------------------------------------------ activations

def test_leaky_relu_par_limits():
    x = jnp.array([-2.0, -1.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(activation.leaky_relu_par(x, 1.0)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(activation.leaky_relu_par(x, 0.0)),
                               np.maximum(np.asarray(x), 0.0))


def test_leaky_relu_par_deriv_matches_autodiff():
    x = jnp.array([-2.0, -0.5, 0.5, 2.0])
    a = 0.3
    auto = jax.vmap(jax.grad(lambda v: activation.leaky_relu_par(v, a)))(x)
    np.testing.assert_allclose(np.asarray(activation.leaky_relu_par_deriv(x, a)),
                               np.asarray(auto), atol=1e-6)


def test_bent_ident_par_deriv_matches_autodiff():
    x = jnp.array([-2.0, -0.5, 0.5, 2.0])
    a, b = 0.3, 1.0
    auto = jax.vmap(jax.grad(lambda v: activation.bent_ident_par(v, a, b)))(x)
    np.testing.assert_allclose(np.asarray(activation.bent_ident_par_deriv(x, a, b)),
                               np.asarray(auto), atol=1e-5)


def test_softmax_reg():
    x = jnp.array([[1.0, 2.0, 3.0]])
    no_reg = activation.softmax_reg(x, axis=-1)
    np.testing.assert_allclose(np.asarray(no_reg), np.asarray(jax.nn.softmax(x, -1)))
    reg = activation.softmax_reg(x, axis=-1, reg=0.0)
    assert reg.shape == x.shape
    assert float(reg.sum()) < 1.0  # regularizer absorbs mass


def test_mlu_continuity():
    m = 0.05
    xs = jnp.linspace(-1.0, 1.0, 201)
    y = activation.mlu(xs, m)
    assert np.all(np.diff(np.asarray(y)) >= -1e-6)  # monotone
    np.testing.assert_allclose(float(activation.mlu(jnp.array(0.5), m)), 0.5)


# ------------------------------------------------------------------ distance map

def test_distance_map_partition_and_center():
    dm = distance.distance_map(jnp.array([[3.0, 4.0]]), (8, 8), num_bins=10)
    assert dm.shape == (1, 8, 8, 10)
    # at the center pixel, all mass in bin 0
    np.testing.assert_allclose(np.asarray(dm[0, 3, 4]), np.eye(10)[0], atol=1e-6)
    # interior pixels: bins sum to 1 (linear interpolation partition of unity)
    sums = np.asarray(dm.sum(-1))
    assert np.all(np.abs(sums[0, :6, :6] - 1.0) < 1e-5)


# ------------------------------------------------------------------ patch sampling

def test_sample_patch_identity():
    rng = np.random.RandomState(2)
    im = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    p, coords = patch.sample_patch(im, jnp.array([7.5, 7.5]), jnp.array([16.0, 16.0]),
                                   (16, 16), aa_taps=1)
    np.testing.assert_allclose(np.asarray(p), np.asarray(im), atol=1e-5)
    np.testing.assert_allclose(np.asarray(coords), [-0.5, -0.5, 15.5, 15.5], atol=1e-5)


def test_sample_patch_coord_roundtrip():
    im = jnp.zeros((32, 32, 1))
    pos = jnp.array([10.0, 20.0])
    _, coords = patch.sample_patch(im, pos, jnp.array([8.0, 8.0]), (4, 4), aa_taps=1)
    # patch center pixel (1.5, 1.5) maps back to pos
    back = patch.patch_to_image(jnp.array([1.5, 1.5]), coords, (4, 4))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pos), atol=1e-5)
    fwd = patch.image_to_patch(pos, coords, (4, 4))
    np.testing.assert_allclose(np.asarray(fwd), [1.5, 1.5], atol=1e-5)


def test_sample_patch_replicate_border():
    im = jnp.ones((8, 8, 1)) * 5.0
    p, _ = patch.sample_patch(im, jnp.array([0.0, 0.0]), jnp.array([16.0, 16.0]), (8, 8),
                              aa_taps=1)
    np.testing.assert_allclose(np.asarray(p), 5.0, atol=1e-5)


def test_sample_patch_multiscale_shapes():
    im = jnp.zeros((24, 24, 3))
    patches, coords = patch.sample_patch_multiscale(
        im, jnp.array([12.0, 12.0]), jnp.array([1.0, 1.2]), jnp.array([12.0, 12.0]), (6, 6))
    assert patches.shape == (2, 6, 6, 3)
    assert coords.shape == (2, 4)


def test_sample_patch_inside_mode_stays_in_image():
    im = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10, 1))
    p, coords = patch.sample_patch(im, jnp.array([1.0, 1.0]), jnp.array([8.0, 8.0]),
                                   (8, 8), mode="inside_major", max_scale_change=4.0,
                                   aa_taps=1)
    tl = np.asarray(coords[:2])
    assert np.all(tl >= -0.51)
