import jax
import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops import prroi_pool


def _rand_feat(b=2, h=12, w=14, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, h, w, c), jnp.float32)


def test_prroi_matches_brute_force_integration():
    feat = _rand_feat()
    rois = jnp.array([[1.3, 2.1, 9.7, 8.4],
                      [0.0, 0.0, 13.0, 11.0],
                      [3.5, 3.5, 5.5, 6.5]], jnp.float32)
    bidx = jnp.array([0, 1, 0], jnp.int32)
    exact = prroi_pool.prroi_pool2d(feat, rois, bidx, (3, 3))
    brute = prroi_pool.prroi_pool2d_brute(feat, rois, bidx, (3, 3), samples=128)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(brute), atol=2e-3)


def test_prroi_constant_feature_gives_constant():
    feat = jnp.ones((1, 10, 10, 2)) * 3.0
    rois = jnp.array([[2.0, 2.0, 7.0, 7.0]])
    out = prroi_pool.prroi_pool2d(feat, rois, jnp.zeros(1, jnp.int32), (5, 5))
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_prroi_spatial_scale():
    feat = _rand_feat(1, 8, 8, 1, seed=1)
    rois_img = jnp.array([[4.0, 8.0, 24.0, 20.0]])  # image coords, scale 1/4
    a = prroi_pool.prroi_pool2d(feat, rois_img, jnp.zeros(1, jnp.int32), (2, 2), 0.25)
    b = prroi_pool.prroi_pool2d(feat, rois_img * 0.25, jnp.zeros(1, jnp.int32), (2, 2), 1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prroi_gradient_wrt_boxes_matches_finite_diff():
    """Differentiability w.r.t. box coords is the key property (IoU-Net refinement)."""
    feat = _rand_feat(1, 12, 12, 2, seed=2)
    bidx = jnp.zeros(1, jnp.int32)

    def f(box):
        return jnp.sum(prroi_pool.prroi_pool2d(feat, box[None], bidx, (3, 3)) ** 2)

    box = jnp.array([2.3, 3.1, 8.9, 9.7])
    g = jax.grad(f)(box)
    eps = 1e-3
    for k in range(4):
        e = np.zeros(4, np.float32)
        e[k] = eps
        fd = (f(box + e) - f(box - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=2e-2, atol=1e-3)


def test_prroi_gradient_wrt_features():
    feat = _rand_feat(1, 6, 6, 1, seed=3)
    rois = jnp.array([[1.0, 1.0, 5.0, 5.0]])
    g = jax.grad(lambda f: jnp.sum(prroi_pool.prroi_pool2d(f, rois, jnp.zeros(1, jnp.int32), (2, 2))))(feat)
    assert np.all(np.isfinite(np.asarray(g)))
    # weights along each axis integrate bins over the box: total sums to box_area/bin_area... = ph*pw
    np.testing.assert_allclose(float(g.sum()), 4.0, rtol=1e-4)
