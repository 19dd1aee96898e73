import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops import dcf


def test_hann2d_shape_and_symmetry():
    w = dcf.hann2d((17, 23))
    assert w.shape == (17, 23)
    np.testing.assert_allclose(w, w[::-1, :], atol=1e-6)
    np.testing.assert_allclose(w, w[:, ::-1], atol=1e-6)
    assert float(w.max()) <= 1.0 and float(w.min()) >= 0.0


def test_hann2d_clipped_pads_to_size():
    w = dcf.hann2d_clipped((20, 20), (10, 12))
    assert w.shape == (20, 20)
    # corners replicate the effective window's edge value
    assert float(w[0, 0]) == float(w[5, 4])


def test_gauss_2d_peak_location():
    g = dcf.gauss_2d((31, 31), 2.0, jnp.array([[3.0, -4.0]]))
    assert g.shape == (1, 31, 31)
    idx = np.unravel_index(np.argmax(np.asarray(g[0])), (31, 31))
    # center of a 31-grid is index 15; center offset (3, -4) -> (18, 11)
    assert idx == (18, 11)


def test_label_function_matches_spatial_gaussian():
    """Fourier-domain label == fft of the sampled spatial Gaussian (for large sigma,
    where truncation is negligible)."""
    sz, sigma = (25, 25), (3.0, 3.0)
    lf = dcf.label_function(sz, sigma)  # centered fourier coefficients (real)
    g = dcf.gauss_2d(sz, jnp.array(sigma), jnp.array([[0.0, 0.0]]))[0]
    g_f = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(np.asarray(g)))) / (sz[0] * sz[1])
    np.testing.assert_allclose(np.asarray(lf), g_f.real, atol=1e-4)


def test_max2d_batched():
    a = jnp.zeros((2, 8, 9)).at[0, 3, 4].set(5.0).at[1, 7, 0].set(2.0)
    val, pos = dcf.max2d(a)
    np.testing.assert_allclose(np.asarray(val), [5.0, 2.0])
    np.testing.assert_array_equal(np.asarray(pos), [[3, 4], [7, 0]])


def test_cubic_spline_fourier_dc():
    f = jnp.array([0.0, 0.25, 0.5])
    bf = dcf.cubic_spline_fourier(f, -0.75)
    assert float(bf[0]) == 1.0
    assert np.all(np.isfinite(np.asarray(bf)))


def test_hann2d_uncentered_matches_reference():
    import os

    import pytest

    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    import tests.refshim  # noqa: F401
    from pytracking.libs import dcf as ref_dcf

    from pytracking_tpu.ops import dcf

    for sz in (18, 19, 288):
        ref = ref_dcf.hann2d(torch.tensor([sz, sz]), centered=False).numpy().squeeze()
        mine = np.asarray(dcf.hann2d_uncentered((sz, sz)))
        np.testing.assert_allclose(mine, ref, atol=1e-6)
