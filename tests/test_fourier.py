import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops import fourier


def test_cfft2_roundtrip():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(3, 13, 17), jnp.float32)
    np.testing.assert_allclose(np.asarray(fourier.cifft2(fourier.cfft2(a))),
                               np.asarray(a), atol=1e-4)


def test_sample_fs_upsamples_bandlimited_signal():
    """Fourier-domain zero-padding of a band-limited signal must interpolate exactly:
    samples at original grid positions are preserved."""
    n, m = 11, 33  # 3x upsampling, odd sizes
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(n, n), jnp.float32)
    a_fs = fourier.cfft2(a)
    up = fourier.sample_fs(a_fs, (m, m)) / (n * n)
    # original sample (i, j) lives at upsampled position (3i, 3j)
    sub = np.asarray(up)[::3, ::3]
    np.testing.assert_allclose(sub, np.asarray(a), atol=1e-3)


def test_shift_fs_integer_shift_is_roll():
    """shift_fs multiplies by exp(+i·k·shift) (reference fourier.py:78-92), which
    translates the signal by −shift·N/2π samples."""
    n = 15
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(n, n), jnp.float32)
    shift = jnp.array([2.0, -3.0]) * (2 * np.pi / n)
    shifted = fourier.cifft2(fourier.shift_fs(fourier.cfft2(a), shift))
    np.testing.assert_allclose(np.asarray(shifted), np.roll(np.asarray(a), (-2, 3), (0, 1)),
                               atol=1e-4)


def test_sum_fs_different_resolutions():
    a = fourier.cfft2(jnp.ones((5, 5)))
    b = fourier.cfft2(jnp.ones((9, 9)))
    s = fourier.sum_fs([a, b])
    assert s.shape == (9, 9)
    # DC coefficient adds: 25 + 81
    assert np.isclose(np.asarray(s)[4, 4].real, 25 + 81)


def test_inner_prod_fs_parseval():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(7, 9), jnp.float32)
    b = jnp.asarray(rng.randn(7, 9), jnp.float32)
    ip = fourier.inner_prod_fs(fourier.cfft2(a), fourier.cfft2(b))
    np.testing.assert_allclose(float(ip), float((a * b).sum()), rtol=1e-4)
