"""Discriminative-correlation-filter tooling: windows, Gaussian labels, interpolation
kernels, regularization filters, and 2D argmax.

Functional JAX re-design of the reference library `pytracking/libs/dcf.py` (hann windows
:16-38, gaussian labels :40-60, interpolation kernels :62-104, reg filter :106-154,
max2d :156-164). All functions are pure, shape-static, and jit/vmap friendly. Sizes are
Python ints / tuples (static); only data is traced.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def hann1d(sz: int, full: bool = True) -> jnp.ndarray:
    """1D Hann window. `full=False` gives the half (symmetric-interior) window used for
    clipped windows (reference dcf.py:5-14)."""
    if full:
        n = jnp.arange(sz, dtype=jnp.float32)
        return 0.5 * (1.0 - jnp.cos(2.0 * math.pi * (n + 1) / (sz + 1)))
    # half window: 0.5..1 over sz points
    n = jnp.arange(sz, dtype=jnp.float32)
    return 0.5 * (1.0 + jnp.cos(math.pi * (sz - 1 - n) / (2 * sz - 1)))


def hann2d(sz: Tuple[int, int]) -> jnp.ndarray:
    """Outer-product 2D Hann window, shape (H, W) (reference dcf.py:16-19)."""
    return hann1d(sz[0])[:, None] * hann1d(sz[1])[None, :]


def hann1d_uncentered(sz: int) -> jnp.ndarray:
    """Wrap-around 1D cosine window with its peak at index 0 — the reference's
    `hann1d(sz, centered=False)` (dcf.py:12-13), used on ATOM/ECO's
    wrap-around Fourier-interpolated score grids."""
    w = 0.5 * (1.0 + jnp.cos((2.0 * math.pi / (sz + 2)) *
                             jnp.arange(0, sz // 2 + 1, dtype=jnp.float32)))
    return jnp.concatenate([w, w[1:sz - sz // 2][::-1]])


def hann2d_uncentered(sz: Tuple[int, int]) -> jnp.ndarray:
    """2D wrap-around Hann window (reference dcf.py:16-19, centered=False)."""
    return hann1d_uncentered(sz[0])[:, None] * hann1d_uncentered(sz[1])[None, :]


def hann2d_clipped(sz: Tuple[int, int], effective_sz: Tuple[int, int]) -> jnp.ndarray:
    """2D Hann window of `effective_sz` centered then padded (edge-replicate) or
    center-cropped to `sz` — flat outside the effective region when effective < sz, a
    flatter central section when effective > sz (the reference's negative F.pad crops,
    dcf.py:21-38)."""
    eh, ew = effective_sz
    win = hann1d(eh)[:, None] * hann1d(ew)[None, :]
    if eh > sz[0]:
        t = (eh - sz[0]) // 2
        win = win[t:t + sz[0], :]
        eh = sz[0]
    if ew > sz[1]:
        l = (ew - sz[1]) // 2
        win = win[:, l:l + sz[1]]
        ew = sz[1]
    pad_t = (sz[0] - eh) // 2
    pad_b = sz[0] - eh - pad_t
    pad_l = (sz[1] - ew) // 2
    pad_r = sz[1] - ew - pad_l
    return jnp.pad(win, ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")


def gauss_1d(sz: int, sigma: float, center, end_pad: int = 0, density: bool = False) -> jnp.ndarray:
    """Sampled 1D Gaussian centered at `center` (traced scalar ok), length sz+end_pad
    (reference dcf.py:44-48 gauss_spatial / processing_utils.py:505-514)."""
    k = jnp.arange(-(sz - 1) / 2, (sz + 1) / 2 + end_pad, dtype=jnp.float32)
    g = jnp.exp(-1.0 / (2.0 * sigma ** 2) * (k - center) ** 2)
    if density:
        g = g / (math.sqrt(2.0 * math.pi) * sigma)
    return g


def gauss_2d(sz: Tuple[int, int], sigma, center, end_pad: Tuple[int, int] = (0, 0),
             density: bool = False) -> jnp.ndarray:
    """Separable 2D Gaussian label. `center` is (y, x), possibly batched with leading
    dims; returns (..., H, W). Reference: ltr/data/processing_utils.py:516-521."""
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (2,))
    center = jnp.asarray(center, jnp.float32)
    if center.ndim == 1:
        center = center[None]
    gy = jax.vmap(lambda c: gauss_1d(sz[0], sigma[0], c, end_pad[0], density))(center[:, 0])
    gx = jax.vmap(lambda c: gauss_1d(sz[1], sigma[1], c, end_pad[1], density))(center[:, 1])
    return gy[:, :, None] * gx[:, None, :]


def gauss_fourier(sz: int, sigma: float, half: bool = False) -> jnp.ndarray:
    """Closed-form Fourier transform of a Gaussian (reference dcf.py:40-45)."""
    if half:
        k = jnp.arange(0, int(sz / 2 + 1), dtype=jnp.float32)
    else:
        k = jnp.arange(-math.ceil((sz - 1) / 2), math.floor((sz - 1) / 2) + 1, dtype=jnp.float32)
    return math.sqrt(2 * math.pi) * sigma / sz * jnp.exp(-2.0 * (math.pi * sigma * k / sz) ** 2)


def label_function(sz: Tuple[int, int], sigma: Tuple[float, float]) -> jnp.ndarray:
    """Fourier-domain Gaussian label, centered spectrum, shape (H, W) complex-compatible
    real array (reference dcf.py:53-55)."""
    return gauss_fourier(sz[0], sigma[0])[:, None] * gauss_fourier(sz[1], sigma[1])[None, :]


def label_function_spatial(sz: Tuple[int, int], sigma, center,
                           end_pad: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Spatial Gaussian label centered at `center` (y, x) offsets from the image center
    (reference dcf.py:57-60)."""
    return gauss_2d(sz, sigma, center, end_pad)


def cubic_spline_fourier(f: jnp.ndarray, a: float) -> jnp.ndarray:
    """Fourier transform of the cubic interpolation spline with parameter `a`
    (reference dcf.py:62-72)."""
    bf = (6.0 * (1.0 - jnp.cos(2.0 * math.pi * f))
          + 3.0 * a * (1.0 - jnp.cos(4.0 * math.pi * f))
          - (6.0 + a * 8.0) * math.pi * f * jnp.sin(2.0 * math.pi * f)
          - 2.0 * a * math.pi * f * jnp.sin(4.0 * math.pi * f)) \
        / (4.0 * math.pi ** 4 * f ** 4)
    return jnp.where(f == 0.0, jnp.ones_like(bf), bf)


def get_interp_fourier(sz: Tuple[int, int], method: str = "ideal",
                       bicubic_a: float = -0.75, centering: bool = True,
                       windowing: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fourier-domain interpolation kernel for each dimension (reference dcf.py:74-104).
    Returns complex (H,1) and (1,W) arrays."""
    ky = jnp.arange(-math.ceil((sz[0] - 1) / 2), math.floor((sz[0] - 1) / 2) + 1, dtype=jnp.float32)
    kx = jnp.arange(-math.ceil((sz[1] - 1) / 2), math.floor((sz[1] - 1) / 2) + 1, dtype=jnp.float32)
    if method == "ideal":
        fy = jnp.ones_like(ky) / sz[0]
        fx = jnp.ones_like(kx) / sz[1]
    elif method == "bicubic":
        fy = cubic_spline_fourier(ky / sz[0], bicubic_a) / sz[0]
        fx = cubic_spline_fourier(kx / sz[1], bicubic_a) / sz[1]
    else:
        raise ValueError(f"Unknown method {method}")
    fy = fy.astype(jnp.complex64)
    fx = fx.astype(jnp.complex64)
    if centering:
        # shift by half a pixel so the interpolated grid is centered
        fy = fy * jnp.exp(-1j * math.pi / sz[0] * ky)
        fx = fx * jnp.exp(-1j * math.pi / sz[1] * kx)
    if windowing:
        fy = fy * hann1d(sz[0])
        fx = fx * hann1d(sz[1])
    return fy[:, None], fx[None, :]


def get_reg_filter(sz: Tuple[int, int], target_sz: jnp.ndarray, params) -> jnp.ndarray:
    """Spatial regularization filter in the Fourier domain for ECO
    (reference dcf.py:106-154). `params` needs: use_reg_window, reg_window_min,
    reg_window_edge, reg_window_power, reg_sparsity_threshold."""
    if not getattr(params, "use_reg_window", True):
        return jnp.array([[getattr(params, "reg_window_min", 1e-3)]], dtype=jnp.float32)

    reg_window_edge = getattr(params, "reg_window_edge", 10e-3)
    reg_window_min = getattr(params, "reg_window_min", 1e-4)
    reg_window_power = getattr(params, "reg_window_power", 2)
    reg_sparsity_threshold = getattr(params, "reg_sparsity_threshold", 0.05)

    # normalized grid
    wrg, wcg = (jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2 for s in sz)
    wrs = 2.0 / target_sz[0] * jnp.abs(wrg)
    wcs = 2.0 / target_sz[1] * jnp.abs(wcg)
    reg_win = (reg_window_edge - reg_window_min) * \
        (wrs[:, None] ** reg_window_power + wcs[None, :] ** reg_window_power) + reg_window_min

    # DFT, keep significant coefficients only
    reg_win_dft = jnp.fft.fftshift(jnp.fft.fft2(reg_win)) / (sz[0] * sz[1])
    mx = jnp.max(jnp.abs(reg_win_dft))
    reg_win_dft = jnp.where(jnp.abs(reg_win_dft) >= reg_sparsity_threshold * mx,
                            reg_win_dft, 0.0)
    return reg_win_dft.astype(jnp.complex64)


def max2d(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max value and integer (row, col) argmax over the trailing two dims
    (reference dcf.py:156-164). Batched over leading dims."""
    h, w = a.shape[-2], a.shape[-1]
    flat = a.reshape(a.shape[:-2] + (h * w,))
    idx = jnp.argmax(flat, axis=-1)
    max_val = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    row = idx // w
    col = idx % w
    return max_val, jnp.stack([row, col], axis=-1)
