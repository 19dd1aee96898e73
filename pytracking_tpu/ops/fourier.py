"""Fourier tooling for correlation-filter trackers (ECO).

TPU-native re-design of reference `pytracking/libs/fourier.py` (+ `libs/complex.py`).
The reference emulates complex tensors as (..., 2) real pairs because old torch lacked
complex dtypes; JAX has native complex64, so that entire layer disappears and every op
below is a plain function on complex arrays. We keep the reference's *centered, full*
spectrum convention: `cfft2` returns an fftshift'ed 2D FFT over the last two dims, so
frequency index 0 sits at the spatial center — this makes Fourier-domain zero-padding
(`sample_fs`) and multi-resolution summation (`sum_fs`) pure pad/crop ops.

Note on TPU: jnp.fft lowers to XLA FFT which runs fine on TPU for the small (<100²)
spectra ECO uses; everything stays fused inside one jitted tracker step.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def cfft2(a: jnp.ndarray) -> jnp.ndarray:
    """Centered 2D FFT over the last two dims (reference fourier.py:20-26 rfftshift2+rfft)."""
    return jnp.fft.fftshift(jnp.fft.fft2(a), axes=(-2, -1)).astype(jnp.complex64)


def cifft2(a_fs: jnp.ndarray, signal_sizes: Tuple[int, int] | None = None) -> jnp.ndarray:
    """Inverse of cfft2, returns the real part (reference fourier.py:28-33)."""
    return jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(a_fs, axes=(-2, -1)), s=signal_sizes))


def pad_fs(a_fs: jnp.ndarray, grid_sz: Tuple[int, int]) -> jnp.ndarray:
    """Zero-pad a centered spectrum to `grid_sz` (Fourier-domain upsample).

    The padding must keep the DC bin aligned: fftshift places DC at index n//2
    for any n, so after padding, DC (input index h//2) must land at gh//2 —
    i.e. top pad = gh//2 - h//2. (The previous symmetric formula put DC one
    bin off when padding odd -> even, a linear phase error that translated the
    upsampled map by a size-dependent offset — it broke ECO's localization;
    found via shift-covariance probes against the reference.)"""
    h, w = a_fs.shape[-2], a_fs.shape[-1]
    gh, gw = int(grid_sz[0]), int(grid_sz[1])
    pt = gh // 2 - h // 2
    pb = gh - h - pt
    plft = gw // 2 - w // 2
    prt = gw - w - plft
    pad = [(0, 0)] * (a_fs.ndim - 2) + [(pt, pb), (plft, prt)]
    return jnp.pad(a_fs, pad)


def sample_fs(a_fs: jnp.ndarray, grid_sz: Tuple[int, int] | None = None) -> jnp.ndarray:
    """Spatial samples of the Fourier series: ifft of the (optionally zero-padded)
    centered spectrum, scaled so values are interpolated samples
    (reference fourier.py:35-76)."""
    if grid_sz is None:
        h, w = a_fs.shape[-2], a_fs.shape[-1]
        return (h * w) * cifft2(a_fs)
    gh, gw = int(grid_sz[0]), int(grid_sz[1])
    return (gh * gw) * cifft2(pad_fs(a_fs, (gh, gw)))


def _freq_grid(sz: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ky = jnp.arange(-math.ceil((sz[0] - 1) / 2), math.floor((sz[0] - 1) / 2) + 1,
                    dtype=jnp.float32)
    kx = jnp.arange(-math.ceil((sz[1] - 1) / 2), math.floor((sz[1] - 1) / 2) + 1,
                    dtype=jnp.float32)
    return ky, kx


def shift_fs(a_fs: jnp.ndarray, shift) -> jnp.ndarray:
    """Sub-pixel shift in the Fourier domain via phase ramp: shift is (dy, dx) in
    *normalized* units of 2π/sz like the reference (fourier.py:78-93)."""
    sz = (a_fs.shape[-2], a_fs.shape[-1])
    ky, kx = _freq_grid(sz)
    shift = jnp.asarray(shift, jnp.float32)
    ramp_y = jnp.exp(1j * shift[..., 0:1] * ky)  # (..., H)
    ramp_x = jnp.exp(1j * shift[..., 1:2] * kx)  # (..., W)
    return a_fs * ramp_y[..., :, None] * ramp_x[..., None, :]


def sum_fs(a_fs_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Sum of Fourier series with different resolutions: zero-pad all centered spectra to
    the largest and add (reference fourier.py:95-138)."""
    gh = max(int(a.shape[-2]) for a in a_fs_list)
    gw = max(int(a.shape[-1]) for a in a_fs_list)
    out = None
    for a in a_fs_list:
        p = pad_fs(a, (gh, gw))
        out = p if out is None else out + p
    return out


def inner_prod_fs(a_fs: jnp.ndarray, b_fs: jnp.ndarray) -> jnp.ndarray:
    """Real inner product <a, b> computed in the Fourier domain (Parseval), matching the
    reference's rfft-aware weighting (fourier.py:140-145). With full spectra this is just
    the real part of the complex inner product divided by the number of samples... but
    since our spectra follow the reference's normalization (plain fft2, no 1/N), the
    spatial inner product equals sum(conj(a)*b)/N."""
    n = a_fs.shape[-2] * a_fs.shape[-1]
    return jnp.real(jnp.sum(jnp.conj(a_fs) * b_fs)) / n
