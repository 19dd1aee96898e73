"""Image patch extraction (crop + resize) — the tracker's per-frame preprocess.

TPU-native re-design of reference `pytracking/features/preprocessing.py`
(`sample_patch:55`, `sample_patch_multiscale:33`, `sample_patch_transformed:14`).

The reference does an integer crop with replicate padding, an integer pre-decimation
(anti-aliasing), and a host-synchronized bilinear resize — three dynamic-shape ops. Here
the whole thing is ONE fixed-shape gather-based bilinear warp that runs inside the jitted
track step: the crop center and size are *traced scalars*, the output size is static, so
changing target scale never recompiles and never syncs the host. Anti-aliasing is a
static K×K tap average (area filter) instead of the reference's dynamic decimation.

Coordinate convention (used consistently by all trackers in this framework):
image pixel centers sit at integer coordinates (0..H-1). Output pixel j of a patch with
center `pos` and extent `sample_sz` samples image coordinate

    y(j) = pos_y + ((j + 0.5) / out_h - 0.5) * sample_sz_y

so the patch is centered at `pos` and spans exactly `sample_sz`. `patch_to_image` /
`image_to_patch` below are the inverse pair trackers use to map score-map peaks back to
image coordinates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(im: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                    replicate: bool = True) -> jnp.ndarray:
    """Bilinear lookup of im (H, W, C) at continuous coords ys/xs (any matching shape).
    Border mode: replicate (clamp) like the reference's F.pad(replicate), or zero."""
    H, W = im.shape[0], im.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dy = (ys - y0)[..., None]
    dx = (xs - x0)[..., None]

    def tap(iy, ix):
        v = im[jnp.clip(iy, 0, H - 1).astype(jnp.int32),
               jnp.clip(ix, 0, W - 1).astype(jnp.int32)]
        if not replicate:
            inside = ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W))[..., None]
            v = jnp.where(inside, v, 0.0)
        return v

    return ((1 - dy) * (1 - dx) * tap(y0, x0) + (1 - dy) * dx * tap(y0, x0 + 1)
            + dy * (1 - dx) * tap(y0 + 1, x0) + dy * dx * tap(y0 + 1, x0 + 1))


def _shrink_inside(pos, sample_sz, im_sz, mode: str, max_scale_change):
    """'inside'/'inside_major' border modes: shrink the sample size so it fits the image
    (at most by max_scale_change) and shift the crop inside — traced float math mirroring
    reference sample_patch:77-123."""
    im_sz = jnp.asarray(im_sz, jnp.float32)
    shrink = sample_sz / im_sz
    shrink = jnp.max(shrink) if mode == "inside" else jnp.min(shrink)
    shrink = jnp.clip(shrink, 1.0, max_scale_change if max_scale_change else None)
    sample_sz = sample_sz / shrink
    # shift crop fully inside (only along axes where it fits)
    tl = pos - sample_sz / 2
    br = pos + sample_sz / 2
    shift = jnp.maximum(-tl - 0.5, 0.0) - jnp.maximum(br - (im_sz - 0.5), 0.0)
    fits = sample_sz <= im_sz
    pos = jnp.where(fits, pos + shift, im_sz / 2 - 0.5)
    return pos, sample_sz


def _resample_weights(src_coords: jnp.ndarray, src_size: int,
                      spread: jnp.ndarray) -> jnp.ndarray:
    """Separable resampling weight matrix W (out, src): row i is a normalized triangle
    filter of width `spread` (≥1) centered at src_coords[i], with out-of-range mass
    clamped onto the border pixels (replicate padding). Rows sum to 1, so a matmul
    with W realizes anti-aliased crop+resize."""
    grid = jnp.arange(src_size, dtype=jnp.float32)
    # clamp centers into range: out-of-image samples replicate the border row/col
    c = jnp.clip(src_coords, 0.0, src_size - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - grid[None, :]) / spread)
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-8)


def sample_patch(im: jnp.ndarray, pos: jnp.ndarray, sample_sz: jnp.ndarray,
                 output_sz: Tuple[int, int], mode: str = "replicate",
                 max_scale_change=None, aa_taps: int = 2,
                 is_mask: bool = False, im_sz=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract a patch of (traced) extent `sample_sz` centered at (traced) `pos` from
    im (H, W, C), resampled to static `output_sz` (oh, ow).

    TPU-native formulation: the crop+resize is SEPARABLE, so it is computed as two
    dense weight matmuls P = W_y · im · W_xᵀ that run on the MXU — a gather-based warp
    costs ~10⁶ scalar gathers per frame on TPU, the matmuls are sub-millisecond. The
    triangle-filter rows double as area anti-aliasing when downsampling (the
    reference's integer pre-decimation, preprocessing.py:88-103).

    `im_sz`: optional traced (2,) TRUE image size when `im` has been bucket-padded
    (edge-replicate) to a larger static shape so heterogeneous frame sizes share one
    compiled program. Only the 'inside'/'inside_major' shrink math needs the true
    size — replicate-border reads into the pad region already return border values
    because the padding replicates them.

    Returns (patch (oh, ow, C), coords (4,) = [tl_y, tl_x, br_y, br_x] in image coords —
    the actual extent sampled, for mapping results back).
    """
    oh, ow = output_sz
    H, W = im.shape[0], im.shape[1]
    pos = jnp.asarray(pos, jnp.float32)
    sample_sz = jnp.asarray(sample_sz, jnp.float32)
    if mode in ("inside", "inside_major"):
        true_sz = im.shape[:2] if im_sz is None else im_sz
        pos, sample_sz = _shrink_inside(pos, sample_sz, true_sz, mode, max_scale_change)

    scale = sample_sz / jnp.asarray([oh, ow], jnp.float32)
    j = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh - 0.5
    i = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow - 0.5
    ys = pos[0] + j * sample_sz[0]
    xs = pos[1] + i * sample_sz[1]

    if is_mask:
        # nearest-neighbor for masks (reference sample_patch:146) — small gathers
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        patch = im[jnp.clip(jnp.round(yy), 0, H - 1).astype(jnp.int32),
                   jnp.clip(jnp.round(xx), 0, W - 1).astype(jnp.int32)]
    else:
        spread_y = jnp.maximum(scale[0], 1.0) if aa_taps > 1 else jnp.asarray(1.0)
        spread_x = jnp.maximum(scale[1], 1.0) if aa_taps > 1 else jnp.asarray(1.0)
        wy = _resample_weights(ys, H, spread_y)              # (oh, H)
        wx = _resample_weights(xs, W, spread_x)              # (ow, W)
        imf = im.astype(jnp.float32)
        patch = jnp.einsum("ih,hwc->iwc", wy, imf,
                           preferred_element_type=jnp.float32)
        patch = jnp.einsum("jw,iwc->ijc", wx, patch,
                           preferred_element_type=jnp.float32)

    coords = jnp.concatenate([pos - sample_sz / 2, pos + sample_sz / 2])
    return patch, coords


def sample_patch_multiscale(im: jnp.ndarray, pos: jnp.ndarray, scales: jnp.ndarray,
                            base_sz: jnp.ndarray, output_sz: Tuple[int, int],
                            mode: str = "replicate", max_scale_change=None,
                            aa_taps: int = 2, im_sz=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Patches at multiple scales (reference preprocessing.py:33-52): scales (S,) traced,
    returns (S, oh, ow, C) and coords (S, 4)."""
    fn = lambda s: sample_patch(im, pos, s * base_sz, output_sz, mode=mode,
                                max_scale_change=max_scale_change, aa_taps=aa_taps,
                                im_sz=im_sz)
    return jax.vmap(fn)(jnp.atleast_1d(jnp.asarray(scales, jnp.float32)))


def patch_to_image(patch_pos: jnp.ndarray, coords: jnp.ndarray,
                   output_sz: Tuple[int, int]) -> jnp.ndarray:
    """Map (y, x) positions in patch pixel units to image coordinates using the coords
    returned by sample_patch. patch_pos (..., 2)."""
    tl = coords[..., :2]
    sz = coords[..., 2:] - coords[..., :2]
    out = jnp.asarray(output_sz, jnp.float32)
    return tl + (patch_pos + 0.5) / out * sz


def image_to_patch(im_pos: jnp.ndarray, coords: jnp.ndarray,
                   output_sz: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of patch_to_image."""
    tl = coords[..., :2]
    sz = coords[..., 2:] - coords[..., :2]
    out = jnp.asarray(output_sz, jnp.float32)
    return (im_pos - tl) * out / sz - 0.5
