"""First-frame augmentations for tracker initialization — batched, on-device.

Re-design of reference `pytracking/features/augmentation.py` (Identity:39,
FlipHorizontal:44, Translation:60, Scale:72, Rotate:111, Blur:128) for the DiMP/ATOM
`generate_init_samples` path (`pytracking/tracker/dimp/dimp.py:329-397`).

The reference applies each transform to an expanded patch on the CPU (cv2/torch) one at
a time. Here every transform is a static descriptor (angle/shift/flip/blur sigma are
tracker params, known at trace time), realized as a bilinear affine warp of the expanded
patch plus optional separable Gaussian blur; the whole augmented batch is produced by one
traced loop that XLA fuses — it runs inside the jitted `initialize` step.

Conventions: expanded patch (He, We, C); each transform produces (H, W, C) where (H, W)
is the tracker's image_sample_size. `shift` is (dy, dx) pixels applied to the output crop
(like the reference's `crop_to_output` shift, augmentation.py:20-35).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytracking_tpu.ops.patch import bilinear_sample


@dataclass(frozen=True)
class AugTransform:
    """Static descriptor of one init-frame augmentation."""
    kind: str = "identity"            # identity|fliplr|flipud|rotate|scale|blur
    shift: Tuple[float, float] = (0.0, 0.0)   # (dy, dx) output shift in pixels
    angle: float = 0.0                # degrees, for rotate
    scale: float = 1.0                # for scale
    blur_sigma: Tuple[float, float] = (0.0, 0.0)


def _gauss_kernel1d(sigma: float) -> np.ndarray:
    ksz = int(math.ceil(2 * sigma))
    x = np.arange(-ksz, ksz + 1, dtype=np.float32)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def gaussian_blur(im: jnp.ndarray, sigma: Tuple[float, float]) -> jnp.ndarray:
    """Separable Gaussian blur of (H, W, C) with static sigma, 'same' zero-pad then
    renormalized at the borders to match the reference's conv-with-padding behaviour
    closely enough for augmentation purposes (reference augmentation.py:128-147)."""
    out = im
    for axis, s in enumerate(sigma):
        if s <= 0:
            continue
        k = jnp.asarray(_gauss_kernel1d(float(s)))
        n = k.shape[0]
        if axis == 0:
            kern = k.reshape(n, 1, 1, 1)
        else:
            kern = k.reshape(1, n, 1, 1)
        C = im.shape[-1]
        kern = jnp.tile(kern, (1, 1, 1, C))
        out = jax.lax.conv_general_dilated(
            out[None], kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)[0]
    return out


def apply_transform(patch: jnp.ndarray, t: AugTransform,
                    output_sz: Tuple[int, int]) -> jnp.ndarray:
    """Apply one augmentation to the expanded patch and center-crop (with shift) to
    output_sz. patch (He, We, C) -> (H, W, C)."""
    He, We = patch.shape[0], patch.shape[1]
    H, W = output_sz
    cy, cx = (He - 1) / 2.0, (We - 1) / 2.0

    # output pixel grid, centered crop with shift (reference crop_to_output pads with
    # floor/ceil of (output - input)/2 plus shift; for He >= H this is a crop)
    ys = jnp.arange(H, dtype=jnp.float32) + (He - H) / 2.0 - t.shift[0]
    xs = jnp.arange(W, dtype=jnp.float32) + (We - W) / 2.0 - t.shift[1]
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    if t.kind == "fliplr":
        xx = (We - 1) - xx
    elif t.kind == "flipud":
        yy = (He - 1) - yy
    elif t.kind == "rotate":
        a = math.pi * t.angle / 180.0
        dy, dx = yy - cy, xx - cx
        # inverse rotation of the sampling grid (reference Rotate augmentation.py:111-125)
        yy = cy + (-math.sin(a)) * dx + math.cos(a) * dy
        xx = cx + math.cos(a) * dx + math.sin(a) * dy
    elif t.kind == "scale":
        # reference Scale resizes by 1/scale_factor about the center (augmentation.py:72-95)
        yy = cy + (yy - cy) * t.scale
        xx = cx + (xx - cx) * t.scale

    src = patch
    if t.kind == "blur":
        src = gaussian_blur(patch, t.blur_sigma)
    return bilinear_sample(src, yy, xx)


def build_transforms(augmentation: dict, sample_sz: Tuple[int, int],
                     random_shift_factor: float = 0.0,
                     rng: Optional[np.random.RandomState] = None,
                     global_shift: Tuple[float, float] = (0.0, 0.0)) -> list:
    """Build the static augmentation list from a params dict like the reference's
    `params.augmentation` (dimp.py:370-388): keys 'fliplr', 'rotate', 'blur', 'shift',
    'relativeshift', 'scale'. Random shifts are drawn host-side once per sequence
    (they are static w.r.t. the jitted init trace)."""
    rng = rng or np.random.RandomState(0)

    def rand_shift():
        if random_shift_factor <= 0:
            return tuple(global_shift)
        s = ((rng.rand(2) - 0.5) * np.asarray(sample_sz) * random_shift_factor
             + np.asarray(global_shift))
        return (float(int(s[0])), float(int(s[1])))

    transforms = [AugTransform("identity", shift=tuple(global_shift))]
    if "shift" in augmentation:
        for sh in augmentation["shift"]:
            transforms.append(AugTransform("identity",
                                           shift=(sh[0] + global_shift[0],
                                                  sh[1] + global_shift[1])))
    if "relativeshift" in augmentation:
        for sh in augmentation["relativeshift"]:
            abs_sh = (float(int(sh[0] * sample_sz[0] / 2)),
                      float(int(sh[1] * sample_sz[1] / 2)))
            transforms.append(AugTransform("identity",
                                           shift=(abs_sh[0] + global_shift[0],
                                                  abs_sh[1] + global_shift[1])))
    if augmentation.get("fliplr", False):
        transforms.append(AugTransform("fliplr", shift=rand_shift()))
    for sigma in augmentation.get("blur", []):
        s = (sigma, sigma) if isinstance(sigma, (int, float)) else tuple(sigma)
        transforms.append(AugTransform("blur", shift=rand_shift(), blur_sigma=s))
    for sc in augmentation.get("scale", []):
        transforms.append(AugTransform("scale", shift=rand_shift(), scale=float(sc)))
    for ang in augmentation.get("rotate", []):
        transforms.append(AugTransform("rotate", shift=rand_shift(), angle=float(ang)))
    return transforms


def apply_all(patch: jnp.ndarray, transforms: Sequence[AugTransform],
              output_sz: Tuple[int, int]) -> jnp.ndarray:
    """Apply every transform; returns (T, H, W, C). The Python loop unrolls at trace
    time into one fused XLA computation (the transform list is static)."""
    return jnp.stack([apply_transform(patch, t, output_sz) for t in transforms])


def dropout2d(feat: jnp.ndarray, key: jax.Array, num: int, prob: float) -> jnp.ndarray:
    """Channel dropout of the first feature sample, replicated `num` times with
    independent masks — the reference's dropout augmentation on classification features
    (dimp.py:543-547). feat (T, H, W, C) -> (num, H, W, C)."""
    C = feat.shape[-1]
    keep = jax.random.bernoulli(key, 1.0 - prob, (num, 1, 1, C)).astype(feat.dtype)
    return feat[0:1] * keep / (1.0 - prob)
