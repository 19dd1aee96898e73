"""Classic feature-extraction stack for correlation-filter trackers.

Re-design of reference `pytracking/features/featurebase.py` (FeatureBase:6,
MultiFeatureBase:72), `features/color.py` (RGB:5, Grayscale:17), `features/util.py`
(Concatenate:5) and `features/extractor.py` (MultiResolutionExtractor:49): feature
objects expose `stride()`, `dim()` and `extract(patches)`; the extractor crops patches
(ops/patch) and runs every feature. The deep features live in the model zoo
(ResNet/Swin backbones) — `DeepFeature` wraps a backbone layer in this interface.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pytracking_tpu.ops.patch import sample_patch


class FeatureBase:
    """One feature type (reference featurebase.py:6-70): optional pooling + power
    normalization in get_feature."""

    def __init__(self, pool_stride: int = 1, normalize_power: Optional[int] = None,
                 use_for_color: bool = True, use_for_gray: bool = True):
        self.pool_stride = pool_stride
        self.normalize_power = normalize_power

    def stride(self) -> int:
        raise NotImplementedError

    def dim(self) -> int:
        raise NotImplementedError

    def extract(self, im_patches: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def get_feature(self, im_patches: jnp.ndarray) -> jnp.ndarray:
        f = self.extract(im_patches)
        if self.pool_stride > 1:
            f = jax.lax.reduce_window(
                f, 0.0, jax.lax.add,
                (1, self.pool_stride, self.pool_stride, 1),
                (1, self.pool_stride, self.pool_stride, 1), "VALID") / \
                (self.pool_stride ** 2)
        if self.normalize_power is not None:
            p = self.normalize_power
            n = (jnp.abs(f) ** p).sum(axis=(1, 2, 3), keepdims=True)
            f = f * ((f.shape[1] * f.shape[2] * f.shape[3] / n) ** (1 / p))
        return f


class RGB(FeatureBase):
    """Normalized RGB values (reference color.py:5-14)."""

    def stride(self):
        return self.pool_stride

    def dim(self):
        return 3

    def extract(self, im_patches):
        return im_patches / 255.0 - 0.5


class Grayscale(FeatureBase):
    """Grayscale values (reference color.py:17-26)."""

    def stride(self):
        return self.pool_stride

    def dim(self):
        return 1

    def extract(self, im_patches):
        w = jnp.array([0.299, 0.587, 0.114])
        return (im_patches @ w)[..., None] / 255.0 - 0.5


class Concatenate(FeatureBase):
    """Concatenate several features with equal stride (reference util.py:5-42)."""

    def __init__(self, features: Sequence[FeatureBase], **kwargs):
        super().__init__(**kwargs)
        self.features = list(features)

    def stride(self):
        return self.features[0].stride()

    def dim(self):
        return sum(f.dim() for f in self.features)

    def extract(self, im_patches):
        return jnp.concatenate([f.extract(im_patches) for f in self.features],
                               axis=-1)


class DeepFeature(FeatureBase):
    """A backbone layer as a classic feature (reference features/deep.py:15-220)."""

    def __init__(self, net, variables, layer: str, layer_stride: int, layer_dim: int,
                 **kwargs):
        super().__init__(**kwargs)
        self.net = net
        self.variables = variables
        self.layer = layer
        self._stride = layer_stride
        self._dim = layer_dim

    def stride(self):
        return self._stride * self.pool_stride

    def dim(self):
        return self._dim

    def extract(self, im_patches):
        feats = self.net.apply(self.variables, im_patches,
                               method=lambda m, x: m.extract_backbone(x))
        return feats[self.layer]


class MultiResolutionExtractor:
    """Crop patches and run every feature (reference extractor.py:49-143)."""

    def __init__(self, features: Sequence[FeatureBase]):
        self.features = list(features)

    def stride(self) -> List[int]:
        return [f.stride() for f in self.features]

    def dim(self) -> List[int]:
        return [f.dim() for f in self.features]

    def size(self, input_sz) -> List[Tuple[int, int]]:
        return [(int(input_sz[0]) // f.stride(), int(input_sz[1]) // f.stride())
                for f in self.features]

    def extract(self, im: jnp.ndarray, pos, scales, image_sz) -> List[jnp.ndarray]:
        """im (H, W, C); scales (S,); returns per-feature (S, h, w, C_f)."""
        scales = jnp.atleast_1d(jnp.asarray(scales, jnp.float32))
        base = jnp.asarray(image_sz, jnp.float32)
        patches = jax.vmap(
            lambda s: sample_patch(im, pos, s * base,
                                   (int(image_sz[0]), int(image_sz[1])))[0])(scales)
        return [f.get_feature(patches) for f in self.features]


class SingleResolutionExtractor(MultiResolutionExtractor):
    """All features share one stride (reference extractor.py:18-46): the per-scale
    patches are extracted once and every feature's maps are concatenated."""

    def stride(self) -> int:
        return self.features[0].stride()

    def size(self, input_sz):
        s = self.stride()
        return (int(input_sz[0]) // s, int(input_sz[1]) // s)

    def extract(self, im, pos, scales, image_sz):
        feats = super().extract(im, pos, scales, image_sz)
        return jnp.concatenate(feats, axis=-1)
