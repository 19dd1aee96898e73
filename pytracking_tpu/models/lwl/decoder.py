"""LWL segmentation decoder: TSE / CAB / RRB blocks + upsampler.

Re-design of reference `ltr/models/lwl/decoder.py` (TSE:17, CAB:35, RRB:57,
Upsampler:72, LWTLDecoder:87): the mask encoding from the target model is fused with
backbone features at each level (layer4→layer1), with channel-attention gating and
refinement, then upsampled to image resolution.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _interp(x: jnp.ndarray, size: Tuple[int, int], method: str = "bilinear"):
    if x.shape[-3] == size[0] and x.shape[-2] == size[1]:
        return x
    return jax.image.resize(x, x.shape[:-3] + (size[0], size[1], x.shape[-1]), method)


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """torch/OpenCV bicubic kernel (a = -0.75; jax.image's 'cubic' uses the Keys
    a = -0.5 kernel, which does NOT match torch F.interpolate)."""
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0, ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0,
        jnp.where(at < 2.0, (((at - 5.0) * at + 8.0) * at - 4.0) * a, 0.0))


def _bicubic_axis_weights(out_size: int, in_size: int) -> jnp.ndarray:
    """(out, in) weight matrix reproducing torch bicubic align_corners=False with
    clamped (replicate) borders. Static shapes -> computed at trace time."""
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    W = jnp.zeros((out_size, in_size), jnp.float32)
    rows = jnp.arange(out_size)
    for k in range(-1, 3):
        idx = i0 + k
        w = _cubic_kernel(src - idx.astype(jnp.float32))
        W = W.at[rows, jnp.clip(idx, 0, in_size - 1)].add(w)
    return W


def _bicubic_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """(..., H, W, C) -> (..., size[0], size[1], C), exact torch bicubic semantics,
    as two MXU matmuls (separable kernel)."""
    H, W = x.shape[-3], x.shape[-2]
    wy = _bicubic_axis_weights(size[0], H)
    wx = _bicubic_axis_weights(size[1], W)
    x = jnp.einsum("oh,...hwc->...owc", wy, x, preferred_element_type=jnp.float32)
    return jnp.einsum("pw,...owc->...opc", wx, x,
                      preferred_element_type=jnp.float32)


def _conv(oc, k, name=None):
    return nn.Conv(oc, (k, k), padding=[(k // 2, k // 2)] * 2, name=name)


class TSE(nn.Module):
    """Target-model-score / feature fusion (reference decoder.py:17-32)."""
    oc: int

    @nn.compact
    def __call__(self, ft, score, x=None):
        h = _conv(self.oc, 1, "reduce0")(ft)
        h = nn.leaky_relu(h, 0.0)
        h = _conv(self.oc, 1, "reduce1")(h)
        hpool = jnp.mean(h, axis=(-3, -2), keepdims=True) if x is None else x
        score_r = _interp(score, h.shape[-3:-1])
        h = jnp.concatenate([h, score_r], axis=-1)
        for i in range(2):
            h = _conv(h.shape[-1], 3, f"transform{i}")(h)
            h = nn.leaky_relu(h, 0.0)
        h = _conv(self.oc, 3, "transform2")(h)
        h = nn.leaky_relu(h, 0.0)
        return h, hpool


class CAB(nn.Module):
    """Channel-attention gating between decoder levels (reference decoder.py:35-54)."""
    oc: int
    deepest: bool = False

    @nn.compact
    def __call__(self, deeper, shallower):
        shallow_pool = jnp.mean(shallower, axis=(-3, -2), keepdims=True)
        deeper_pool = deeper if self.deepest else jnp.mean(deeper, axis=(-3, -2),
                                                           keepdims=True)
        gp = jnp.concatenate([shallow_pool, deeper_pool], axis=-1)
        a = _conv(self.oc, 1, "att0")(gp)
        a = nn.leaky_relu(a, 0.0)
        a = _conv(self.oc, 1, "att1")(a)
        gated = shallower * jax.nn.sigmoid(a)
        return gated + _interp(deeper, gated.shape[-3:-1])


class RRB(nn.Module):
    """Residual refinement block (reference decoder.py:57-69)."""
    oc: int
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv(self.oc, 1, "conv1x1")(x)
        b = _conv(self.oc, 3, "bb0")(h)
        if self.use_bn:
            b = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(b)
        b = nn.leaky_relu(b, 0.0)
        b = nn.Conv(self.oc, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="bb1")(b)
        return nn.relu(h + b)


class Upsampler(nn.Module):
    """2x bicubic + conv, then resize to image size (reference decoder.py:72-84)."""
    in_channels: int = 64

    @nn.compact
    def __call__(self, x, image_size: Tuple[int, int]):
        x = _bicubic_resize(x, (2 * x.shape[-3], 2 * x.shape[-2]))
        x = nn.relu(_conv(self.in_channels // 2, 3, "conv1")(x))
        x = _bicubic_resize(x, (image_size[0], image_size[1]))
        return _conv(1, 3, "conv2")(x)


class LWTLDecoder(nn.Module):
    """(reference decoder.py:87-160). ft_channels: ordered dict-like of
    layer→channels, deepest first (e.g. {'layer4': 2048, 'layer3': 1024, ...})."""
    in_channels: int = 1
    out_channels: int = 32
    ft_layers: Tuple[str, ...] = ("layer4", "layer3", "layer2", "layer1")
    use_bn: bool = True

    _OC = {"layer1": 1, "layer2": 2, "layer3": 2, "layer4": 4}

    @nn.compact
    def __call__(self, scores, features: Dict[str, jnp.ndarray],
                 image_size: Tuple[int, int], train: bool = False):
        """scores (B, h, w, K) mask encoding; features: layer -> (B, H_l, W_l, C_l).
        Returns (mask logits (B, H_im, W_im, 1), dict of decoder features)."""
        last_layer = "layer4" if "layer4" in self.ft_layers else "layer3"
        x = None
        outputs = {}
        for L in self.ft_layers:
            ft = features[L]
            s = _interp(scores, ft.shape[-3:-1])
            if x is not None:
                x = _conv(self._OC[L] * self.out_channels, 1, f"proj_{L}")(x)
                x = nn.leaky_relu(x, 0.0)
            oc = self._OC[L] * self.out_channels
            h, hpool = TSE(oc, name=f"TSE_{L}")(ft, s, x)
            h = RRB(oc, self.use_bn, name=f"RRB1_{L}")(h, train=train)
            h = CAB(oc, L == last_layer, name=f"CAB_{L}")(hpool, h)
            x = RRB(oc, self.use_bn, name=f"RRB2_{L}")(h, train=train)
            outputs[f"{L}_dec"] = x
        mask = Upsampler(self.out_channels, name="project")(x, image_size)
        return mask, outputs
