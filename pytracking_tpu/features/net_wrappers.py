"""Network wrappers: lazy checkpoint loading + backbone preprocessing.

Re-design of reference `pytracking/features/net_wrappers.py` (NetWrapper:5,
NetWithBackbone:41): in JAX the "network" is (module, variables), so the wrapper
carries both and exposes `apply`/method passthroughs; loading is lazy so parameter
files can build TrackerSpecs without touching disk until first use.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


class NetWrapper:
    """Lazy (module, variables) holder (reference net_wrappers.py:5-37). Attribute
    access falls through to the flax module once loaded."""

    def __init__(self, net_path: str, initialize: bool = False, **kwargs):
        self.net_path = net_path
        self.net = None
        self.variables = None
        self.net_kwargs = kwargs
        if initialize:
            self.initialize()

    def __getattr__(self, name):
        net = object.__getattribute__(self, "__dict__").get("net")
        if net is None:
            raise AttributeError(name)
        return getattr(net, name)

    def load_network(self):
        from pytracking_tpu.utils.loading import load_network

        self.net, self.variables = load_network(self.net_path, **self.net_kwargs)

    def initialize(self):
        if self.net is None:
            self.load_network()

    def apply(self, *args, method=None, **kwargs):
        self.initialize()
        return self.net.apply(self.variables, *args, method=method, **kwargs)


class NetWithBackbone(NetWrapper):
    """Wrapper for nets exposing `extract_backbone` (reference net_wrappers.py:41-75):
    handles [0,255] -> normalized conversion and channel order."""

    def __init__(self, net_path: str, initialize: bool = False,
                 image_format: str = "rgb",
                 mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
                 std: Tuple[float, ...] = (0.229, 0.224, 0.225), **kwargs):
        super().__init__(net_path, initialize, **kwargs)
        self.image_format = image_format
        self._mean = jnp.asarray(mean).reshape(1, 1, 1, -1)
        self._std = jnp.asarray(std).reshape(1, 1, 1, -1)

    def preprocess_image(self, im: jnp.ndarray) -> jnp.ndarray:
        """im (B, H, W, 3) float in [0, 255] -> normalized (reference :56-68)."""
        im = jnp.asarray(im, jnp.float32)
        if self.image_format in ("rgb", "bgr"):
            im = im / 255.0
        if self.image_format in ("bgr", "bgr255"):
            im = im[..., ::-1]
        return (im - self._mean) / self._std

    def extract_backbone(self, im: jnp.ndarray):
        """Backbone features for a [0,255] image batch (reference :70-75). The model
        zoo nets normalize internally (models/backbones/resnet.py normalize_image),
        so this passes raw [0,255] through the module's extract_backbone."""
        self.initialize()
        return self.net.apply(self.variables, im,
                              method=lambda m, x: m.extract_backbone(x))
