"""Network variable initialization / checkpoint loading.

Re-design of reference `ltr/admin/loading.py` (load_network:35): checkpoints carry their
own constructor config so a net can be rebuilt without the recipe. Here a checkpoint is
a msgpack-serialized flax variable tree plus a JSON config sidecar; `load_network`
rebuilds via the named constructor in `pytracking_tpu.models.tracking`.
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_network(path: str, variables, constructor_module: str, constructor_name: str,
                 constructor_kwargs: dict):
    """Atomic save of variables + self-describing constructor config
    (reference base_trainer.py:95-125 keeps the pickled constructor; we keep JSON)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.to_bytes(variables)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta = {"constructor_module": constructor_module,
            "constructor_name": constructor_name,
            "constructor_kwargs": constructor_kwargs}
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_network(path: str, **kwarg_overrides) -> Tuple[Any, Any]:
    """Rebuild the net from the checkpoint's stored constructor and load variables
    (reference admin/loading.py:35-117)."""
    with open(path + ".json") as f:
        meta = json.load(f)
    kwargs = dict(meta["constructor_kwargs"])
    kwargs.update(kwarg_overrides)
    mod = importlib.import_module(meta["constructor_module"])
    net = getattr(mod, meta["constructor_name"])(**kwargs)
    with open(path, "rb") as f:
        blob = f.read()
    # build a target template lazily: caller must init if structure unknown; we use
    # from_bytes against None-template via msgpack restore
    variables = serialization.msgpack_restore(blob)
    return net, variables


def init_variables(net, example_inputs, seed: int = 0):
    """Initialize flax variables with a representative forward.

    Runs on the CPU backend: init is one-time shape/param materialization, and
    compiling a full training forward through a remote TPU compile service just to
    initialize (e.g. LWL at 480x832 took ~9 min through the axon tunnel) is pure
    waste. Parameter values depend only on the RNG, not the device."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return net.init(jax.random.PRNGKey(seed), *example_inputs, train=False)
    return net.init(jax.random.PRNGKey(seed), *example_inputs, train=False)


def load_or_init_variables(net, example_inputs, cache_path: Optional[str] = None,
                           seed: int = 0):
    """Load variables from cache_path if present, else init (and cache).

    A cached tree whose structure/shapes no longer match the net (the
    architecture gained parameters since the cache was written) is discarded
    and re-initialized — the expected structure comes from jax.eval_shape, so
    the check costs no real compute."""
    if cache_path and os.path.isfile(cache_path):
        with open(cache_path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        try:
            import functools

            import jax
            expected = jax.eval_shape(
                functools.partial(init_variables, net, example_inputs, seed))
            same_structure = (jax.tree_util.tree_structure(expected)
                              == jax.tree_util.tree_structure(restored))
            same_shapes = same_structure and all(
                tuple(a.shape) == tuple(b.shape)
                for a, b in zip(jax.tree_util.tree_leaves(expected),
                                jax.tree_util.tree_leaves(restored)))
        except Exception:
            same_shapes = True   # can't validate — keep the cache
        if same_shapes:
            return restored
    variables = init_variables(net, example_inputs, seed)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(variables))
        os.replace(tmp, cache_path)
    return variables


def maybe_bf16_variables(variables):
    """End-to-end bf16 opt-in (PYTRACKING_TPU_BF16=1): store every float32
    parameter/stat as bfloat16, halving the per-frame weight HBM traffic across
    backbone, heads, and meta-optimizer constants. Modules with an explicit
    bf16 compute dtype then run fully bf16; the rest promote bf16 params with
    f32 activations to f32 compute (weight loads still halved). Combine with
    PYTRACKING_TPU_BF16_BACKBONE semantics by setting the net's backbone_dtype
    where the parameter file builds the model."""
    if os.environ.get("PYTRACKING_TPU_BF16", "0") != "1":
        return variables
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
