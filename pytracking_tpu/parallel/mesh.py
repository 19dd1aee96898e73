"""Device-mesh construction and sharded training steps.

The reference's only training parallelism is single-process `nn.DataParallel` over the
sequence axis (`ltr/admin/multigpu.py:8`, batches stacked at dim 1). The TPU-native
equivalent: a `jax.sharding.Mesh` with a "data" axis; batches are sharded over the
sequence (S) axis with `NamedSharding`, parameters are replicated, and XLA inserts the
gradient `psum` over ICI automatically when the jitted step computes a mean loss.
An optional "model" axis is plumbed through for tensor-parallel sharding of the widest
layers (these models are small — DP is the meaningful axis, matching the reference).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build an (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 1) -> Callable:
    """NamedSharding that shards the given axis (the sequence axis, dim 1 — matching
    the reference's DataParallel(dim=1)) over the mesh's data axis."""

    def shard_one(x):
        if not hasattr(x, "ndim") or x.ndim <= batch_axis:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        return NamedSharding(mesh, P(*spec))

    return shard_one


def shard_batch(mesh: Mesh, batch, batch_axis: int = 1):
    """Device-put a host batch with the sequence axis sharded over the data axis."""
    shardings = jax.tree_util.tree_map(batch_sharding(mesh, batch_axis), batch)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), batch, shardings)


def make_train_step(actor, optimizer) -> Callable:
    """Build the jitted data-parallel train step: value_and_grad of the actor, optax
    update. Under a mesh, shard the batch with `shard_batch`; params replicate and XLA
    all-reduces the grads over ICI."""

    def train_step(params, batch_stats, opt_state, batch):
        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            actor, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, loss, stats

    return jax.jit(train_step, donate_argnums=(0, 2))
