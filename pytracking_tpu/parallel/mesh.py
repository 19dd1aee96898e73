"""Device-mesh construction and sharded training steps.

The reference's only training parallelism is single-process `nn.DataParallel` over the
sequence axis (`ltr/admin/multigpu.py:8`, batches stacked at dim 1). The TPU-native
equivalent: a `jax.sharding.Mesh` with a "data" axis; batches are sharded over the
sequence (S) axis with `NamedSharding`, parameters are replicated, and XLA inserts the
gradient `psum` over ICI automatically when the jitted step computes a mean loss.
A "model" axis provides FSDP-style (ZeRO-3) parameter sharding via `shard_params`:
large leaves shard over the axis, XLA inserts all-gather/reduce-scatter over ICI.
These models are small enough that DP alone suffices on one host — the model axis
exists for multi-host meshes where per-chip HBM holds the optimizer state shard.
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


def param_sharding(mesh: Mesh, params, axis: str = "model",
                   min_size: int = 2 ** 12):
    """FSDP-style parameter sharding over the mesh's model axis: each large leaf is
    sharded along its largest `axis`-divisible dimension; small leaves replicate.
    XLA inserts the all-gather where a sharded leaf feeds an unsharded computation
    and the matching reduce-scatter in the backward pass — the ZeRO-3 recipe, over
    ICI, with no manual collectives."""
    n = mesh.shape[axis]

    def one(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(one, params)


def shard_params(mesh: Mesh, params, axis: str = "model",
                 min_size: int = 2 ** 12):
    """Device-put parameters with FSDP sharding over the model axis."""
    sh = param_sharding(mesh, params, axis, min_size)
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), params, sh)


def make_batched_eval_step(step_fn) -> Callable:
    """Eval-time device parallelism: vmap a per-sequence jitted tracker step
    (variables, state, frame) -> (state, out) over a leading batch of sequences.
    Under a mesh, shard the stacked state/frames with `shard_batch(batch_axis=0)`
    so each device advances its own shard of sequences — N sequences per step on
    N chips, parameters replicated, zero cross-device traffic in steady state."""
    return jax.jit(jax.vmap(step_fn, in_axes=(None, 0, 0)))


def replicated_shardings(mesh: Mesh, params):
    """A params-shaped tree of fully-replicated NamedShardings."""
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)


def make_train_step(actor, optimizer, gather_shardings=None) -> Callable:
    """Build the jitted train step: value_and_grad of the actor, optax update.

    Pure DP: shard the batch with `shard_batch`; params replicate and XLA
    all-reduces the grads over ICI.

    FSDP (params stored sharded via `shard_params`): pass
    `gather_shardings=replicated_shardings(mesh, params)`. The step then
    constrains params to replicated before the forward pass — an all-gather over
    ICI — and the constraint's transpose reduce-scatters the gradients back to
    the parameter sharding, so the optimizer state and update stay sharded
    (ZeRO-style; convolutions always see full kernels, which XLA's SPMD conv
    partitioner requires)."""

    def train_step(params, batch_stats, opt_state, batch):
        def actor_fn(p, bs, b):
            if gather_shardings is not None:
                p = jax.lax.with_sharding_constraint(p, gather_shardings)
            return actor(p, bs, b)

        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            actor_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, loss, stats

    return jax.jit(train_step, donate_argnums=(0, 2))
