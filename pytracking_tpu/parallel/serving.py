"""Batched-sequence tracker serving: many independent video streams per chip.

The single-sequence tracker step relies on SCALAR `lax.switch`/`lax.cond`
predicates so XLA executes only the taken branch — the periodic classifier
optimizer (2 GN iterations over the 50-slot memory) costs nothing on the 19 of
20 frames that skip it. Under `jax.vmap` the predicate becomes a vector and a
batched conditional executes EVERY branch for EVERY stream on EVERY frame:
measured on one v5e chip, the naively vmapped DiMP-50 step is ~3.6 ms/stream
vs 0.9 ms unbatched — the amortization is gone.

This module restores it by splitting the step (SURVEY.md §2.10 "eval-time
parallelism"; there is no reference counterpart — the reference runs one
process per sequence):

  * per-frame: vmap of the LIGHT step (`params.defer_classifier_update=True`)
    — backbone, classify, localize, box refinement, memory write; no optimizer;
  * every `train_skipping` frames: one vmapped optimizer pass over each
    stream's memory (`DiMPTracker._update_classifier_deferred`). The cadence
    predicate lives on the HOST (all streams share frame_num), so the optimizer
    executable only runs when actually invoked.

With no hard negatives this is the exact reference cadence (the fused step's
periodic branch fires on the same frames); hard-negative updates are applied at
the next tick instead of immediately — the one semantic delta of the serving
path.

Works for the DiMP family (DiMP/PrDiMP/SuperDiMP and KYS, which subclass
DiMPTracker). Trackers without a deferred path run fully fused per frame.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BatchedTrackerServer:
    """Runs B independent sequences through ONE vmapped jitted step per frame.

    Usage:
        server = BatchedTrackerServer(tracker_cls, params, net, variables)
        server.initialize(frames, bboxes)       # lists of length B
        boxes = server.track(frame_batch)       # (B, H, W, 3) -> (B, 4)
    """

    def __init__(self, tracker_cls, params, net, variables, mesh=None,
                 bf16: Optional[bool] = None, **tracker_kwargs):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — the stream
        (batch) axis of the states and frame batches is sharded across it and
        the vmapped step runs SPMD over the mesh with NO collectives (streams
        are independent); variables are replicated. B must be divisible by the
        mesh's 'data' size. This is the multi-chip serving scale-out: the same
        server drives 8x the streams on an 8-chip pod slice.

        bf16: store all float32 parameters as bfloat16 — the SERVING DEFAULT
        since round 4 (+15% aggregate throughput; accuracy-gated at the
        whole-harness level in tests/test_bf16_harness_gate.py: dAUC -1.4 on
        the synthetic benchmark, within the f32-vs-reference tolerance).
        None reads PYTRACKING_TPU_SERVING_BF16 (default on); pass False for
        bit-level parity work against the single-stream f32 trackers."""
        import os

        if bf16 is None:
            bf16 = os.environ.get("PYTRACKING_TPU_SERVING_BF16", "1") == "1"
        if bf16:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables)
        if getattr(tracker_cls, "supports_deferred_classifier_update", False) \
                and hasattr(params, "defer_classifier_update"):
            params = dataclasses.replace(params, defer_classifier_update=True)
            self._deferred = True
        else:
            self._deferred = False
        self.tracker = tracker_cls(params, net, variables, **tracker_kwargs)
        self.params = params
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._shard_streams = NamedSharding(mesh, PartitionSpec("data"))
            self._replicated = NamedSharding(mesh, PartitionSpec())
            # variables replicated on every mesh device (they arrive committed
            # to device 0 from the tracker constructor)
            self.tracker.variables = jax.device_put(self.tracker.variables,
                                                    self._replicated)

        tracker = self.tracker

        def step_fn(variables, state, frame):
            prev = tracker.variables
            tracker.variables = variables
            try:
                return tracker._track_impl(state, frame)
            finally:
                tracker.variables = prev

        def update_fn(variables, state):
            prev = tracker.variables
            tracker.variables = variables
            try:
                return tracker._update_classifier_deferred(state)
            finally:
                tracker.variables = prev

        self._jit_step = jax.jit(jax.vmap(step_fn, in_axes=(None, 0, 0)),
                                 donate_argnums=(1,))
        self._jit_update = jax.jit(jax.vmap(update_fn, in_axes=(None, 0)),
                                   donate_argnums=(1,)) if self._deferred else None
        self.states = None
        self._frame_num = 0

    # ------------------------------------------------------------------ host API

    def initialize(self, frames: List[np.ndarray], bboxes: List[list]):
        """Per-sequence init (each sequence may have its own first frame), then
        stack the states into one batched pytree."""
        states = []
        for frame, bbox in zip(frames, bboxes):
            self.tracker.initialize(frame, {"init_bbox": list(bbox)})
            states.append(self.tracker.state)
        self.states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        if self.mesh is not None:
            # commit the stream axis to the mesh; jit then compiles the step
            # SPMD ("computation follows sharding") — one program, all chips
            self.states = jax.device_put(self.states, self._shard_streams)
        self._frame_num = 1

    def track(self, frame_batch) -> np.ndarray:
        """frame_batch (B, H, W, 3) -> bboxes (B, 4) [x, y, w, h]."""
        self._frame_num += 1
        frame_batch = jnp.asarray(frame_batch)
        if self.mesh is not None:
            frame_batch = jax.device_put(frame_batch, self._shard_streams)
        self.states, out = self._jit_step(self.tracker.variables, self.states,
                                          frame_batch)
        if self._needs_update_tick():
            self.states = self._jit_update(self.tracker.variables, self.states)
        return np.asarray(out["target_bbox"])

    def scan_track(self, frame_batches):
        """Measurement/offline path: ONE jitted dispatch over (T, B, H, W, 3)
        frames — scan over frames with the update tick folded in as a scalar
        per-iteration predicate (scan carries the frame counter, the predicate
        is traced per-step but scalar, so only the taken branch executes)."""
        run = self._scan_runner()
        frame_batches = jnp.asarray(frame_batches)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            frame_batches = jax.device_put(
                frame_batches, NamedSharding(self.mesh,
                                             PartitionSpec(None, "data")))
        (self.states, n), boxes = run(self.tracker.variables, self.states,
                                      jnp.asarray(self._frame_num, jnp.int32),
                                      frame_batches)
        self._frame_num = int(n)
        return boxes

    def _scan_runner(self):
        """The jitted scan executable, built ONCE — rebuilding jax.jit per call
        would recompile (or reload from the compilation cache) every time."""
        if getattr(self, "_scan_run", None) is not None:
            return self._scan_run
        tracker = self.tracker
        skipping = int(getattr(self.params, "train_skipping", 20))
        deferred = self._deferred

        def step_fn(variables, state, frame):
            prev = tracker.variables
            tracker.variables = variables
            try:
                return tracker._track_impl(state, frame)
            finally:
                tracker.variables = prev

        def update_fn(variables, state):
            prev = tracker.variables
            tracker.variables = variables
            try:
                return tracker._update_classifier_deferred(state)
            finally:
                tracker.variables = prev

        def run_impl(v, st, n, fs):
            # v flows through the jit argument — closing over the real variables
            # would bake them into the HLO as constants
            def body(carry, frame):
                states, n_ = carry
                states, out = jax.vmap(step_fn, in_axes=(None, 0, 0))(v, states,
                                                                     frame)
                if deferred:
                    states = jax.lax.cond(
                        (n_ % skipping) == 0,
                        lambda s: jax.vmap(update_fn, in_axes=(None, 0))(v, s),
                        lambda s: s, states)
                return (states, n_ + 1), out["target_bbox"]

            return jax.lax.scan(body, (st, n), fs)

        self._scan_run = jax.jit(run_impl)
        return self._scan_run

    def _needs_update_tick(self) -> bool:
        if not self._deferred:
            return False
        skipping = int(getattr(self.params, "train_skipping", 20))
        # the fused step's periodic branch fires when (frame_num-1) % skipping
        # == 0 (dimp.py _update_classifier); frame_num was just incremented
        # on-device, self._frame_num mirrors it
        return (self._frame_num - 1) % skipping == 0
