"""A/B the bench.py measurement path with per-phase timings.

Reproduces exactly what bench.py measures (DiMP-50, synthetic 480x640 frames,
scan over the fused _track_impl) but reports each phase separately so a
regression can be localized:

  - initialize() wall (compile-dominated)
  - first track() wall (split-dispatch compiles at HEAD, fused at r03)
  - fused single-step compile wall (tracker._jit_track lower+compile)
  - scan compile wall
  - steady-state scan ms/frame (the headline)

Run from any git revision that has the DiMP host API:
  PYTHONPATH=<checkout> python scripts/ab_scan.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.evaluation.adapters.synthetic import (
        render_synthetic_frame, synthetic_gt_center)
    from pytracking_tpu.parameter.dimp.dimp50 import parameters
    from pytracking_tpu.trackers.dimp import DiMPTracker

    spec = parameters()
    tracker = DiMPTracker(spec.params, spec.net, spec.variables)

    H, W = 480, 640
    n_frames = 104
    frames = [render_synthetic_frame(0, t, H, W) for t in range(n_frames)]
    cy, cx, sz = synthetic_gt_center(0, 0, H, W)

    t0 = time.time()
    tracker.initialize(frames[0], {"init_bbox": [cx - sz / 2, cy - sz / 2, sz, sz]})
    print(f"phase initialize: {time.time() - t0:.1f}s", flush=True)

    for t in range(1, 4):
        t0 = time.time()
        tracker.track(frames[t])
        print(f"phase track[{t}]: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    single_compiled = tracker._jit_track.lower(
        tracker.variables, tracker.state, jnp.asarray(frames[4])).compile()
    print(f"phase fused-single compile: {time.time() - t0:.1f}s", flush=True)

    frame_stack = jax.device_put(jnp.stack([jnp.asarray(f) for f in frames[24:]]))
    jax.block_until_ready(frame_stack)

    def scan_fn(variables, st, fs):
        prev = tracker.variables
        tracker.variables = variables
        try:
            return jax.lax.scan(tracker._track_impl, st, fs)
        finally:
            tracker.variables = prev

    step = jax.jit(scan_fn)
    t0 = time.time()
    state, outs = step(tracker.variables, tracker.state, frame_stack)
    jax.block_until_ready((state, outs))
    print(f"phase scan compile+run: {time.time() - t0:.1f}s", flush=True)

    n_steps = frame_stack.shape[0]
    for rep in range(3):
        t0 = time.time()
        state, outs = step(tracker.variables, state, frame_stack)
        jax.block_until_ready((state, outs))
        elapsed = time.time() - t0
        print(f"scan rep{rep}: {1000 * elapsed / n_steps:.3f} ms/frame "
              f"({n_steps / elapsed:.0f} FPS)", flush=True)


if __name__ == "__main__":
    main()
