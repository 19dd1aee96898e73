"""Benchmark: DiMP-50 tracker FPS on one TPU chip.

Runs the full jitted DiMP-50 per-frame track step (backbone + classify + advanced
localization + IoU-Net box refinement + memory/classifier updates) over a synthetic
sequence at the reference's operating point (image_sample_size=288, memory 50,
ResNet-50), and reports steady-state FPS.

Baseline: the reference repo publishes no FPS (BASELINE.md); the DiMP paper reports
~43 FPS for DiMP-50 on an NVIDIA GTX 1080 GPU — used as `vs_baseline` denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


REFERENCE_GPU_FPS = 43.0  # DiMP paper (ICCV 2019), DiMP-50 on GTX 1080


def main():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.evaluation.adapters.synthetic import (render_synthetic_frame,
                                                              synthetic_gt_center)
    from pytracking_tpu.parameter.dimp.dimp50 import parameters
    from pytracking_tpu.trackers.dimp import DiMPTracker

    spec = parameters()
    tracker = DiMPTracker(spec.params, spec.net, spec.variables)

    H, W = 480, 640
    frames = [render_synthetic_frame(0, t, H, W) for t in range(40)]
    cy, cx, sz = synthetic_gt_center(0, 0, H, W)

    t0 = time.time()
    tracker.initialize(frames[0], {"init_bbox": [cx - sz / 2, cy - sz / 2, sz, sz]})
    init_time = time.time() - t0

    # warmup: compile the track step (+ all lax.switch branches)
    for t in range(1, 4):
        tracker.track(frames[t])

    # steady state, pipelined: dispatch frame t, then fetch frame t-1's output —
    # JAX async dispatch overlaps the device round-trip with the next upload
    t0 = time.time()
    n = 0
    prev = None
    for t in range(4, len(frames)):
        h = tracker.track_async(frames[t])
        if prev is not None:
            tracker.fetch_output(prev)
        prev = h
        n += 1
    tracker.fetch_output(prev)
    elapsed = time.time() - t0
    fps = n / elapsed

    print(json.dumps({
        "metric": "dimp50_tracker_fps_single_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
