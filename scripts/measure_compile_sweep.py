"""Measure XLA compile behavior across a heterogeneous-shape eval sweep
(VERDICT r3 item 3).

The reference's Python trackers pay zero compile (running.py:138 runs cold);
our jitted track step compiles per (image shape, static sample size). This
script quantifies that cost on a realistic sweep and verifies the persistent
compilation cache actually amortizes it across processes.

Usage:
  python scripts/measure_compile_sweep.py            # CPU backend, tiny DiMP
  python scripts/measure_compile_sweep.py --tpu      # default (TPU) backend
  python scripts/measure_compile_sweep.py --cache-check   # two-process cache test

Outputs one JSON line:
  {"sweep_sequences": N, "distinct_shapes": K, "xla_compiles": C,
   "compile_seconds": S, "track_seconds": T}
"""

import argparse
import json
import logging
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# image-size buckets modeled on LaSOT's distribution (it mixes 720p/480p/etc.)
SWEEP_SHAPES = [(360, 640), (480, 854), (720, 1280), (240, 320), (480, 640),
                (360, 480), (576, 1024), (404, 720)]
N_SEQ = 16
N_FRAMES = 5


class CompileCounter(logging.Handler):
    """Counts 'Finished XLA compilation of <name> in <secs> sec' records."""

    _pat = re.compile(r"Finished XLA compilation of (.+) in ([0-9.]+) sec")

    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        m = self._pat.search(record.getMessage())
        if m:
            self.events.append((m.group(1), float(m.group(2))))

    @property
    def count(self):
        return len(self.events)

    @property
    def seconds(self):
        return sum(d for _, d in self.events)


def run_sweep(use_cpu: bool):
    if use_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_log_compiles", True)

    import numpy as np
    import jax.numpy as jnp

    from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker

    if use_cpu:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from test_dimp_tracker import tiny_dimpnet
        net = tiny_dimpnet()
        params = DiMPParams(
            image_sample_size=96, kernel_size=4, sample_memory_size=8,
            net_opt_iter=2, net_opt_update_iter=1, net_opt_hn_iter=1,
            train_skipping=3, augmentation=(("fliplr", True),),
            num_init_random_boxes=2, box_refinement_iter=2, iounet_k=2)
        s = 96
    else:
        from pytracking_tpu.parameter.dimp.dimp50 import parameters
        spec = parameters()
        net, params = spec.net, spec.params
        s = params.image_sample_size

    dummy = jnp.zeros((1, 1, s, s, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    if use_cpu:
        variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                             train=False)
    else:
        variables = parameters().variables

    counter = CompileCounter()
    logging.getLogger("jax._src.dispatch").addHandler(counter)

    rng = np.random.default_rng(0)
    tracker = DiMPTracker(params, net, variables)
    t0 = time.time()
    shapes_used = []
    for i in range(N_SEQ):
        h, w = SWEEP_SHAPES[i % len(SWEEP_SHAPES)]
        shapes_used.append((h, w))
        frame = (rng.random((h, w, 3)) * 60).astype(np.uint8)
        cy, cx = h // 2, w // 2
        frame[cy - 20:cy + 20, cx - 20:cx + 20] = 220
        tracker.initialize(frame, {"init_bbox": [cx - 20, cy - 20, 40, 40]})
        for t in range(1, N_FRAMES):
            f = np.roll(frame, (2 * t, 3 * t), axis=(0, 1))
            tracker.track(f)
    total = time.time() - t0

    out = {"sweep_sequences": N_SEQ,
           "distinct_shapes": len(set(shapes_used)),
           "xla_compiles": counter.count,
           "compile_seconds": round(counter.seconds, 2),
           "track_seconds": round(total, 2)}
    print(json.dumps(out))
    return out


def cache_check():
    """Run the sweep in two fresh subprocesses sharing a compilation-cache dir;
    the second must report (near-)zero compile seconds."""
    cache_dir = tempfile.mkdtemp(prefix="ptpu_cache_")
    env = dict(os.environ, PYTRACKING_TPU_CACHE_DIR=cache_dir,
               PYTRACKING_TPU_COMPILATION_CACHE="1")
    results = []
    for run in range(2):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-sweep-only"],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(f"run {run}: {line}")
    r0, r1 = results
    speedup = r0["compile_seconds"] / max(r1["compile_seconds"], 1e-9)
    hit = r1["compile_seconds"] < 0.25 * r0["compile_seconds"]
    print(json.dumps({"cache_dir": cache_dir,
                      "first_compile_seconds": r0["compile_seconds"],
                      "second_compile_seconds": r1["compile_seconds"],
                      "cache_hit": bool(hit),
                      "speedup": round(speedup, 1)}))
    return hit


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="use the default (TPU) backend and real DiMP-50")
    ap.add_argument("--cache-check", action="store_true")
    ap.add_argument("--cpu-sweep-only", action="store_true",
                    help="(internal) child process for --cache-check")
    ap.add_argument("--buckets", default=None,
                    help="set PYTRACKING_TPU_SHAPE_BUCKETS for this sweep "
                         "(0 disables bucket padding; default keeps the env)")
    args = ap.parse_args()
    if args.buckets is not None:
        os.environ["PYTRACKING_TPU_SHAPE_BUCKETS"] = args.buckets
    if args.cache_check:
        ok = cache_check()
        sys.exit(0 if ok else 1)
    run_sweep(use_cpu=not args.tpu)
