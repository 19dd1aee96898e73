"""A/B the fused track step of one tracker variant under the current env.

Times ONLY the jitted full track step (state threaded, device-resident), n=100
after warmup, 3 repeats, and prints min/mean. Run twice with different env
(e.g. PYTRACKING_TPU_BF16=0/1) to compare precision modes.

Usage: python scripts/ab_step.py <family>/<param> [n]
  e.g. python scripts/ab_step.py tomp/tomp50 100
"""

import importlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "tomp/tomp50"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    family, param = target.split("/")
    mod = importlib.import_module(f"pytracking_tpu.parameter.{family}.{param}")
    spec = mod.parameters()
    trk_mod = importlib.import_module(f"pytracking_tpu.trackers.{family}")
    cls = next(getattr(trk_mod, c) for c in dir(trk_mod)
               if c.endswith("Tracker") and not c.startswith("Base"))
    tracker = cls(spec.params, spec.net, spec.variables)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0]})
    tracker.track(frame)
    tracker.track(frame)

    full = jax.jit(tracker._jit_track)
    im = jnp.asarray(frame)
    st, out = full(tracker.variables, tracker.state, im)
    jax.block_until_ready(out["target_bbox"])

    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            st, out = full(tracker.variables, st, im)
        jax.block_until_ready(out["target_bbox"])
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"{target} rep{rep}: {dt:.3f} ms/frame  ({1000.0 / dt:.0f} FPS)")


if __name__ == "__main__":
    main()
