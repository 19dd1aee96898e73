"""Seed the persistent XLA compile cache for the stock tracker configs.

Run once per machine (install time / image bake): compiles every program the
interactive paths need — initialize + track for the given trackers at the
common frame-shape buckets — and persists the executables in
<data_root>/xla_cache (utils/compile_cache.py). After this, `run_video.py` /
`run_tracker.py` reach their first frame in seconds instead of minutes.

    python scripts/warm_cache.py                 # dimp50 at 480x640 + 720x1280
    python scripts/warm_cache.py --trackers dimp.dimp50 tomp.tomp50 \
        --shapes 480x640 1080x1920

Measured (TPU v5e behind this harness's tunnel, MODEL_ZOO.md "Warm-start"):
cold ~70-76 s to first tracked frame (41-50 s init + ~26 s first tracks,
compile-service-load dependent); seeded ~15-22 s (weight upload + executable
deserialization + tracing — no compilation).
"""

import argparse
import importlib
import sys
import time

import numpy as np


def warm_one(name: str, shapes) -> None:
    module, param = name.split(".")
    pm = importlib.import_module(f"pytracking_tpu.parameter.{module}.{param}")
    spec = pm.parameters()
    cls = importlib.import_module(
        f"pytracking_tpu.trackers.{module}").get_tracker_class()
    rng = np.random.default_rng(0)
    for H, W in shapes:
        tracker = cls(spec.params, spec.net, spec.variables)
        frame = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        frame[H // 2 - 20:H // 2 + 20, W // 2 - 20:W // 2 + 20] = 230
        t0 = time.time()
        tracker.initialize(frame, {"init_bbox": [W / 2 - 20, H / 2 - 20, 40, 40]})
        t_init = time.time() - t0
        t0 = time.time()
        for _ in range(2):
            tracker.track(frame)
        t_track = time.time() - t0
        print(f"  {name} @ {H}x{W}: init {t_init:.1f}s, first tracks "
              f"{t_track:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--trackers", nargs="+", default=["dimp.dimp50"],
                    help="module.param names (e.g. dimp.dimp50 tomp.tomp50)")
    ap.add_argument("--shapes", nargs="+", default=["480x640", "720x1280"])
    args = ap.parse_args()

    from pytracking_tpu.utils import compile_cache
    d = compile_cache.enable()
    print(f"seeding compile cache at {d}", flush=True)
    shapes = [tuple(int(v) for v in s.split("x")) for s in args.shapes]
    for name in args.trackers:
        t0 = time.time()
        warm_one(name, shapes)
        print(f"{name}: warmed in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
