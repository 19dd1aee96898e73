"""Profile where DiMP-50 frame time goes on the real chip: upload vs dispatch vs compute."""
import time

import jax
import numpy as np

from pytracking_tpu.trackers.dimp import DiMPTracker

spec_mod = __import__("pytracking_tpu.parameter.dimp.dimp50", fromlist=["parameters"])
spec = spec_mod.parameters()
tracker = DiMPTracker(spec.params, spec.net, spec.variables)

rng = np.random.default_rng(0)
frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
info = {"init_bbox": [200.0, 150.0, 120.0, 160.0]}
tracker.initialize(frame, info)

# warm up
for _ in range(5):
    tracker.track(frame)

# 1) full loop: host frame -> upload -> step -> fetch bbox
t0 = time.perf_counter()
N = 50
for _ in range(N):
    out = tracker.track(frame)
jax.block_until_ready(tracker.state)
t1 = time.perf_counter()
print(f"full track() (sync fetch): {1000*(t1-t0)/N:.1f} ms/frame  ({N/(t1-t0):.2f} fps)")

# 2) async pipelined
t0 = time.perf_counter()
for _ in range(N):
    h = tracker.track_async(frame)
    tracker.fetch_output(h)
jax.block_until_ready(tracker.state)
t1 = time.perf_counter()
print(f"track_async+fetch:         {1000*(t1-t0)/N:.1f} ms/frame  ({N/(t1-t0):.2f} fps)")

# 3) device-resident frame: upload once, call the raw jitted step
dev_frame = jax.device_put(frame)
jax.block_until_ready(dev_frame)
state = tracker.state
step = tracker._jit_track
variables = spec.variables
state, out = step(variables, state, dev_frame)
jax.block_until_ready(state)
t0 = time.perf_counter()
for _ in range(N):
    state, out = step(variables, state, dev_frame)
jax.block_until_ready(state)
t1 = time.perf_counter()
print(f"device-resident step:      {1000*(t1-t0)/N:.1f} ms/frame  ({N/(t1-t0):.2f} fps)")

# 4) upload cost alone
t0 = time.perf_counter()
for i in range(N):
    d = jax.device_put(frame)
    jax.block_until_ready(d)
t1 = time.perf_counter()
print(f"uint8 frame upload (sync): {1000*(t1-t0)/N:.1f} ms/frame")

# 5) pipelined upload (no sync between)
t0 = time.perf_counter()
ds = [jax.device_put(frame) for _ in range(N)]
jax.block_until_ready(ds)
t1 = time.perf_counter()
print(f"uint8 frame upload (pipe): {1000*(t1-t0)/N:.1f} ms/frame")
