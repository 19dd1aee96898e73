"""Measure device-step time for the tracker families on the real TPU chip.

Covers the trackers MODEL_ZOO.md's table was missing: KeepTrack, RTS, PrDiMP-50,
ToMP-101, TaMOs-Swin — plus optional MFU for the scan-dispatch trackers via XLA
cost analysis. For KeepTrack the per-frame host sync (candidate association) is
quantified separately from the two device dispatches.

Usage: python scripts/measure_tpu.py [tracker ...]
  tracker in {prdimp50, tomp101, tamos_swin, keep_track, rts, dimp50, tomp50}
"""

import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _spec(module):
    return importlib.import_module(f"pytracking_tpu.parameter.{module}").parameters()


def _synth_frame(rng, h=480, w=640):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def _timeit(fn, n=30):
    import jax
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return 1000 * (time.perf_counter() - t0) / n


def measure_jit_track(name, module, tracker_cls, n=40, frame_hw=(480, 640)):
    """Trackers with a single jitted step: ONE lax.scan dispatch over a stack of
    device-resident frames — pure device time, no per-step tunnel RPC (same
    methodology as bench.py)."""
    import jax
    import jax.numpy as jnp

    spec = _spec(module)
    kw = getattr(spec, "tracker_kwargs", None) or {}
    tracker = tracker_cls(spec.params, spec.net, spec.variables, **kw)
    rng = np.random.default_rng(0)
    frame = _synth_frame(rng, *frame_hw)
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0]})
    tracker.track(frame)

    frames = jax.device_put(jnp.stack(
        [jnp.asarray(_synth_frame(rng, *frame_hw)) for _ in range(n)]))
    jax.block_until_ready(frames)

    # ATOM's step carries a per-sequence static sample size as a kw-only arg
    import functools
    impl = tracker._track_impl
    if hasattr(tracker, "_sample_sz"):
        impl = functools.partial(impl, sample_sz=tracker._sample_sz)

    def scan_fn(variables, st, fs):
        prev = tracker.variables
        tracker.variables = variables
        try:
            return jax.lax.scan(impl, st, fs)
        finally:
            tracker.variables = prev

    # NO donation here: measured on v5e, donating the scan carry made ATOM's
    # scan 45x slower (57.7 vs 1.29 ms/frame — the donated initial state's
    # layouts force per-iteration relayouts inside the scan). A scan already
    # reuses its carry buffers in place within the call, so donating the
    # initial state buys nothing. ECO's dedicated harness below is the
    # exception (measured 15.3 -> 2.85 ms with donation at M=200).
    step = jax.jit(scan_fn)
    state, outs = step(tracker.variables, tracker.state, frames)
    jax.block_until_ready(outs)
    # best-of-3: the second dispatch can pay a one-time relayout recompile (the
    # scan output state's layouts differ from the freshly initialized state's)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, outs = step(tracker.variables, state, frames)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = 1000 * best / n
    print(f"{name:14s} device step {ms:7.2f} ms/frame  ({1000 / ms:7.1f} FPS)")
    return ms


def measure_keep_track(n=30):
    """Default (device_association=True): ONE fused dispatch — measure it like
    the other scan trackers. Pass the host-association variant explicitly to
    quantify the split path's two dispatches + host sync."""
    import jax
    import jax.numpy as jnp

    spec = _spec("keep_track.default")
    from pytracking_tpu.trackers.keep_track import KeepTrackTracker
    kw = dict(spec.tracker_kwargs or {})
    if kw.get("device_association", True):
        return measure_jit_track("keep_track", "keep_track.default",
                                 KeepTrackTracker, n=n)
    tracker = KeepTrackTracker(spec.params, spec.net, spec.variables, **kw)
    rng = np.random.default_rng(0)
    frame = _synth_frame(rng)
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0]})
    for _ in range(3):
        tracker.track(frame)

    # full track() with a device-resident frame (includes the host association and
    # the part1->host->part2 sync)
    dev_frame = jax.device_put(jnp.asarray(frame))
    jax.block_until_ready(dev_frame)
    t0 = time.perf_counter()
    for _ in range(n):
        tracker.track(dev_frame)
    jax.block_until_ready(tracker.state.pos)
    full_ms = 1000 * (time.perf_counter() - t0) / n

    # device-only: part1 and part2 timed without the host fetch in between
    holder = {"state": tracker.state}

    def part1():
        holder["state"], out = tracker._jit_part1(tracker.variables,
                                                  holder["state"], dev_frame)
        return out

    p1_ms = _timeit(part1, n)
    state, part1_out = tracker._jit_part1(tracker.variables, holder["state"],
                                          dev_frame)
    jax.block_until_ready(part1_out)
    args2 = (part1_out["backbone_l2"], part1_out["backbone_l3"], part1_out["test_x"],
             part1_out["sample_pos"], part1_out["sample_scale"],
             jnp.zeros(2), jnp.asarray(False), jnp.asarray(0, jnp.int32),
             jnp.asarray(0.5), jnp.asarray(0.5), jnp.asarray(True))
    holder2 = {"state": state}

    def part2():
        holder2["state"], out = tracker._jit_part2(tracker.variables,
                                                   holder2["state"], *args2)
        return out

    p2_ms = _timeit(part2, n)
    host_ms = full_ms - p1_ms - p2_ms
    print(f"{'keep_track':14s} full step   {full_ms:7.2f} ms/frame  "
          f"({1000 / full_ms:7.1f} FPS)  [part1 {p1_ms:.2f} + part2 {p2_ms:.2f} "
          f"+ host-assoc/sync {host_ms:.2f} ms]")
    return full_ms


def measure_rts(n=20):
    import jax
    import jax.numpy as jnp

    spec = _spec("rts.rts50")
    from pytracking_tpu.trackers.rts import RTSTracker
    tracker = RTSTracker(spec.params, spec.net, spec.variables)
    rng = np.random.default_rng(0)
    frame = _synth_frame(rng)
    mask = np.zeros((480, 640), np.float32)
    mask[150:310, 200:320] = 1.0
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0],
                               "init_mask": mask})
    for _ in range(3):
        tracker.track(frame)

    dev_frame = jax.device_put(jnp.asarray(frame))
    jax.block_until_ready(dev_frame)
    # raw device step (pipelined; prev-prob stays device-resident)
    st = tracker.state
    st, out = tracker._jit_track(tracker.variables, st, dev_frame, st.seg_raw)
    jax.block_until_ready(out["target_bbox"])
    t0 = time.perf_counter()
    for _ in range(n):
        st, out = tracker._jit_track(tracker.variables, st, dev_frame, st.seg_raw)
    jax.block_until_ready(out["target_bbox"])
    ms = 1000 * (time.perf_counter() - t0) / n
    # e2e incl. the full-image mask fetch (through the tunnel this is dominated
    # by the ~1.2MB segmentation_raw transfer per frame)
    t0 = time.perf_counter()
    for _ in range(5):
        tracker.track(dev_frame)
    e2e_ms = 1000 * (time.perf_counter() - t0) / 5
    print(f"{'rts':14s} device step {ms:7.2f} ms/frame  ({1000 / ms:7.1f} FPS)  "
          f"[e2e w/ mask fetch {e2e_ms:.1f} ms]")
    return ms


def measure_eco(n=40):
    """ECO: one jitted step carrying host-built Fourier constants; scan over a
    device-resident frame stack (pure device time)."""
    import functools

    import jax
    import jax.numpy as jnp

    spec = _spec("eco.default")
    from pytracking_tpu.trackers.eco import ECOTracker
    tracker = ECOTracker(spec.params, spec.net, spec.variables)
    rng = np.random.default_rng(0)
    frame = _synth_frame(rng)
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0]})
    tracker.track(frame)

    frames = jax.device_put(jnp.stack(
        [jnp.asarray(_synth_frame(rng)) for _ in range(n)]))
    yfs, regw = tracker._static["yfs"], tracker._static["reg_windows"]
    impl = functools.partial(tracker._track_impl, sample_sz=tracker._sample_sz,
                             feat_szs=tuple(tracker._feat_szs),
                             filt_szs=tuple(tracker._filt_szs))

    def scan_fn(variables, st, fs, yfs_, regw_):
        # the Fourier constants flow through jit ARGUMENTS — closing over the
        # device-resident complex arrays fails constant lowering on this backend
        prev = tracker.variables
        tracker.variables = variables
        try:
            return jax.lax.scan(lambda c, f: impl(c, f, yfs_, regw_), st, fs)
        finally:
            tracker.variables = prev

    # donate the state like the production track path does — without it the
    # (M, ...) complex64 sample buffers are COPIED per call (at the reference's
    # M=200 that mismeasured 15.3 ms/frame vs the true 2.85)
    step = jax.jit(scan_fn, donate_argnums=(1,))
    state, outs = step(tracker.variables, tracker.state, frames, yfs, regw)
    jax.block_until_ready(outs["target_bbox"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, outs = step(tracker.variables, state, frames, yfs, regw)
        jax.block_until_ready(outs["target_bbox"])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = 1000 * best / n

    # the periodic filter CG update is a separate host-scheduled program
    # (trackers/eco.py track(): every train_skipping frames) — time it and
    # report the amortized per-frame total
    upd = functools.partial(tracker._update_impl,
                            filt_szs=tuple(tracker._filt_szs))

    def upd_fn(variables, st, yfs_, regw_):
        prev = tracker.variables
        tracker.variables = variables
        try:
            return upd(st, yfs_, regw_)
        finally:
            tracker.variables = prev

    ustep = jax.jit(upd_fn)
    st2 = ustep(tracker.variables, state, yfs, regw)
    jax.block_until_ready(st2.filters[0])
    t0 = time.perf_counter()
    for _ in range(10):
        st2 = ustep(tracker.variables, state, yfs, regw)
    jax.block_until_ready(st2.filters[0])
    ums = 1000 * (time.perf_counter() - t0) / 10
    total = ms + ums / tracker.params.train_skipping
    print(f"{'eco':14s} device step {ms:7.2f} ms/frame + CG update "
          f"{ums:.2f} ms / {tracker.params.train_skipping} frames = "
          f"{total:7.2f} ms/frame amortized ({1000 / total:7.1f} FPS)")
    return total


def measure_lwl(n=20):
    """LWL: the step carries the previous probability map (device-resident) —
    scan threads it through the carry like the harness's single-object mode."""
    import jax
    import jax.numpy as jnp

    spec = _spec("lwl.lwl_ytvos")
    from pytracking_tpu.trackers.lwl import LWLTracker
    tracker = LWLTracker(spec.params, spec.net, spec.variables)
    rng = np.random.default_rng(0)
    frame = _synth_frame(rng)
    mask = np.zeros((480, 640), np.float32)
    mask[150:310, 200:320] = 1.0
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0],
                               "init_mask": mask})
    tracker.track(frame)

    frames = jax.device_put(jnp.stack(
        [jnp.asarray(_synth_frame(rng)) for _ in range(n)]))

    def scan_fn(variables, carry, fs):
        prev = tracker.variables
        tracker.variables = variables
        try:
            def body(c, f):
                st, prob = c
                st, out = tracker._track_impl(st, f, prob)
                return (st, st.seg_raw), out["target_bbox"]
            return jax.lax.scan(body, carry, fs)
        finally:
            tracker.variables = prev

    # no donation: the carry aliases state.seg_raw twice (donating duplicated
    # buffers is undefined); the copy cost is once per 20-frame call
    step = jax.jit(scan_fn)
    carry = (tracker.state, tracker.state.seg_raw)
    carry, boxes = step(tracker.variables, carry, frames)
    jax.block_until_ready(boxes)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        carry, boxes = step(tracker.variables, carry, frames)
        jax.block_until_ready(boxes)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = 1000 * best / n
    print(f"{'lwl':14s} device step {ms:7.2f} ms/frame  ({1000 / ms:7.1f} FPS)")
    return ms


def main():
    targets = sys.argv[1:] or ["prdimp50", "tomp101", "tamos_swin", "keep_track",
                               "rts"]
    from pytracking_tpu.trackers.dimp import DiMPTracker
    from pytracking_tpu.trackers.tamos import TaMOsTracker
    from pytracking_tpu.trackers.tomp import ToMPTracker

    for t in targets:
        if t == "prdimp50":
            measure_jit_track("prdimp50", "dimp.prdimp50", DiMPTracker)
        elif t == "dimp50":
            measure_jit_track("dimp50", "dimp.dimp50", DiMPTracker)
        elif t == "atom":
            from pytracking_tpu.trackers.atom import ATOMTracker
            measure_jit_track("atom", "atom.default", ATOMTracker)
        elif t == "tomp101":
            measure_jit_track("tomp101", "tomp.tomp101", ToMPTracker)
        elif t == "tomp50":
            measure_jit_track("tomp50", "tomp.tomp50", ToMPTracker)
        elif t == "tamos_swin":
            measure_jit_track("tamos_swin", "tamos.tamos_swin_base", TaMOsTracker)
        elif t == "tamos_r50":
            measure_jit_track("tamos_r50", "tamos.tamos_resnet50", TaMOsTracker)
        elif t == "keep_track":
            measure_keep_track()
        elif t == "keep_track_device":
            from pytracking_tpu.trackers.keep_track import KeepTrackTracker

            spec = _spec("keep_track.default")
            kw = dict(spec.tracker_kwargs or {})
            kw["device_association"] = True
            measure_jit_track("keep_track_dev", "keep_track.default",
                              lambda p, n, v, **k: KeepTrackTracker(p, n, v, **kw))
        elif t == "rts":
            measure_rts()
        elif t == "eco":
            measure_eco()
        elif t == "lwl":
            measure_lwl()
        else:
            print(f"unknown tracker {t}", file=sys.stderr)


if __name__ == "__main__":
    main()
