"""Per-stage device breakdowns for TaMOs and LWL (VERDICT r4 item 8) — the same
roofline treatment ToMP-50 got (scripts/profile_tomp.py): each jitted sub-stage
timed in isolation on the real chip, plus the full fused step, plus stage-level
FLOP counts from XLA's cost model where meaningful.

Usage: python scripts/profile_tamos_lwl.py [tamos|lwl|both]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best * 1000.0


def flops_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile()
        return c.cost_analysis()["flops"] / 1e9
    except Exception:
        return float("nan")


def profile_tamos():
    from pytracking_tpu.parameter.tamos.tamos_resnet50 import parameters
    from pytracking_tpu.trackers.tamos import TaMOsTracker

    spec = parameters()
    tracker = TaMOsTracker(spec.params, spec.net, spec.variables)
    p = tracker.params
    Hs, Ws = p.image_sample_size
    h, w = p.train_feature_size
    K, M = p.num_tokens, p.sample_memory_size

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0]})
    tracker.track(frame)
    st = tracker.state

    fr = jnp.zeros((Hs, Ws, 3), jnp.float32)
    bb = jax.jit(lambda x: tracker._backbone(x))
    backbone_feat = bb(fr[None])
    t_backbone = timeit(bb, fr[None])
    g_backbone = flops_of(bb, fr[None])

    hl = jax.jit(lambda f: tracker.net.apply(
        tracker.variables, f, method=lambda m, ff: ff[m.head_layer]))
    test_x = hl(backbone_feat)
    hf = jax.jit(tracker._head_feat_mem)
    test_feat = hf(test_x)
    t_headfeat = timeit(hf, test_x)

    train_feat = st.mem_samples[:, None]
    train_ltrb = tracker._encode_ltrb(st.mem_boxes)[:, None]
    frame_mask = jnp.arange(M) < st.num_stored
    gth_mask = jnp.arange(M) == 0

    fp = jax.jit(tracker._predict_filters_parallel)
    cls_w, bb_w, cls_enc, bb_enc = fp(train_feat, test_feat,
                                      st.mem_labels[:, None], train_ltrb,
                                      frame_mask, gth_mask)
    t_filters = timeit(fp, train_feat, test_feat, st.mem_labels[:, None],
                       train_ltrb, frame_mask, gth_mask)
    g_filters = flops_of(fp, train_feat, test_feat, st.mem_labels[:, None],
                         train_ltrb, frame_mask, gth_mask)

    fpn = jax.jit(tracker._fpn)
    pyr = fpn(bb_enc, backbone_feat)
    t_fpn = timeit(fpn, bb_enc, backbone_feat)
    h2w2 = (pyr["feat2"].shape[2], pyr["feat2"].shape[3])

    ct = jax.jit(lambda e, f: tracker._classify_trafo(e, f, h2w2))
    t_cls = timeit(ct, cls_enc, cls_w)
    br = jax.jit(tracker._bbreg)
    t_bbr = timeit(br, pyr["feat2"], bb_w)

    full = tracker._jit_track
    im = jnp.asarray(frame)
    st2, out = full(tracker.variables, st, im)
    jax.block_until_ready(out["target_bbox"])

    def run_full():
        nonlocal st2
        st2, o = full(tracker.variables, st2, im)
        return o["target_bbox"]
    t_full = timeit(run_full)

    L = (M + 1) * h * w
    print(f"--- tamos_resnet50 breakdown (ms, isolated jits; {Hs}x{Ws} frame, "
          f"K={K}, M={M}) ---")
    print(f"backbone ({Hs}x{Ws}):        {t_backbone:7.3f}   "
          f"({g_backbone:6.1f} GFLOP -> {g_backbone / t_backbone:6.1f} TF/s)")
    print(f"head_feat:                   {t_headfeat:7.3f}")
    print(f"GOT filter predictor:        {t_filters:7.3f}   "
          f"({g_filters:6.1f} GFLOP -> {g_filters / t_filters:6.1f} TF/s, "
          f"seq 2x{L} tokens)")
    print(f"fpn:                         {t_fpn:7.3f}")
    print(f"classify(trafo):             {t_cls:7.3f}")
    print(f"bbreg tower:                 {t_bbr:7.3f}")
    s = t_backbone + t_headfeat + t_filters + t_fpn + t_cls + t_bbr
    print(f"SUM of stages:               {s:7.3f}")
    print(f"full fused track step:       {t_full:7.3f}")


def profile_lwl(bf16=False):
    from pytracking_tpu.parameter.lwl.lwl_ytvos import parameters
    from pytracking_tpu.trackers.lwl import LWLTracker

    spec = parameters()
    variables = spec.variables
    if bf16:
        # the VOS serving operating point: all f32 params STORED bf16
        # (parallel/serving.py default; accuracy-gated by
        # tests/test_bf16_harness_gate.py::test_bf16_lwl_vos_gate)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    tracker = LWLTracker(spec.params, spec.net, variables)
    p = tracker.params
    Hs, Ws = p.image_sample_size

    rng = np.random.default_rng(0)
    H, W = 480, 640
    frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    mask = np.zeros((H, W), np.float32)
    mask[150:310, 200:320] = 1.0
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0],
                               "init_mask": mask, "object_ids": ["1"]})
    out = tracker.track(frame, {"previous_output": {
        "segmentation_raw": {"1": mask}}})
    st = tracker.state

    patch = jnp.zeros((Hs, Ws, 3), jnp.float32)
    bb = jax.jit(lambda x: tracker._backbone(x))
    backbone_feat = bb(patch[None])
    t_backbone = timeit(bb, patch[None])
    g_backbone = flops_of(bb, patch[None])

    tmf = jax.jit(tracker._tm_features)
    test_x = tmf(backbone_feat)
    t_tmfeat = timeit(tmf, backbone_feat)

    seg = jax.jit(lambda f, x, b: tracker._segment(f, x, b, (Hs, Ws)))
    seg_out = seg(st.target_filter, test_x[:, None], backbone_feat)
    t_segment = timeit(seg, st.target_filter, test_x[:, None], backbone_feat)
    g_segment = flops_of(seg, st.target_filter, test_x[:, None], backbone_feat)

    upd = jax.jit(lambda s: tracker._run_model_update(s, jnp.asarray(True)))
    st2 = upd(st)
    t_update = timeit(upd, st)

    full = tracker._jit_track
    im = jnp.asarray(frame)
    prev = jnp.asarray(1 / (1 + np.exp(-out["segmentation_raw"])))
    st3, o = full(tracker.variables, st, im, prev)
    jax.block_until_ready(o["target_bbox"])

    def run_full():
        nonlocal st3
        st3, oo = full(tracker.variables, st3, im, prev)
        return oo["target_bbox"]
    t_full = timeit(run_full)

    print(f"--- lwl_ytvos breakdown (ms, isolated jits; {Hs}x{Ws} crop, "
          f"{H}x{W} frame) ---")
    print(f"backbone ({Hs}x{Ws}):        {t_backbone:7.3f}   "
          f"({g_backbone:6.1f} GFLOP -> {g_backbone / t_backbone:6.1f} TF/s)")
    print(f"tm_features:                 {t_tmfeat:7.3f}")
    print(f"segment (TM + decoder):      {t_segment:7.3f}   "
          f"({g_segment:6.1f} GFLOP -> {g_segment / t_segment:6.1f} TF/s)")
    print(f"model update (few-shot SD):  {t_update:7.3f}   "
          f"(every frame at train_skipping={p.train_skipping})")
    s = t_backbone + t_tmfeat + t_segment + t_update
    print(f"SUM of stages (+crop/paste in full):  {s:7.3f}")
    print(f"full fused track step:       {t_full:7.3f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    bf16 = "--bf16" in sys.argv
    if which in ("tamos", "both"):
        profile_tamos()
    if which in ("lwl", "both"):
        profile_lwl(bf16=bf16)
