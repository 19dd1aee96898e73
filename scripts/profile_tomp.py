"""Break down ToMP-50 frame time on the real chip (VERDICT r3 item 2).

Times each jitted sub-stage of the track step in isolation:
  backbone        ResNet-50 on the 288^2 search patch
  extract_head    ResidualBottleneck on memory (M+1 samples)
  filters         transformer filter predictor (duplicated cls/bbreg batch)
  classify+bbreg  filter application + bbreg tower
and the full fused step via the scan harness for reference.

Usage: python scripts/profile_tomp.py [tomp50|tomp101|tamos_resnet50|tamos_swin_base]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "tomp50"
    mod = __import__(f"pytracking_tpu.parameter.tomp.{name}"
                     if name.startswith("tomp") else
                     f"pytracking_tpu.parameter.tamos.{name}",
                     fromlist=["parameters"])
    spec = mod.parameters()
    from pytracking_tpu.trackers.tomp import ToMPTracker
    tracker = ToMPTracker(spec.params, spec.net, spec.variables)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    tracker.initialize(frame, {"init_bbox": [200.0, 150.0, 120.0, 160.0]})
    tracker.track(frame)

    p = tracker.params
    ss = p.image_sample_size
    M = p.sample_memory_size
    feat_sz = p.train_feature_size
    st = tracker.state

    patch = jnp.zeros((1, ss, ss, 3), jnp.float32)
    bb = jax.jit(tracker._backbone)
    backbone_feat = bb(patch)
    t_backbone = timeit(bb, patch)

    hf = jax.jit(tracker._head_feat)
    test_x = hf(backbone_feat)
    t_headfeat = timeit(hf, backbone_feat)

    eh = jax.jit(tracker._extract_head)
    train_feat = st.mem_samples[:, None]       # memory caches extracted head feats
    test_feat = eh(test_x[:, None])
    t_extract = timeit(eh, test_x[:, None])

    train_ltrb = tracker._encode_ltrb(st.mem_boxes)[:, None]
    train_label = st.mem_labels[:, None]
    slot_valid = jnp.arange(M) < st.num_stored
    gth_mask = jnp.arange(M) < st.num_init

    fp = jax.jit(tracker._filters_parallel)
    cls_w, bbreg_w, cls_enc, bbreg_enc = fp(train_feat, test_feat, train_label,
                                            train_ltrb, slot_valid, gth_mask)
    t_filters = timeit(fp, train_feat, test_feat, train_label, train_ltrb,
                       slot_valid, gth_mask)

    cl = jax.jit(tracker._classify)
    br = jax.jit(tracker._bbreg)
    t_cls = timeit(cl, cls_enc, cls_w)
    t_bbr = timeit(br, bbreg_enc, bbreg_w)

    full = jax.jit(tracker._jit_track)
    im = jnp.asarray(frame)
    st2, out = full(tracker.variables, st, im)
    jax.block_until_ready(out["target_bbox"])

    def run_full():
        nonlocal st2
        st2, o = full(tracker.variables, st2, im)
        return o["target_bbox"]
    t_full = timeit(run_full)

    print(f"--- {name} breakdown (ms, isolated jits; dtype "
          f"{train_feat.dtype}) ---")
    print(f"backbone ({ss}^2):        {t_backbone:7.3f}")
    print(f"head_feat:                {t_headfeat:7.3f}")
    print(f"extract_head (M={M}+1):   {t_extract:7.3f}")
    print(f"filter predictor:         {t_filters:7.3f}   "
          f"(seq 2x{(M + 1) * feat_sz * feat_sz} tokens, d=512)")
    print(f"classifier:               {t_cls:7.3f}")
    print(f"bbreg tower:              {t_bbr:7.3f}")
    print(f"SUM of stages:            "
          f"{t_backbone + t_headfeat + t_extract + t_filters + t_cls + t_bbr:7.3f}")
    print(f"full fused track step:    {t_full:7.3f}")


if __name__ == "__main__":
    main()
