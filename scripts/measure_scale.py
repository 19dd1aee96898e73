"""Measure the SCALE surfaces on the real TPU chip:

1. Batched-sequence eval (serving): vmap the DiMP-50 track step over B
   independent sequences on one chip — aggregate frames/second vs B.
2. Training-step throughput: the dimp50 recipe's jitted train step
   (value_and_grad + Adam) at the reference batch geometry — steps/s,
   sequences/s, and MFU from XLA's cost model.

Usage: python scripts/measure_scale.py [eval|train] ...
"""

import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_batched_eval_tomp(batch_sizes=(8, 16), n_frames=20):
    """ToMP-50 batched serving: the transformer step has no per-frame optimizer
    switch, so plain vmap keeps full amortization — no deferral needed."""
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.parallel.serving import BatchedTrackerServer
    from pytracking_tpu.trackers.tomp import ToMPTracker

    spec = importlib.import_module(
        "pytracking_tpu.parameter.tomp.tomp50").parameters()
    rng = np.random.default_rng(0)

    def frame():
        return rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)

    for B in batch_sizes:
        server = BatchedTrackerServer(ToMPTracker, spec.params, spec.net,
                                      spec.variables)
        server.initialize([frame() for _ in range(B)],
                          [[200.0 + b, 150.0, 120.0, 160.0] for b in range(B)])
        frames = jnp.stack([jnp.stack([jnp.asarray(frame()) for _ in range(B)])
                            for _ in range(n_frames)])
        best = None
        for it in range(3):
            t0 = time.perf_counter()
            boxes = server.scan_track(frames)
            jax.block_until_ready(boxes)
            dt = time.perf_counter() - t0
            if it > 0:
                best = dt if best is None else min(best, dt)
        ms = 1000 * best / n_frames
        print(f"tomp50 batched eval B={B:3d}: {ms:7.2f} ms/step  "
              f"aggregate {B * n_frames / best:8.1f} FPS")


def measure_batched_eval(batch_sizes=(1, 4, 8, 16, 32), n_frames=20,
                         deferred=True):
    """Serving throughput: BatchedTrackerServer.scan_track (deferred classifier
    updates on the train_skipping cadence). Timing discards the first iteration
    — the scan output state's layouts differ from the freshly-initialized
    state's, which triggers a one-time recompile on the second dispatch."""
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.parallel.serving import BatchedTrackerServer
    from pytracking_tpu.trackers.dimp import DiMPTracker

    spec = importlib.import_module(
        "pytracking_tpu.parameter.dimp.dimp50").parameters()
    rng = np.random.default_rng(0)

    def frame():
        return rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)

    for B in batch_sizes:
        server = BatchedTrackerServer(DiMPTracker, spec.params, spec.net,
                                      spec.variables)
        if not deferred:
            server._deferred = False
            import dataclasses as _dc
            server.params = _dc.replace(server.params,
                                        defer_classifier_update=False)
            server.tracker.params = server.params
        server.initialize([frame() for _ in range(B)],
                          [[200.0 + b, 150.0, 120.0, 160.0] for b in range(B)])
        frames = jnp.stack([jnp.stack([jnp.asarray(frame()) for _ in range(B)])
                            for _ in range(n_frames)])
        best = None
        for it in range(3):
            t0 = time.perf_counter()
            boxes = server.scan_track(frames)
            jax.block_until_ready(boxes)
            dt = time.perf_counter() - t0
            if it > 0:   # it0 = compile (+ it1 pays the relayout recompile once)
                best = dt if best is None else min(best, dt)
        ms = 1000 * best / n_frames
        mode = "deferred" if server._deferred else "fused"
        print(f"batched eval ({mode}) B={B:3d}: {ms:7.2f} ms/step  "
              f"aggregate {B * n_frames / best:8.1f} FPS")


def measure_train_step(batch_size=10, n_steps=10, n_train=3, n_test=3, sz=288):
    import jax
    import jax.numpy as jnp
    import optax

    from pytracking_tpu.models.tracking.dimpnet import dimpnet50
    from pytracking_tpu.parallel.mesh import make_train_step
    from pytracking_tpu.training.actors.tracking import make_dimp_actor

    output_sigma = 1 / 4 / 5.0
    feature_sz = sz // 16
    net = dimpnet50(filter_size=4, optim_iter=5,
                    init_gauss_sigma=output_sigma * feature_sz,
                    num_dist_bins=100, bin_displacement=0.1, mask_init_factor=3.0)
    rng = np.random.default_rng(0)
    S = batch_size
    batch = {
        "train_images": jnp.asarray(
            rng.uniform(0, 255, (n_train, S, sz, sz, 3)), jnp.float32),
        "test_images": jnp.asarray(
            rng.uniform(0, 255, (n_test, S, sz, sz, 3)), jnp.float32),
        "train_anno": jnp.asarray(
            rng.uniform(50, 150, (n_train, S, 4)), jnp.float32),
        "test_proposals": jnp.asarray(
            rng.uniform(50, 150, (n_test, S, 8, 4)), jnp.float32),
        "proposal_iou": jnp.asarray(rng.uniform(0, 1, (n_test, S, 8)), jnp.float32),
        # classifier scores live on the (feat_sz + (ksz+1)%2) grid
        "test_label": jnp.asarray(
            rng.uniform(0, 1, (n_test, S, feature_sz + 1, feature_sz + 1)),
            jnp.float32),
    }
    variables = net.init(jax.random.PRNGKey(0), batch["train_images"][:1, :1],
                         batch["test_images"][:1, :1], batch["train_anno"][:1, :1],
                         batch["test_proposals"][:1, :1], train=False)
    params = jax.device_put(variables["params"])
    batch_stats = jax.device_put(variables.get("batch_stats"))
    actor = make_dimp_actor(net)
    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(actor, optimizer)

    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    # FLOPs from the compiled cost model (forward+backward+update)
    try:
        cost = step.lower(params, batch_stats, opt_state,
                          batch).compile().cost_analysis()
        gflop = cost.get("flops", 0) / 1e9
    except Exception:
        gflop = 0.0

    # 3 warmup calls: initial compile + up to two relayout recompiles as the
    # donated params/opt_state settle into their steady layouts
    for _ in range(3):
        params, batch_stats, opt_state, loss, stats = step(params, batch_stats,
                                                           opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, batch_stats, opt_state, loss, stats = step(params, batch_stats,
                                                           opt_state, batch)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n_steps
    mfu = (gflop / dt / 1e3) / 197.0 * 100 if gflop else float("nan")
    print(f"train step (dimp50, batch {S} seqs x {n_train}+{n_test} frames @ "
          f"{sz}^2): {1000 * dt:7.1f} ms/step  {S / dt:6.1f} seq/s  "
          f"{gflop:8.1f} GFLOP/step  MFU {mfu:.1f}% of 197 TF/s bf16 peak  "
          f"(loss {float(loss):.3f})")


if __name__ == "__main__":
    targets = sys.argv[1:] or ["eval", "train"]
    if "eval" in targets:
        measure_batched_eval()
    if "eval_tomp" in targets:
        measure_batched_eval_tomp()
    if "train" in targets:
        measure_train_step()
