"""Batched-sequence serving (parallel/serving.py): the vmapped light-step +
deferred classifier update must reproduce the per-sequence fused tracker exactly
when no hard negatives occur (the deferred tick fires on the same frames as the
fused step's periodic lax.switch branch)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytracking_tpu.parallel.serving import BatchedTrackerServer
from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker
from tests.test_dimp_tracker import make_frame, tiny_dimpnet


def _params(**kw):
    # thresholds forced so every frame flags 'normal' -> the fused path takes
    # exactly the periodic-update branch on tick frames and no-update otherwise,
    # which is what the deferred path reproduces
    base = dict(
        image_sample_size=96, kernel_size=4, sample_memory_size=8,
        net_opt_iter=2, net_opt_update_iter=1, net_opt_hn_iter=1,
        train_skipping=3, augmentation=(("fliplr", True),),
        num_init_random_boxes=2, box_refinement_iter=2, iounet_k=2,
        target_not_found_threshold=-1e6, distractor_threshold=1e6,
        hard_negative_threshold=1e6)
    base.update(kw)
    return DiMPParams(**base)


@pytest.fixture(scope="module")
def net_and_variables():
    net = tiny_dimpnet()
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                         train=False)
    return net, variables


@pytest.mark.filterwarnings("ignore")
def test_batched_server_matches_per_sequence_trackers(net_and_variables):
    net, variables = net_and_variables
    B, T = 3, 7   # spans two update ticks at train_skipping=3
    centers = [(50 + 6 * b, 50 + 4 * b) for b in range(B)]

    # reference: independent fused per-sequence trackers
    ref_boxes = np.zeros((T, B, 4))
    for b, (cy, cx) in enumerate(centers):
        tr = DiMPTracker(_params(), net, variables)
        tr.initialize(make_frame(cy, cx),
                      {"init_bbox": [cx - 10, cy - 10, 20, 20]})
        for t in range(T):
            out = tr.track(make_frame(cy + 2 * t, cx + t))
            ref_boxes[t, b] = out["target_bbox"]

    # server: one vmapped step + deferred cadence updates
    # bf16=False: this test asserts exact agreement with the f32 per-sequence
    # trackers (the serving default since round 4 is bf16, gated separately)
    server = BatchedTrackerServer(DiMPTracker, _params(), net, variables,
                                  bf16=False)
    assert server._deferred
    server.initialize([make_frame(cy, cx) for cy, cx in centers],
                      [[cx - 10, cy - 10, 20, 20] for cy, cx in centers])
    for t in range(T):
        frames = np.stack([make_frame(cy + 2 * t, cx + t)
                           for cy, cx in centers])
        boxes = server.track(frames)
        np.testing.assert_allclose(boxes, ref_boxes[t], rtol=1e-4, atol=1e-2,
                                   err_msg=f"frame {t}")


@pytest.mark.filterwarnings("ignore")
def test_scan_track_matches_stepwise(net_and_variables):
    net, variables = net_and_variables
    B, T = 2, 5
    centers = [(50, 50), (70, 60)]

    def frames_at(t):
        return np.stack([make_frame(cy + 2 * t, cx + t) for cy, cx in centers])

    s1 = BatchedTrackerServer(DiMPTracker, _params(), net, variables)
    s1.initialize([make_frame(cy, cx) for cy, cx in centers],
                  [[cx - 10, cy - 10, 20, 20] for cy, cx in centers])
    step_boxes = np.stack([s1.track(frames_at(t)) for t in range(T)])

    s2 = BatchedTrackerServer(DiMPTracker, _params(), net, variables)
    s2.initialize([make_frame(cy, cx) for cy, cx in centers],
                  [[cx - 10, cy - 10, 20, 20] for cy, cx in centers])
    scan_boxes = np.asarray(s2.scan_track(
        np.stack([frames_at(t) for t in range(T)])))

    np.testing.assert_allclose(scan_boxes, step_boxes, rtol=1e-4, atol=1e-2)


@pytest.mark.filterwarnings("ignore")
def test_non_deferring_tracker_falls_back(net_and_variables):
    """A tracker class that does not honor the defer flag must run fully fused
    (no deferred update double-applied)."""
    net, variables = net_and_variables

    class NoDefer(DiMPTracker):
        supports_deferred_classifier_update = False

    server = BatchedTrackerServer(NoDefer, _params(), net, variables)
    assert not server._deferred
    server.initialize([make_frame(50, 50)], [[40, 40, 20, 20]])
    boxes = server.track(np.stack([make_frame(52, 51)]))
    assert boxes.shape == (1, 4) and np.isfinite(boxes).all()


@pytest.mark.filterwarnings("ignore")
def test_mesh_sharded_server_matches_single_device(net_and_variables):
    """Multi-chip serving scale-out: the stream axis sharded over an 8-device
    'data' mesh must produce the same boxes as the single-device server (the
    streams are independent, so the SPMD program has no collectives), and the
    sharded states must actually live distributed across the mesh."""
    from jax.sharding import Mesh

    net, variables = net_and_variables
    B, T = 8, 4
    centers = [(40 + 4 * b, 40 + 3 * b) for b in range(B)]

    def frames_at(t):
        return np.stack([make_frame(cy + 2 * t, cx + t) for cy, cx in centers])

    s_ref = BatchedTrackerServer(DiMPTracker, _params(), net, variables)
    s_ref.initialize([make_frame(cy, cx) for cy, cx in centers],
                     [[cx - 10, cy - 10, 20, 20] for cy, cx in centers])
    ref_boxes = np.stack([s_ref.track(frames_at(t)) for t in range(T)])

    devices = np.array(jax.devices()[:8])
    with Mesh(devices, ("data",)) as mesh:
        s = BatchedTrackerServer(DiMPTracker, _params(), net, variables,
                                 mesh=mesh)
        s.initialize([make_frame(cy, cx) for cy, cx in centers],
                     [[cx - 10, cy - 10, 20, 20] for cy, cx in centers])
        # the stream axis is genuinely distributed
        leaf = jax.tree_util.tree_leaves(s.states)[0]
        assert len(leaf.sharding.device_set) == 8, leaf.sharding
        mesh_boxes = np.stack([s.track(frames_at(t)) for t in range(T)])

    np.testing.assert_allclose(mesh_boxes, ref_boxes, rtol=1e-4, atol=5e-2)


@pytest.mark.filterwarnings("ignore")
def test_bf16_default_serving_tracks_close(net_and_variables):
    """The round-4 serving default (bf16 parameter storage) must stay close to
    the f32 server on the same streams — the whole-harness accuracy gate lives
    in test_bf16_harness_gate.py; this asserts the serving wiring itself."""
    net, variables = net_and_variables
    B, T = 2, 5
    centers = [(50 + 6 * b, 50 + 4 * b) for b in range(B)]
    frames0 = [make_frame(cy, cx) for cy, cx in centers]
    bboxes = [[cx - 10, cy - 10, 20, 20] for cy, cx in centers]

    s32 = BatchedTrackerServer(DiMPTracker, _params(), net, variables,
                               bf16=False)
    s16 = BatchedTrackerServer(DiMPTracker, _params(), net, variables,
                               bf16=True)
    s32.initialize(frames0, bboxes)
    s16.initialize(frames0, bboxes)
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(s16.tracker.variables)
    assert any(l.dtype == jnp.bfloat16 for l in leaves if hasattr(l, "dtype"))
    for t in range(1, T):
        fb = np.stack([make_frame(cy + 2 * t, cx + t) for cy, cx in centers])
        b32 = s32.track(fb)
        b16 = s16.track(fb)
    # boxes on the same high-contrast streams must agree to a few pixels
    assert np.abs(np.asarray(b32) - np.asarray(b16)).max() < 6.0
