"""Multi-device evaluation sharding + FSDP parameter sharding on the 8-virtual-
device CPU mesh: batched-sequence tracking with the batch sharded over 'data', and
ZeRO-3-style parameter sharding over 'model' in a hybrid train step."""

import numpy as np
import pytest


@pytest.mark.filterwarnings("ignore")
def test_batched_eval_step_sharded_over_data_axis():
    """vmap the DiMP track step over 8 independent sequences, shard the stacked
    state + frames over the mesh's data axis — each device advances its own
    sequence; results must match the unsharded per-sequence steps."""
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.parallel.mesh import (make_batched_eval_step, make_mesh,
                                              shard_batch)
    from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker
    from tests.test_dimp_tracker import make_frame, tiny_dimpnet

    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest forces 8 virtual CPU devices"
    B = 8

    net = tiny_dimpnet()
    params = DiMPParams(
        image_sample_size=96, kernel_size=4, sample_memory_size=8,
        net_opt_iter=2, net_opt_update_iter=1, net_opt_hn_iter=1, train_skipping=5,
        augmentation=(("fliplr", True),), num_init_random_boxes=3,
        box_refinement_iter=2, iounet_k=2)
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop, train=False)
    tracker = DiMPTracker(params, net, variables)

    # per-sequence init (host loop, as the harness would do), then stack the states
    centers = [(50 + 4 * b, 50 + 3 * b) for b in range(B)]
    states = []
    for b in range(B):
        tracker.initialize(make_frame(*centers[b]),
                           {"init_bbox": [centers[b][1] - 10, centers[b][0] - 10,
                                          20, 20]})
        states.append(tracker.state)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    frames = jnp.stack([jnp.asarray(make_frame(cy + 2, cx + 2))
                        for cy, cx in centers])

    def step_fn(variables, state, frame):
        # variables as an explicit jit argument (not a closure constant)
        prev = tracker.variables
        tracker.variables = variables
        try:
            return tracker._track_impl(state, frame)
        finally:
            tracker.variables = prev

    step = make_batched_eval_step(step_fn)
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    with mesh:
        sh_state = shard_batch(mesh, stacked, batch_axis=0)
        sh_frames = shard_batch(mesh, frames, batch_axis=0)
        new_states, outs = step(tracker.variables, sh_state, sh_frames)
        jax.block_until_ready(outs)

    bboxes = np.asarray(outs["target_bbox"])
    assert bboxes.shape == (B, 4)
    assert np.all(np.isfinite(bboxes))

    # parity vs the unsharded single-sequence step for sequence 0
    ref_state, ref_out = tracker._jit_track(tracker.variables, states[0],
                                            frames[0])
    np.testing.assert_allclose(bboxes[0], np.asarray(ref_out["target_bbox"]),
                               rtol=1e-4, atol=1e-3)


def test_param_sharding_fsdp_specs():
    """Large leaves shard over 'model' along a divisible dim; small ones replicate."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pytracking_tpu.parallel.mesh import make_mesh, param_sharding

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    params = {"big": jnp.zeros((64, 128)), "odd": jnp.zeros((63, 129)),
              "small": jnp.zeros((4,))}
    sh = param_sharding(mesh, params, min_size=1024)
    assert sh["big"].spec == P(None, "model")
    assert sh["odd"].spec == P()      # no divisible dim -> replicate
    assert sh["small"].spec == P()    # too small -> replicate
