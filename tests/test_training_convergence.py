"""Convergence smoke: the DiMP training stack must actually LEARN — loss on a fixed
synthetic batch must drop substantially under the jitted data-parallel train step
(reference quality assurance is benchmark-driven, SURVEY §4; this is the unit-level
stand-in: optimizer + actor + grads wired correctly end-to-end)."""

import numpy as np


def test_dimp_train_step_converges():
    import jax
    import jax.numpy as jnp
    import optax

    from test_dimp_tracker import tiny_dimpnet
    from pytracking_tpu.parallel.mesh import make_train_step
    from pytracking_tpu.training.actors.tracking import make_dimp_actor

    net = tiny_dimpnet()
    sz = 96
    rng = np.random.RandomState(0)

    # fixed batch: bright square targets on textured background
    def make_pair():
        im = rng.rand(sz, sz, 3).astype(np.float32) * 60
        x, y = rng.randint(20, sz - 40, 2)
        im[y:y + 24, x:x + 24] = 220.0
        return im, [float(x), float(y), 24.0, 24.0]

    S = 2
    trains, tests, tr_bb, te_bb = [], [], [], []
    for _ in range(S):
        a, ba = make_pair()
        b, bb_ = make_pair()
        trains.append(a); tests.append(b); tr_bb.append(ba); te_bb.append(bb_)

    from pytracking_tpu.training.processing_utils import gaussian_label_function
    te_bb_np = np.asarray(te_bb, np.float32)
    label = gaussian_label_function(te_bb_np, 0.25 / 5, 4, sz // 16, sz,
                                    end_pad_if_even=True)
    batch = {
        "train_images": jnp.asarray(np.stack(trains))[None],
        "test_images": jnp.asarray(np.stack(tests))[None],
        "train_anno": jnp.asarray(np.asarray(tr_bb, np.float32))[None],
        "test_proposals": jnp.asarray(te_bb_np)[None, :, None],
        "proposal_iou": jnp.ones((1, S, 1)),
        "test_label": jnp.asarray(label)[None],
    }

    variables = net.init(jax.random.PRNGKey(0), batch["train_images"],
                         batch["test_images"], batch["train_anno"],
                         batch["test_proposals"], train=False)
    actor = make_dimp_actor(net, train=False)
    step = make_train_step(actor, optax.adam(1e-3))

    params = variables["params"]
    bs = variables.get("batch_stats")
    opt_state = optax.adam(1e-3).init(params)
    losses = []
    for _ in range(25):
        params, bs, opt_state, loss, stats = step(params, bs, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], \
        f"no convergence: {losses[0]:.4f} -> {losses[-1]:.4f}"
