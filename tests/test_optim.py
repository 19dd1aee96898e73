"""Per-module LR groups (reference torch param groups) via optax.multi_transform."""

import numpy as np


def _params():
    import jax.numpy as jnp
    return {
        "classifier": {"filter_optimizer": {"w": jnp.ones((4,))},
                       "filter_initializer": {"w": jnp.ones((4,))}},
        "feature_extractor": {"layer3_0": {"w": jnp.ones((4,))},
                              "layer4_0": {"w": jnp.ones((4,))}},
        "bb_regressor": {"w": jnp.ones((4,))},
    }


def test_per_module_learning_rates():
    import jax

    from pytracking_tpu.training.optim import adam_per_module

    params = _params()
    opt = adam_per_module(
        2e-4, {"classifier/filter_optimizer": 5e-4,
               "feature_extractor/layer3_": 2e-5},
        steps_per_epoch=100, step_size=15, gamma=0.2)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda x: np.ones_like(x), params)
    updates, _ = opt.update(grads, state, params)
    # adam with unit grads: first step magnitude ~= lr (bias-corrected)
    fo = float(np.abs(updates["classifier"]["filter_optimizer"]["w"][0]))
    l3 = float(np.abs(updates["feature_extractor"]["layer3_0"]["w"][0]))
    bb = float(np.abs(updates["bb_regressor"]["w"][0]))
    np.testing.assert_allclose(fo, 5e-4, rtol=1e-2)
    np.testing.assert_allclose(l3, 2e-5, rtol=1e-2)
    np.testing.assert_allclose(bb, 2e-4, rtol=1e-2)  # base group


def test_freeze_unlisted_gets_zero_updates():
    import jax

    from pytracking_tpu.training.optim import adam_per_module

    params = _params()
    opt = adam_per_module(
        2e-4, {"classifier": 1e-4}, steps_per_epoch=10, freeze_unlisted=True)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda x: np.ones_like(x), params)
    updates, _ = opt.update(grads, state, params)
    assert np.all(np.asarray(updates["feature_extractor"]["layer3_0"]["w"]) == 0)
    assert np.all(np.asarray(updates["bb_regressor"]["w"]) == 0)
    assert np.abs(np.asarray(updates["classifier"]["filter_optimizer"]["w"])).max() \
        > 0


def test_step_lr_decays_per_epoch():
    from pytracking_tpu.training.optim import multi_step_lr, step_lr

    s = step_lr(1e-3, steps_per_epoch=10, step_size=15, gamma=0.2)
    np.testing.assert_allclose(float(s(0)), 1e-3)
    np.testing.assert_allclose(float(s(15 * 10 - 1)), 1e-3)
    np.testing.assert_allclose(float(s(15 * 10)), 2e-4, rtol=1e-6)

    m = multi_step_lr(1e-3, steps_per_epoch=10, milestones=(5, 8), gamma=0.2)
    np.testing.assert_allclose(float(m(49)), 1e-3)
    np.testing.assert_allclose(float(m(50)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(m(80)), 4e-5, rtol=1e-6)
