"""KYS default parameters (reference pytracking/parameter/kys/default.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.kysnet import kysnet_res50
from pytracking_tpu.trackers.kys import KYSParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = KYSParams()

    env = env_settings()
    ckpt = os.path.join(env.network_path, "kys.msgpack")
    net = kysnet_res50()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        s = params.image_sample_size
        f = s // params.feature_stride
        d = 512
        dummy = jnp.zeros((1, 1, s, s, 3))
        bb = jnp.array([[[100.0, 100.0, 50.0, 50.0]]])
        prop = jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]])
        import jax

        cache = os.path.join(env.network_path, "kys_init.msgpack")
        if os.path.isfile(cache):
            from flax import serialization
            with open(cache, "rb") as fh:
                variables = serialization.msgpack_restore(fh.read())
        else:
            v_main = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                              train=False)
            mf = jnp.zeros((1, f, f, d))
            ds = jnp.zeros((1, f, f, 1))
            il = jnp.zeros((1, f, f, 1))
            v_pred = net.init(jax.random.PRNGKey(1), mf, mf, None, ds, il,
                              method=lambda m, a, b, c, e, g: m.predict_response(
                                  a, b, c, e, init_label=g))
            variables = {"params": {**v_main["params"], **v_pred["params"]},
                         "batch_stats": {**v_main.get("batch_stats", {}),
                                         **v_pred.get("batch_stats", {})}}
            from flax import serialization
            os.makedirs(env.network_path, exist_ok=True)
            with open(cache, "wb") as fh:
                fh.write(serialization.to_bytes(variables))
    return TrackerSpec(params=params, net=net, variables=variables)
