"""RTS-50 tracker parameters (reference pytracking/parameter/rts/rts50.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.rts.rts_net import rts50
from pytracking_tpu.trackers.rts import RTSParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = RTSParams()

    env = env_settings()
    ckpt = os.path.join(env.network_path, "rts50.msgpack")
    net = rts50()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        # fully convolutional — init small (identical params, fast CPU init)
        Hs, Ws = 128, 128
        example = (jnp.zeros((1, 1, Hs, Ws, 3)), jnp.zeros((1, 1, Hs, Ws, 3)),
                   jnp.zeros((1, 1, Hs, Ws)),
                   jnp.array([[[30.0, 30.0, 50.0, 50.0]]]))
        variables = load_or_init_variables(
            net, example,
            cache_path=os.path.join(env.network_path, "rts50_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
