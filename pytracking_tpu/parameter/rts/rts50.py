"""RTS-50 tracker parameters (reference pytracking/parameter/rts/rts50.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.rts.rts_net import rts50
from pytracking_tpu.trackers.rts import RTSParams
from pytracking_tpu.utils.loading import (load_network, load_or_init_variables,
                                          maybe_bf16_variables)


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

    def sta_factory():
        """Lazy STA box->mask net for box-only init (reference rts.py:62-64 builds
        STAHelper on demand; parameter/rts/rts50.py:20-30 sta_net)."""
        from pytracking_tpu.models.lwl.sta_net import sta_resnet50

        sta_net = sta_resnet50()
        sta_ckpt = os.path.join(env.network_path, "sta.msgpack")
        if os.path.isfile(sta_ckpt + ".json"):
            return load_network(sta_ckpt)
        example = (jnp.zeros((1, 1, 128, 128, 3)),
                   jnp.array([[[30.0, 30.0, 50.0, 50.0]]]))
        sta_variables = load_or_init_variables(
            sta_net, example,
            cache_path=os.path.join(env.network_path, "sta_init.msgpack"))
        return sta_net, sta_variables

    # PYTRACKING_TPU_BF16=1: params stored bf16 (mask drift gated at the
    # LWL level — same decoder/few-shot math; see test_bf16_harness_gate.py)
    return TrackerSpec(params=params, net=net,
                       variables=maybe_bf16_variables(variables),
                       tracker_kwargs={"sta_factory": sta_factory})
