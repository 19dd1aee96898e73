"""LWL parameters for YouTube-VOS (reference pytracking/parameter/lwl/lwl_ytvos.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.lwl.lwl_net import steepest_descent_resnet50
from pytracking_tpu.trackers.lwl import LWLParams
from pytracking_tpu.utils.loading import (load_network, load_or_init_variables,
                                          maybe_bf16_variables)


def parameters() -> TrackerSpec:
    params = LWLParams()

    env = env_settings()
    ckpt = os.path.join(env.network_path, "lwl_stage2.msgpack")
    net = steepest_descent_resnet50(filter_size=3, num_filters=16, optim_iter=5,
                                    out_feature_dim=512,
                                    label_encoder_dims=(16, 32, 64))
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        # the net is fully convolutional — init at a small size (identical params,
        # avoids compiling the full-res training forward just to initialize)
        Hs, Ws = 128, 128
        example = (jnp.zeros((1, 1, Hs, Ws, 3)), jnp.zeros((1, 1, Hs, Ws, 3)),
                   jnp.zeros((1, 1, Hs, Ws)))
        variables = load_or_init_variables(
            net, example,
            cache_path=os.path.join(env.network_path, "lwl_init.msgpack"))
    # PYTRACKING_TPU_BF16=1: params stored bf16 (the VOS serving operating
    # point; J-accuracy-gated by tests/test_bf16_harness_gate.py lwl gate)
    return TrackerSpec(params=params, net=net,
                       variables=maybe_bf16_variables(variables))
