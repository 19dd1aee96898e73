"""ATOM default parameters (reference pytracking/parameter/atom/default.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.atomnet import atom_resnet18
from pytracking_tpu.trackers.atom import ATOMParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = ATOMParams()

    env = env_settings()
    ckpt = os.path.join(env.network_path, "atom_default.msgpack")
    net = atom_resnet18()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        example = (jnp.zeros((1, 1, 96, 96, 3)), jnp.zeros((1, 1, 96, 96, 3)),
                   jnp.array([[[30.0, 30.0, 30.0, 30.0]]]),
                   jnp.array([[[[30.0, 30.0, 30.0, 30.0]]]]))
        variables = load_or_init_variables(
            net, example, cache_path=os.path.join(env.network_path,
                                                  "atom_default_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
