"""DiMP-18 parameters (reference pytracking/parameter/dimp/dimp18.py): the DiMP-50
settings with the ResNet-18 network."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.dimpnet import dimpnet18
from pytracking_tpu.parameter.dimp.dimp50 import parameters as _base
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    spec = _base()
    env = env_settings()
    ckpt = os.path.join(env.network_path, "dimp18.msgpack")
    net = dimpnet18()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        s = spec.params.image_sample_size
        example = (jnp.zeros((1, 1, s, s, 3)), jnp.zeros((1, 1, s, s, 3)),
                   jnp.array([[[100.0, 100.0, 50.0, 50.0]]]),
                   jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]]))
        variables = load_or_init_variables(
            net, example,
            cache_path=os.path.join(env.network_path, "dimp18_init.msgpack"))
    return TrackerSpec(params=spec.params, net=net, variables=variables)
