"""SuperDiMPSimple parameters (reference
pytracking/parameter/dimp_simple/super_dimp_simple.py): SuperDiMP settings on the
dimpnet50_simple network."""

import os
from dataclasses import replace

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.dimpnet import dimpnet50_simple
from pytracking_tpu.parameter.dimp.dimp50 import parameters as dimp50_parameters
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    base = dimp50_parameters().params
    params = replace(
        base,
        image_sample_size=22 * 16,
        search_area_scale=6.0,
        border_mode="inside_major",
        patch_max_scale_change=1.5,
        box_refinement_space="relative",
        box_refinement_iter=10,
        box_refinement_step_length=2.5e-3,
    )

    env = env_settings()
    ckpt = os.path.join(env.network_path, "super_dimp_simple.msgpack")
    net = dimpnet50_simple()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        s = params.image_sample_size
        example = (jnp.zeros((1, 1, s, s, 3)), jnp.zeros((1, 1, s, s, 3)),
                   jnp.array([[[100.0, 100.0, 50.0, 50.0]]]),
                   jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]]))
        variables = load_or_init_variables(
            net, example,
            cache_path=os.path.join(env.network_path,
                                    "super_dimp_simple_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
