"""ATOM probabilistic (GMM-sampled proposals) inference parameters
(reference pytracking/parameter/atom/atom_gmm_sampl.py).

Identical to the default variant except the box refinement — relative box
space, 10 iterations, (1e-2, 5e-2) per-coordinate step lengths (reference
atom_gmm_sampl.py:89-97) — and the checkpoint name (`atom_gmm_sampl`, trained
with GMM proposal sampling in train_settings/bbreg/atom_gmm_sampl.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.atomnet import atom_resnet18
from pytracking_tpu.trackers.atom import ATOMParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = ATOMParams(
        box_refinement_space="relative",
        box_refinement_iter=10,
        box_refinement_step_length=(1e-2, 5e-2),
    )

    env = env_settings()
    ckpt = os.path.join(env.network_path, "atom_gmm_sampl.msgpack")
    net = atom_resnet18()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        example = (jnp.zeros((1, 1, 96, 96, 3)), jnp.zeros((1, 1, 96, 96, 3)),
                   jnp.array([[[30.0, 30.0, 30.0, 30.0]]]),
                   jnp.array([[[[30.0, 30.0, 30.0, 30.0]]]]))
        variables = load_or_init_variables(
            net, example, cache_path=os.path.join(env.network_path,
                                                  "atom_gmm_sampl_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
