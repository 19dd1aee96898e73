"""ATOM probabilistic (ML regression) inference parameters
(reference pytracking/parameter/atom/atom_prob_ml.py).

Identical to the default variant except the box refinement, which for the
probabilistically-trained IoU head runs in the relative box space with small
per-coordinate step lengths (reference atom_prob_ml.py:89-97), and the
checkpoint name (`atom_prob_ml`, the KL/ML-regression-trained network from
train_settings/bbreg/atom_prob_ml.py)."""

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
        box_refinement_step_length=(2e-4, 10e-4),
    )

    env = env_settings()
    ckpt = os.path.join(env.network_path, "atom_prob_ml.msgpack")
    net = atom_resnet18()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        example = (jnp.zeros((1, 1, 96, 96, 3)), jnp.zeros((1, 1, 96, 96, 3)),
                   jnp.array([[[30.0, 30.0, 30.0, 30.0]]]),
                   jnp.array([[[[30.0, 30.0, 30.0, 30.0]]]]))
        variables = load_or_init_variables(
            net, example, cache_path=os.path.join(env.network_path,
                                                  "atom_prob_ml_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
