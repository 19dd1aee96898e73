"""KeepTrack default parameters (reference pytracking/parameter/keep_track/default.py):
SuperDiMP base tracker + target-candidate-matching association network."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tcm.target_candidate_matching import \
    target_candidate_matching_net_resnet50
from pytracking_tpu.models.tracking.dimpnet import dimpnet50
from pytracking_tpu.trackers.keep_track import KeepTrackParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = KeepTrackParams()

    env = env_settings()
    net = dimpnet50()
    ckpt = os.path.join(env.network_path, "super_dimp_simple.msgpack")
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        s = params.image_sample_size
        example = (jnp.zeros((1, 1, s, s, 3)), jnp.zeros((1, 1, s, s, 3)),
                   jnp.array([[[100.0, 100.0, 50.0, 50.0]]]),
                   jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]]))
        variables = load_or_init_variables(
            net, example,
            cache_path=os.path.join(env.network_path, "super_dimp_kt_init.msgpack"))

    tcm_net = target_candidate_matching_net_resnet50(
        image_shape=(params.image_sample_size, params.image_sample_size))
    tcm_ckpt = os.path.join(env.network_path, "keep_track_tcm.msgpack")
    if os.path.isfile(tcm_ckpt + ".json"):
        tcm_net, tcm_variables = load_network(tcm_ckpt)
    else:
        import jax

        K = params.max_candidates
        s = params.image_sample_size
        tcm_variables = load_or_init_variables(
            tcm_net,
            (jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)),
             jnp.zeros((1, K, 2), jnp.int32), jnp.zeros((1, K, 2), jnp.int32),
             jnp.zeros((1, K, 2)), jnp.zeros((1, K, 2)),
             jnp.zeros((1, K)), jnp.zeros((1, K))),
            cache_path=os.path.join(env.network_path, "keep_track_tcm_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables,
                       tracker_kwargs={"tcm_net": tcm_net,
                                       "tcm_variables": tcm_variables})
