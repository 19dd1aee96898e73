"""ToMP-101 tracker parameters (reference pytracking/parameter/tomp/tomp101.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.tompnet import tompnet101
from pytracking_tpu.trackers.tomp import ToMPParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = ToMPParams()

    env = env_settings()
    ckpt = os.path.join(env.network_path, "tomp101.msgpack")
    bf16 = os.environ.get("PYTRACKING_TPU_BF16_BACKBONE", "0") == "1" or \
        os.environ.get("PYTRACKING_TPU_BF16", "0") == "1"
    backbone_dtype = jnp.bfloat16 if bf16 else None
    trafo_dtype = jnp.bfloat16 \
        if os.environ.get("PYTRACKING_TPU_BF16", "0") == "1" else None
    net = tompnet101(feature_sz=params.train_feature_size,
                     backbone_dtype=backbone_dtype, transformer_dtype=trafo_dtype)
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt, backbone_dtype=backbone_dtype,
                                      transformer_dtype=trafo_dtype)
    else:
        s = params.image_sample_size
        f = params.train_feature_size
        example = (jnp.zeros((1, 1, s, s, 3)), jnp.zeros((1, 1, s, s, 3)),
                   jnp.zeros((1, 1, f, f)), jnp.zeros((1, 1, f, f, 4)))
        variables = load_or_init_variables(
            net, example, cache_path=os.path.join(env.network_path,
                                                  "tomp101_init.msgpack"))
    from pytracking_tpu.utils.loading import maybe_bf16_variables
    variables = maybe_bf16_variables(variables)
    return TrackerSpec(params=params, net=net, variables=variables)
