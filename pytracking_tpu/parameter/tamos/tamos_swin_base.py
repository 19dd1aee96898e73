"""TaMOs-SwinBase parameters (reference pytracking/parameter/tamos/tamos_swin_base.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.tamosnet import tamosnet_swin_base
from pytracking_tpu.trackers.tamos import TaMOsParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = TaMOsParams()

    env = env_settings()
    ckpt = os.path.join(env.network_path, "tamos_swin_base.msgpack")
    # PYTRACKING_TPU_BF16=1: bf16 transformer matmuls (f32 softmax/LN)
    trafo_dtype = jnp.bfloat16 \
        if os.environ.get("PYTRACKING_TPU_BF16", "0") == "1" else None
    net = tamosnet_swin_base(feature_sz=max(params.train_feature_size),
                             num_tokens=params.num_tokens,
                             transformer_dtype=trafo_dtype)
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt, transformer_dtype=trafo_dtype)
    else:
        Hs, Ws = params.image_sample_size
        h, w = params.train_feature_size
        K = params.num_tokens
        # train_ltrb included so init creates the box_encoding params the
        # tracker's parallel cls/bbreg predictor needs
        example = (jnp.zeros((1, 1, Hs, Ws, 3)), jnp.zeros((1, 1, Hs, Ws, 3)),
                   jnp.zeros((1, 1, K, h, w)), jnp.zeros((1, 1, K, h, w, 4)))
        variables = load_or_init_variables(
            net, example,
            cache_path=os.path.join(env.network_path, "tamos_swin_init.msgpack"))
    return TrackerSpec(params=params, net=net, variables=variables)
