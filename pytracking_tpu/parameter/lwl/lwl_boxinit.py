"""LWL box-init parameters (reference pytracking/parameter/lwl/lwl_boxinit.py):
the LWL tracker with the box-initialized network (LWTLBoxNet), so tracking can start
from a bounding box instead of a mask — the box label encoder predicts the
first-frame label encoding."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.lwl.lwl_net import steepest_descent_resnet50_boxinit
from pytracking_tpu.trackers.lwl import LWLParams
from pytracking_tpu.utils.loading import (load_network, load_or_init_variables,
                                          maybe_bf16_variables)


def parameters() -> TrackerSpec:
    params = LWLParams()
    env = env_settings()
    ckpt = os.path.join(env.network_path, "lwl_boxinit.msgpack")
    net = steepest_descent_resnet50_boxinit()
    if os.path.isfile(ckpt + ".json"):
        net, variables = load_network(ckpt)
    else:
        cache = os.path.join(env.network_path, "lwl_boxinit_init.msgpack")
        if os.path.isfile(cache):
            from flax import serialization
            with open(cache, "rb") as f:
                variables = serialization.msgpack_restore(f.read())
        else:
            import jax

            Hs, Ws = 128, 128          # fully convolutional — small init
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                imgs = jnp.zeros((1, 1, Hs, Ws, 3))
                masks = jnp.zeros((1, 1, Hs, Ws))
                bb = jnp.array([[[30.0, 30.0, 50.0, 50.0]]])
                # standard LWL forward covers everything except the box encoder
                v_main = net.init(jax.random.PRNGKey(0), imgs, imgs, masks,
                                  num_refinement_iter=0, train=False)
                v_box = net.init(jax.random.PRNGKey(1), imgs, bb, train=False,
                                 method=net.box_forward)
            variables = {
                "params": {**v_main["params"], **v_box["params"]},
                "batch_stats": {**v_main.get("batch_stats", {}),
                                **v_box.get("batch_stats", {})},
            }
            from flax import serialization
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            with open(cache + ".tmp", "wb") as f:
                f.write(serialization.to_bytes(variables))
            os.replace(cache + ".tmp", cache)
    # PYTRACKING_TPU_BF16=1: params stored bf16 (J-gated, see lwl_ytvos.py)
    return TrackerSpec(params=params, net=net,
                       variables=maybe_bf16_variables(variables))
