"""DiMP-50 tracker parameters (reference pytracking/parameter/dimp/dimp50.py)."""

import os

import jax.numpy as jnp

from pytracking_tpu.evaluation.environment import env_settings
from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.models.tracking.dimpnet import dimpnet50
from pytracking_tpu.trackers.dimp import DiMPParams
from pytracking_tpu.utils.loading import load_network, load_or_init_variables


def parameters() -> TrackerSpec:
    params = DiMPParams(
        image_sample_size=18 * 16,
        search_area_scale=5.0,
        kernel_size=4,
        sample_memory_size=50,
        learning_rate=0.01,
        init_samples_minimum_weight=0.25,
        train_skipping=20,
        update_classifier=True,
        net_opt_iter=10,
        net_opt_update_iter=2,
        net_opt_hn_iter=1,
        window_output=False,
        advanced_localization=True,
        target_not_found_threshold=0.25,
        distractor_threshold=0.8,
        hard_negative_threshold=0.5,
        target_neighborhood_scale=2.2,
        displacement_scale=0.8,
        hard_negative_learning_rate=0.02,
        update_scale_when_uncertain=True,
        iounet_augmentation=False,
        iounet_k=3,
        num_init_random_boxes=9,
        box_jitter_pos=0.1,
        box_jitter_sz=0.5,
        maximal_aspect_ratio=6.0,
        box_refinement_iter=5,
        box_refinement_step_length=1.0,
        box_refinement_step_decay=1.0,
    )

    env = env_settings()
    ckpt = os.path.join(env.network_path, "dimp50.msgpack")
    # optional bf16 backbone compute (PYTRACKING_TPU_BF16_BACKBONE=1). Measured on
    # v5e: only ~17% faster than f32 (XLA already runs f32 convs with bf16 MXU
    # passes) and needs bf16-cast params to avoid pathological per-step casts —
    # default off.
    bf16 = os.environ.get("PYTRACKING_TPU_BF16_BACKBONE", "0") == "1"
    # PYTRACKING_TPU_BF16=1: end-to-end bf16 — bf16 backbone compute AND all
    # float32 parameters stored bf16 (backbone + classifier feature extractor +
    # IoU-Net + meta-optimizer constants), which halves the per-frame weight
    # HBM traffic everywhere. Modules without an explicit compute dtype promote
    # bf16 params × f32 activations to f32 compute, so only the weight LOADS
    # shrink there; the backbone runs fully bf16.
    bf16_e2e = os.environ.get("PYTRACKING_TPU_BF16", "0") == "1"
    backbone_dtype = jnp.bfloat16 if (bf16 or bf16_e2e) else None
    net = dimpnet50(backbone_dtype=backbone_dtype)
    if os.path.isfile(ckpt + ".json"):
        # pass the dtype through so checkpoint deployments keep bf16 backbone
        # compute (load_network rebuilds the net from stored constructor kwargs)
        net, variables = load_network(ckpt, backbone_dtype=backbone_dtype)
    else:
        s = params.image_sample_size
        example = (jnp.zeros((1, 1, s, s, 3)), jnp.zeros((1, 1, s, s, 3)),
                   jnp.array([[[100.0, 100.0, 50.0, 50.0]]]),
                   jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]]))
        variables = load_or_init_variables(
            net, example, cache_path=os.path.join(env.network_path, "dimp50_init.msgpack"))
    from pytracking_tpu.utils.loading import maybe_bf16_variables
    variables = maybe_bf16_variables(variables)
    return TrackerSpec(params=params, net=net, variables=variables)
