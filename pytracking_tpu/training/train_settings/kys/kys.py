"""KYS training recipe (reference ltr/train_settings/kys/kys.py): train the
scene-propagation module on causal frame sequences with the appearance model frozen
(the reference loads a pretrained DiMP and trains predictor-only; pass
`trainable_filter` through optax.masked if finetuning everything)."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.tracking.kysnet import kysnet_res50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_kys_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import KYSProcessing
from pytracking_tpu.training.sampler import KYSSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 40,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None,
        num_test_frames: int = 10):
    settings.description = "KYS (reference recipe defaults)"
    datasets = datasets or [SyntheticVideoDataset(num_sequences=128, seq_len=60)]

    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    label_params = {"feature_sz": settings.feature_sz, "sigma_factor": output_sigma,
                    "kernel_sz": settings.target_filter_sz}
    # reference recipe (ltr/train_settings/kys/kys.py:61-78): synthetic-motion
    # jitter with limited test motion + occlusion-spanning sequence sampling
    processing = KYSProcessing(search_area_factor=settings.search_area_factor,
                               output_sz=settings.output_sz,
                               center_jitter_param={"train_factor": 3.0,
                                                    "train_mode": "uniform",
                                                    "test_factor": 4.5,
                                                    "test_limit_motion": True,
                                                    "test_mode": "uniform"},
                               scale_jitter_param={"train_factor": 0.25,
                                                   "test_factor": 0.3},
                               label_function_params=label_params,
                               min_crop_inside_ratio=0.1,
                               train_transform=tfm.Transform(
                                   tfm.BrightnessJitter(0.2)),
                               joint_transform=tfm.Transform(
                                   tfm.ToGrayscale(probability=0.05)))
    sampler = KYSSampler(datasets, samples_per_epoch=samples_per_epoch,
                         sequence_sample_info={"num_train_frames": 3,
                                               "num_test_frames": num_test_frames,
                                               "max_train_gap": 30,
                                               "allow_missing_target": True,
                                               "min_fraction_valid_frames": 0.5,
                                               "mode": "Sequence"},
                         processing=processing,
                         sample_occluded_sequences=True)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or kysnet_res50(optim_iter=3)
    sz = settings.output_sz
    dummy = jnp.zeros((1, 1, sz, sz, 3))
    bb = jnp.array([[[100.0, 100.0, 50.0, 50.0]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, bb[:, :, None],
                         train=False)
    h = settings.feature_sz
    mf = jnp.zeros((1, h, h, 512))
    ds = jnp.zeros((1, h, h, 1))
    v_pred = net.init(jax.random.PRNGKey(1), mf, mf, None, ds, ds,
                      method=lambda m, a, b, c, e, f: m.predict_response(
                          a, b, c, e, init_label=f))
    params = {**variables["params"], **v_pred["params"]}
    batch_stats = {**variables.get("batch_stats", {}),
                   **v_pred.get("batch_stats", {})}
    # reference kys.py:136-140: distractor-score augmentation so the propagation
    # module learns not to blindly trust the appearance model
    from pytracking_tpu.models.kys.score_jitter import DiMPScoreJittering
    dimp_jitter_fn = DiMPScoreJittering(distractor_ratio=0.1, p_distractor=0.3,
                                        max_distractor_enhance_factor=1.3,
                                        min_distractor_enhance_factor=0.8)
    actor = make_kys_actor(net, dimp_jitter_fn=dimp_jitter_fn)

    # reference kys.py:141-144: ONLY the response predictor trains (1e-2); the
    # DiMP base net is frozen; StepLR(15, 0.2)
    optimizer = adam_per_module(1e-2, {"predictor": 1e-2},
                                steps_per_epoch=len(loader), step_size=15,
                                gamma=0.2, freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/kys/kys",
                         params=params, batch_stats=batch_stats or None, mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
