"""PrDiMP-50 training recipe (reference ltr/train_settings/dimp/prdimp50.py)."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module

from pytracking_tpu.models.tracking.dimpnet import klcedimpnet50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_kldimp_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import KLDiMPProcessing
from pytracking_tpu.training.sampler import DiMPSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 50,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None):
    settings.description = "PrDiMP-50 (reference recipe defaults)"
    datasets = datasets or [SyntheticVideoDataset(num_sequences=256, seq_len=40)]

    transform_joint = tfm.Transform(tfm.ToGrayscale(probability=0.05))
    transform_train = tfm.Transform(tfm.BrightnessJitter(0.2),
                                    tfm.RandomHorizontalFlip(0.5))

    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    proposal_params = {"boxes_per_frame": 128,
                       "proposal_sigma": [(0.05, 0.05), (0.5, 0.5)]}
    label_params = {"feature_sz": settings.feature_sz, "sigma_factor": output_sigma,
                    "kernel_sz": settings.target_filter_sz}
    processing = KLDiMPProcessing(search_area_factor=settings.search_area_factor,
                                  output_sz=settings.output_sz,
                                  center_jitter_factor=settings.center_jitter_factor,
                                  scale_jitter_factor=settings.scale_jitter_factor,
                                  proposal_params=proposal_params,
                                  label_function_params=label_params,
                                  train_transform=transform_train,
                                  joint_transform=transform_joint)
    sampler = DiMPSampler(datasets, samples_per_epoch=samples_per_epoch, max_gap=200,
                          num_test_frames=3, num_train_frames=3,
                          processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or klcedimpnet50(filter_size=settings.target_filter_sz,
                               gauss_sigma=output_sigma * settings.feature_sz)
    sz = settings.output_sz
    example = (jnp.zeros((1, 1, sz, sz, 3)), jnp.zeros((1, 1, sz, sz, 3)),
               jnp.array([[[100.0, 100.0, 50.0, 50.0]]]),
               jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]]))
    variables = net.init(jax.random.PRNGKey(0), *example, train=False)
    actor = make_kldimp_actor(net)

    # reference prdimp50.py:111-116: classifier 1e-3, bb_regressor 1e-3,
    # feature_extractor 2e-5, base 2e-4, StepLR(15, 0.2)
    optimizer = adam_per_module(
        2e-4, {"classifier": 1e-3, "bb_regressor": 1e-3,
               "feature_extractor": 2e-5},
        steps_per_epoch=len(loader), step_size=15, gamma=0.2)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/dimp/prdimp50",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
