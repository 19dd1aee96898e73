"""TaMOs-ResNet-50 training recipe (reference
ltr/train_settings/tamos/tamos_resnet50.py): multi-object transformer tracker with
K target slots; single-object samples occupy slot 0 with the rest masked."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.tracking.tamosnet import tamosnet_resnet50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_tamos_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import TaMOsProcessing
from pytracking_tpu.training.sampler import TaMOsDatasetSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 100,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None,
        num_objects: int = 3, output_sz: int = 288):
    settings.description = "TaMOs-ResNet-50 (reference recipe defaults)"
    settings.output_sz = output_sz
    settings.feature_sz = output_sz // 16
    datasets = datasets or [SyntheticVideoDataset(num_sequences=128, seq_len=40)]

    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    label_params = {"feature_sz": settings.feature_sz, "sigma_factor": output_sigma,
                    "kernel_sz": 1, "stride": 16}
    processing = TaMOsProcessing(search_area_factor=settings.search_area_factor,
                                 output_sz=settings.output_sz,
                                 center_jitter_factor=settings.center_jitter_factor,
                                 scale_jitter_factor=settings.scale_jitter_factor,
                                 label_function_params=label_params,
                                 num_objects=num_objects, stride_high=8,
                                 train_transform=tfm.Transform(
                                     tfm.BrightnessJitter(0.2),
                                     tfm.RandomHorizontalFlip(0.5)),
                                 joint_transform=tfm.Transform(
                                     tfm.ToGrayscale(probability=0.05)))
    sampler = TaMOsDatasetSampler(datasets, samples_per_epoch=samples_per_epoch,
                          max_gap=200, num_test_frames=1, num_train_frames=1,
                          processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or tamosnet_resnet50(num_tokens=num_objects,
                                   feature_sz=settings.feature_sz,
                                   freeze_backbone_bn=True)
    sz, K, h = settings.output_sz, num_objects, settings.feature_sz
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, sz, sz, 3)),
        jnp.zeros((1, 1, sz, sz, 3)), jnp.zeros((1, 1, K, h, h)),
        jnp.zeros((1, 1, K, 4, h, h)), train=False)
    actor = make_tamos_actor(net)

    # reference tamos_resnet50.py:179-184: AdamW, head at 1e-4 + backbone layer3
    # at 2e-5, rest frozen, MultiStepLR([150, 250], 0.2). "head" in torch covers
    # everything but the backbone.
    optimizer = adam_per_module(
        2e-4,
        {"head_feature_extractor": 1e-4, "filter_predictor": 1e-4,
         "classifier": 1e-4, "bb_regressor": 1e-4, "fpn": 1e-4,
         "feature_extractor/layer3_": 2e-5},
        steps_per_epoch=len(loader), milestones=(150, 250), gamma=0.2,
        weight_decay=1e-4, freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/tamos/tamos_resnet50",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
