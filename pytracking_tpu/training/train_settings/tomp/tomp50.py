"""ToMP-50 training recipe (reference ltr/train_settings/tomp/tomp50.py)."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module

from pytracking_tpu.models.tracking.tompnet import tompnet50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_tomp_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import ToMPProcessing
from pytracking_tpu.training.sampler import DiMPSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 300,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None):
    settings.description = "ToMP-50 (reference recipe defaults)"
    datasets = datasets or [SyntheticVideoDataset(num_sequences=256, seq_len=40)]

    transform_joint = tfm.Transform(tfm.ToGrayscale(probability=0.05))
    transform_train = tfm.Transform(tfm.BrightnessJitter(0.2),
                                    tfm.RandomHorizontalFlip(0.5))

    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    label_params = {"feature_sz": settings.feature_sz, "sigma_factor": output_sigma,
                    "kernel_sz": 1, "stride": 16}
    processing = ToMPProcessing(search_area_factor=settings.search_area_factor,
                                output_sz=settings.output_sz,
                                center_jitter_factor=settings.center_jitter_factor,
                                scale_jitter_factor=settings.scale_jitter_factor,
                                label_function_params=label_params,
                                train_transform=transform_train,
                                joint_transform=transform_joint)

    sampler = DiMPSampler(datasets, samples_per_epoch=samples_per_epoch, max_gap=200,
                          num_test_frames=1, num_train_frames=2,
                          processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or tompnet50(feature_sz=settings.feature_sz,
                           freeze_backbone_bn=True)
    sz = settings.output_sz
    f = settings.feature_sz
    example = (jnp.zeros((2, 1, sz, sz, 3)), jnp.zeros((1, 1, sz, sz, 3)),
               jnp.zeros((2, 1, f, f)), jnp.zeros((2, 1, f, f, 4)))
    variables = net.init(jax.random.PRNGKey(0), *example, train=False)
    actor = make_tomp_actor(net)

    # reference tomp50.py:139-144: AdamW trains ONLY head (1e-4) + backbone layer3
    # (2e-5); everything else frozen; MultiStepLR([150, 250], 0.2)
    optimizer = adam_per_module(
        2e-4, {"head": 1e-4, "feature_extractor/layer3_": 2e-5},
        steps_per_epoch=len(loader), milestones=(150, 250), gamma=0.2,
        weight_decay=1e-4, freeze_unlisted=True)

    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/tomp/tomp50",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
