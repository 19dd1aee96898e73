"""RTS-50 training recipe (reference ltr/train_settings/rts/rts50.py): joint
segmentation + classification learner training over VOS-style sequences."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.rts.rts_net import rts50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_rts_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVOSVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import RTSProcessing
from pytracking_tpu.training.sampler import LWLSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 200,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None,
        output_sz: int = 352):
    settings.description = "RTS-50 (reference recipe defaults)"
    settings.output_sz = output_sz
    datasets = datasets or [SyntheticVOSVideoDataset(num_sequences=128, seq_len=40)]

    output_sigma = settings.output_sigma_factor / settings.search_area_factor
    label_params = {"feature_sz": output_sz // 16, "sigma_factor": output_sigma,
                    "kernel_sz": 4}
    processing = RTSProcessing(search_area_factor=settings.search_area_factor,
                               output_sz=settings.output_sz,
                               center_jitter_factor=settings.center_jitter_factor,
                               scale_jitter_factor=settings.scale_jitter_factor,
                               label_function_params=label_params,
                               train_transform=tfm.Transform(
                                   tfm.RandomHorizontalFlip(0.5)),
                               joint_transform=tfm.Transform(
                                   tfm.ToGrayscale(probability=0.05)))
    sampler = LWLSampler(datasets, samples_per_epoch=samples_per_epoch, max_gap=100,
                         num_test_frames=3, num_train_frames=1,
                         processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or rts50()
    sz = settings.output_sz
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, sz, sz, 3)),
                         jnp.zeros((1, 1, sz, sz, 3)), jnp.zeros((1, 1, sz, sz)),
                         jnp.array([[[100.0, 100.0, 50.0, 50.0]]]), train=False)
    actor = make_rts_actor(net)

    # reference rts50.py:185-200: backbone layers 2-4 at 4e-5, mask branch at
    # 8e-5, classifier branch at 2e-4, conv1/layer1 frozen,
    # MultiStepLR([25, 115, 160], 0.2)
    optimizer = adam_per_module(
        4e-5,
        {"feature_extractor/layer2_": 4e-5, "feature_extractor/layer3_": 4e-5,
         "feature_extractor/layer4_": 4e-5, "target_model": 8e-5,
         "label_encoder": 8e-5, "decoder": 8e-5, "clf_encoder": 2e-4,
         "fusion_module": 2e-4, "classifier": 2e-4},
        steps_per_epoch=len(loader), milestones=(25, 115, 160), gamma=0.2,
        freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/rts/rts50",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
