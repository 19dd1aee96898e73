"""ATOM training recipe (reference ltr/train_settings/bbreg/atom.py)."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.tracking.atomnet import atom_resnet18
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_atom_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import ATOMProcessing
from pytracking_tpu.training.sampler import ATOMSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 50,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None):
    settings.description = "ATOM IoUNet (reference recipe defaults)"
    datasets = datasets or [SyntheticVideoDataset(num_sequences=256, seq_len=40)]

    transform_joint = tfm.Transform(tfm.ToGrayscale(probability=0.05))
    transform_train = tfm.Transform(tfm.BrightnessJitter(0.2))

    proposal_params = {"min_iou": 0.1, "boxes_per_frame": 16, "proposal_sigma": 0.05}
    processing = ATOMProcessing(search_area_factor=settings.search_area_factor,
                                output_sz=settings.output_sz,
                                center_jitter_factor=settings.center_jitter_factor,
                                scale_jitter_factor=settings.scale_jitter_factor,
                                proposal_params=proposal_params,
                                train_transform=transform_train,
                                joint_transform=transform_joint)
    sampler = ATOMSampler(datasets, samples_per_epoch=samples_per_epoch, max_gap=50,
                          processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or atom_resnet18()
    sz = settings.output_sz
    example = (jnp.zeros((1, 1, sz, sz, 3)), jnp.zeros((1, 1, sz, sz, 3)),
               jnp.array([[[100.0, 100.0, 50.0, 50.0]]]),
               jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]]))
    variables = net.init(jax.random.PRNGKey(0), *example, train=False)
    actor = make_atom_actor(net)

    # reference atom.py:88-89: ONLY bb_regressor trains (1e-3); backbone frozen;
    # StepLR(15, 0.2)
    optimizer = adam_per_module(1e-3, {"bb_regressor": 1e-3},
                                steps_per_epoch=len(loader), step_size=15,
                                gamma=0.2, freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/bbreg/atom",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
