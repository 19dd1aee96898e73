"""LWL box-init training recipe (reference ltr/train_settings/lwl/lwl_boxinit.py):
train the box label encoder (ResidualDS16FeatSWBox) to decode masks from a first-frame
bounding box, on top of the LWL net."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.lwl.lwl_net import steepest_descent_resnet50_boxinit
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_lwl_box_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVOSVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import LWLProcessing
from pytracking_tpu.training.sampler import LWLSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 40,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None,
        output_sz: int = 352):
    settings.description = "LWL boxinit (reference recipe defaults)"
    settings.output_sz = output_sz
    datasets = datasets or [SyntheticVOSVideoDataset(num_sequences=128, seq_len=40)]

    processing = LWLProcessing(search_area_factor=settings.search_area_factor,
                               output_sz=settings.output_sz,
                               center_jitter_factor=settings.center_jitter_factor,
                               scale_jitter_factor=settings.scale_jitter_factor,
                               train_transform=tfm.Transform(
                                   tfm.RandomHorizontalFlip(0.5)),
                               joint_transform=tfm.Transform(
                                   tfm.ToGrayscale(probability=0.05)))
    sampler = LWLSampler(datasets, samples_per_epoch=samples_per_epoch, max_gap=100,
                         num_test_frames=1, num_train_frames=1,
                         processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or steepest_descent_resnet50_boxinit()
    sz = settings.output_sz
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, sz, sz, 3)),
                         jnp.array([[[100.0, 100.0, 50.0, 50.0]]]), train=False,
                         method=net.box_forward)
    actor = make_lwl_box_actor(net)

    # reference lwl_boxinit.py:124-127: ONLY the box label encoder trains (1e-3);
    # StepLR(20, 0.2)
    optimizer = adam_per_module(2e-4, {"box_label_encoder": 1e-3},
                                steps_per_epoch=len(loader), step_size=20,
                                gamma=0.2, freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/lwl/lwl_boxinit",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
