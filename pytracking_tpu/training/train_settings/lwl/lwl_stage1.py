"""LWL stage-1 training recipe (reference ltr/train_settings/lwl/lwl_stage1.py):
train the segmentation stack with the target-model optimizer DETACHED (few epochs,
no refinement backprop) before stage 2 trains end-to-end."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.lwl.lwl_net import steepest_descent_resnet50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.actors.tracking import make_lwl_actor
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVOSVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import LWLProcessing
from pytracking_tpu.training.sampler import LWLSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def run(settings: Settings, datasets=None, max_epochs: int = 70,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None,
        num_refinement_iter: int = 0, ckpt_subdir: str = "lwl/lwl_stage1",
        output_sz: int = 352, num_test_frames: int = 3):
    settings.description = "LWL stage 1 (reference recipe defaults)"
    # reference lwl_stage1.py:30-39: 52*16 crops; here the operating point is a
    # parameter so smoke runs stay small.
    settings.output_sz = output_sz
    datasets = datasets or [SyntheticVOSVideoDataset(num_sequences=128, seq_len=40)]

    transform_joint = tfm.Transform(tfm.ToGrayscale(probability=0.05))
    transform_train = tfm.Transform(tfm.RandomHorizontalFlip(0.5))
    processing = LWLProcessing(search_area_factor=settings.search_area_factor,
                               output_sz=settings.output_sz,
                               center_jitter_factor=settings.center_jitter_factor,
                               scale_jitter_factor=settings.scale_jitter_factor,
                               train_transform=transform_train,
                               joint_transform=transform_joint)
    sampler = LWLSampler(datasets, samples_per_epoch=samples_per_epoch, max_gap=100,
                         num_test_frames=num_test_frames, num_train_frames=1,
                         processing=processing)
    loader = LTRLoader("train", sampler, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers)

    import jax
    import jax.numpy as jnp

    net = net or steepest_descent_resnet50(filter_size=3, num_filters=16,
                                           optim_iter=5)
    sz = settings.output_sz
    example = (jnp.zeros((1, 1, sz, sz, 3)), jnp.zeros((1, 1, sz, sz, 3)),
               jnp.zeros((1, 1, sz, sz)))
    variables = net.init(jax.random.PRNGKey(0), *example,
                         num_refinement_iter=num_refinement_iter, train=False)
    actor = make_lwl_actor(net, num_refinement_iter=num_refinement_iter)

    # reference lwl_stage1.py:132-139: per-module LRs, backbone frozen,
    # MultiStepLR([40], 0.2). The torch filter_initializer/filter_optimizer split
    # maps to target_model here (the scan-based learner's filter_reg) with its
    # feature extractor at 2e-5.
    optimizer = adam_per_module(
        2e-4,
        {"target_model/feature_extractor": 2e-5, "target_model": 1e-4,
         "decoder": 1e-4, "label_encoder": 2e-4},
        steps_per_epoch=len(loader), milestones=(40,), gamma=0.2,
        freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/" + ckpt_subdir,
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
