"""ATOM probabilistic-ML recipe (reference ltr/train_settings/bbreg/atom_prob_ml.py):
trains the IoU head as a density predictor with the KL/NLL maximum-likelihood
objective (AtomBBKLActor, ltr/actors/bbreg.py:32) over mixture-sampled proposals."""

from __future__ import annotations

import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.tracking.atomnet import atom_resnet18
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training import transforms as tfm
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import KLDiMPProcessing
from pytracking_tpu.training.sampler import ATOMSampler
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


def make_atom_bbkl_actor(net, train: bool = True):
    """NLL of the ground-truth box under the predicted proposal density
    (reference ltr/actors/bbreg.py:32-60 AtomBBKLActor)."""
    import jax.numpy as jnp

    from pytracking_tpu.models.loss.kl_regression import kl_regression

    def actor(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train and batch_stats is not None:
            bb_scores, mutated = net.apply(
                variables, batch["train_images"], batch["test_images"],
                batch["train_anno"], batch["test_proposals"], train=True,
                mutable=["batch_stats"])
            new_bs = mutated["batch_stats"]
        else:
            bb_scores = net.apply(variables, batch["train_images"],
                                  batch["test_images"], batch["train_anno"],
                                  batch["test_proposals"], train=False)
            new_bs = batch_stats
        loss = kl_regression(bb_scores, batch["proposal_density"],
                             batch["gt_density"], mc_dim=-1)
        return loss, ({"Loss/total": loss, "Loss/bb_ce": loss}, new_bs)

    return actor


def run(settings: Settings, datasets=None, max_epochs: int = 50,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None):
    settings.description = "ATOM prob-ML (reference recipe defaults)"
    datasets = datasets or [SyntheticVideoDataset(num_sequences=256, seq_len=40)]

    proposal_params = {"boxes_per_frame": 128,
                       "proposal_sigma": [(0.05, 0.05), (0.5, 0.5)]}
    processing = KLDiMPProcessing(search_area_factor=settings.search_area_factor,
                                  output_sz=settings.output_sz,
                                  center_jitter_factor=settings.center_jitter_factor,
                                  scale_jitter_factor=settings.scale_jitter_factor,
                                  proposal_params=proposal_params,
                                  train_transform=tfm.Transform(
                                      tfm.BrightnessJitter(0.2)),
                                  joint_transform=tfm.Transform(
                                      tfm.ToGrayscale(probability=0.05)))
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
    actor = make_atom_bbkl_actor(net)

    # reference atom_prob_ml.py:90-91: ONLY bb_regressor trains (1e-3)
    optimizer = adam_per_module(1e-3, {"bb_regressor": 1e-3},
                                steps_per_epoch=len(loader), step_size=15,
                                gamma=0.2, freeze_unlisted=True)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/bbreg/atom_prob_ml",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
