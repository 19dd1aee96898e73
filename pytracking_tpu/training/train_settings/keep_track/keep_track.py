"""KeepTrack target-candidate-matching training recipe (reference
ltr/train_settings/keep_track/keep_track.py): trains the SuperGlue matcher on
candidate pairs. The reference consumes a 'distractor dataset' dumped by running
super_dimp over LaSOT (util_scripts/create_distractor_dataset.py); here a procedural
candidate-pair generator stands in when that dump is absent."""

from __future__ import annotations

import numpy as np
import optax

from pytracking_tpu.training.optim import adam_per_module, step_lr

from pytracking_tpu.models.tcm.target_candidate_matching import \
    target_candidate_matching_net_resnet50
from pytracking_tpu.parallel.mesh import make_mesh
from pytracking_tpu.training.actors.tracking import make_tcm_actor
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.trainer import LTRTrainer


class SyntheticCandidateDataset:
    """Candidate pairs over synthetic frames: K candidate slots per frame, the
    ground-truth matching is identity over matchable slots with a random subset
    routed to the dustbin."""

    def __init__(self, num_samples: int = 2000, K: int = 8, im_sz: int = 288):
        self.num_samples = num_samples
        self.K = K
        self.im_sz = im_sz

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        from pytracking_tpu.evaluation.adapters.synthetic import \
            render_synthetic_frame

        rng = np.random.RandomState(i)
        K, S = self.K, self.im_sz
        img0 = render_synthetic_frame(i % 16, rng.randint(0, 20), S, S)
        img1 = render_synthetic_frame(i % 16, rng.randint(0, 20), S, S)
        coords = rng.randint(0, S // 16, (K, 2))
        jitter = np.clip(coords + rng.randint(-1, 2, (K, 2)), 0, S // 16 - 1)
        matchable = rng.rand(K) > 0.3
        gt_matches = np.where(matchable, np.arange(K), -1)
        gt_assign = np.zeros((K, K), np.float32)
        gt_assign[np.arange(K)[matchable], np.arange(K)[matchable]] = 1.0
        return {
            "img0": img0.astype(np.float32), "img1": img1.astype(np.float32),
            "tsm_coords0": coords.astype(np.int32),
            "tsm_coords1": jitter.astype(np.int32),
            "img_coords0": (coords * 16).astype(np.float32),
            "img_coords1": (jitter * 16).astype(np.float32),
            "scores0": rng.rand(K).astype(np.float32),
            "scores1": rng.rand(K).astype(np.float32),
            "gt_assignment": gt_assign,
            "gt_matches0": gt_matches.astype(np.int32),
            "gt_matches1": gt_matches.astype(np.int32),
        }


def run(settings: Settings, datasets=None, max_epochs: int = 15,
        samples_per_epoch: int = 2000, use_mesh: bool = True, net=None,
        im_sz: int = 288, K: int = 8):
    settings.description = "KeepTrack TCM (reference recipe defaults)"
    dataset = (datasets or [SyntheticCandidateDataset(samples_per_epoch, K=K,
                                                      im_sz=im_sz)])[0]
    loader = LTRLoader("train", dataset, training=True,
                       batch_size=settings.batch_size,
                       num_workers=settings.num_workers, stack_dim=0)

    import jax
    import jax.numpy as jnp

    net = net or target_candidate_matching_net_resnet50(image_shape=(im_sz, im_sz))
    sample = dataset[0]
    args = [jnp.asarray(sample[k])[None] for k in
            ("img0", "img1", "tsm_coords0", "tsm_coords1", "img_coords0",
             "img_coords1", "scores0", "scores1")]
    variables = net.init(jax.random.PRNGKey(0), *args, train=False)
    actor = make_tcm_actor(net)

    # reference keep_track.py:119-121: whole net at 1e-4, StepLR(6, 0.2)
    optimizer = optax.adam(step_lr(1e-4, len(loader), step_size=6, gamma=0.2))
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    trainer = LTRTrainer(actor, [loader], optimizer, settings,
                         settings.checkpoint_dir + "/keep_track/keep_track",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"), mesh=mesh,
                         print_interval=settings.print_interval)
    trainer.train(max_epochs, load_latest=True, fail_safe=True)
    return trainer
