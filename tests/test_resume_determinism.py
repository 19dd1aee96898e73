"""Checkpoint/resume determinism: a 5-epoch LTRTrainer run interrupted after
epoch 2 and resumed from the checkpoint must reproduce the uninterrupted run's
loss trajectory exactly (params + optimizer state round-trip through the atomic
msgpack checkpoints; VERDICT round-1 item #9)."""

import numpy as np
import pytest


class _FixedLoader:
    """Deterministic loader: the same precomputed batches every epoch."""

    def __init__(self, batches):
        self.batches = batches
        self.name = "train"
        self.training = True
        self.epoch_interval = 1

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _make_batches(n=2):
    import jax.numpy as jnp

    from pytracking_tpu.training.processing_utils import gaussian_label_function

    sz = 96
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(n):
        S = 2
        trains, tests, tr_bb, te_bb = [], [], [], []
        for _ in range(S):
            for dst, bbs in ((trains, tr_bb), (tests, te_bb)):
                im = rng.rand(sz, sz, 3).astype(np.float32) * 60
                x, y = rng.randint(20, sz - 40, 2)
                im[y:y + 24, x:x + 24] = 220.0
                dst.append(im)
                bbs.append([float(x), float(y), 24.0, 24.0])
        te_bb_np = np.asarray(te_bb, np.float32)
        label = gaussian_label_function(te_bb_np, 0.05, 4, sz // 16, sz,
                                        end_pad_if_even=True)
        batches.append({
            "train_images": jnp.asarray(np.stack(trains))[None],
            "test_images": jnp.asarray(np.stack(tests))[None],
            "train_anno": jnp.asarray(np.asarray(tr_bb, np.float32))[None],
            "test_proposals": jnp.asarray(te_bb_np)[None, :, None],
            "proposal_iou": jnp.ones((1, S, 1)),
            "test_label": jnp.asarray(label)[None],
        })
    return batches


def _run(tmpdir, epochs, batches, tag):
    import jax
    import optax

    from test_dimp_tracker import tiny_dimpnet
    from pytracking_tpu.training.actors.tracking import make_dimp_actor
    from pytracking_tpu.training.settings import Settings
    from pytracking_tpu.training.trainer import LTRTrainer

    net = tiny_dimpnet()
    b0 = batches[0]
    variables = net.init(jax.random.PRNGKey(0), b0["train_images"],
                         b0["test_images"], b0["train_anno"],
                         b0["test_proposals"], train=False)
    settings = Settings()
    settings.batch_size = 1
    loader = _FixedLoader(batches)
    trainer = LTRTrainer(make_dimp_actor(net, train=False), [loader],
                         optax.adam(1e-3), settings,
                         str(tmpdir) + f"/dimp/{tag}",
                         params=variables["params"],
                         batch_stats=variables.get("batch_stats"),
                         print_interval=1000)
    losses = []

    orig_cycle = trainer.cycle_dataset

    def recording_cycle(ld):
        orig_cycle(ld)
        losses.append(trainer.stats["train"]["Loss/total"].avg)

    trainer.cycle_dataset = recording_cycle
    trainer.train(epochs, load_latest=True, fail_safe=False)
    return trainer, losses


@pytest.mark.filterwarnings("ignore")
def test_resume_reproduces_uninterrupted_trajectory(tmp_path):
    batches = _make_batches()

    # uninterrupted 5-epoch run
    _, losses_full = _run(tmp_path / "a", 5, batches, "full")
    assert len(losses_full) == 5

    # interrupted: 2 epochs, then a fresh trainer resumes from the checkpoint
    _run(tmp_path / "b", 2, batches, "resume")
    _, losses_resumed = _run(tmp_path / "b", 5, batches, "resume")
    assert len(losses_resumed) == 3           # epochs 3..5 only

    np.testing.assert_allclose(losses_resumed, losses_full[2:], rtol=1e-6,
                               err_msg="resumed trajectory diverged")
