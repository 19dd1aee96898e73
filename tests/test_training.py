"""Training stack: processing/labels/sampler/loader shapes + a 2-step smoke training
run of the DiMP recipe on a tiny net and synthetic data (CPU, 8 virtual devices DP)."""

import math

import numpy as np
import pytest

from pytracking_tpu.training import processing_utils as prutils
from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
from pytracking_tpu.training.loader import LTRLoader
from pytracking_tpu.training.processing import DiMPProcessing
from pytracking_tpu.training.sampler import DiMPSampler
from pytracking_tpu.training import transforms as tfm


def test_sample_target_geometry():
    im = np.zeros((100, 120, 3), np.uint8)
    im[40:60, 50:70] = 255
    crop, rf = prutils.sample_target(im, [50, 40, 20, 20], 5.0, 100)
    assert crop.shape == (100, 100, 3)
    # target occupies the center fifth of the crop
    c = crop[40:60, 40:60]
    assert c.mean() > 200
    assert crop[:10, :10].mean() < 50


def test_gaussian_label_function_peak():
    # box centered in a 288 crop -> label peak at feature center
    bb = np.array([[134.0, 134.0, 20.0, 20.0]])
    label = prutils.gaussian_label_function(bb, 0.25 / 5.0, 4, 18, 288)
    assert label.shape == (1, 19, 19)
    idx = np.unravel_index(label[0].argmax(), label[0].shape)
    assert idx == (9, 9)
    assert abs(label[0].max() - 1.0) < 1e-4


def test_perturb_box_iou_bound():
    box = np.array([50.0, 50.0, 30.0, 30.0])
    for _ in range(10):
        pb, iou = prutils.perturb_box(box, min_iou=0.5, sigma_factor=0.1)
        assert iou > 0.4


def test_processing_and_sampler_shapes():
    ds = SyntheticVideoDataset(num_sequences=4, seq_len=30)
    processing = DiMPProcessing(
        search_area_factor=5.0, output_sz=96,
        center_jitter_factor={"train": 3, "test": 4.5},
        scale_jitter_factor={"train": 0.25, "test": 0.5},
        proposal_params={"min_iou": 0.1, "boxes_per_frame": 8, "proposal_sigma": 0.05},
        label_function_params={"feature_sz": 6, "sigma_factor": 0.05, "kernel_sz": 4},
        train_transform=tfm.Transform(tfm.RandomHorizontalFlip(0.5)),
        joint_transform=tfm.Transform(tfm.ToGrayscale(0.1)))
    sampler = DiMPSampler([ds], samples_per_epoch=8, max_gap=10,
                          num_test_frames=2, num_train_frames=2,
                          processing=processing)
    data = sampler[0]
    assert len(data["train_images"]) == 2
    assert data["train_images"][0].shape == (96, 96, 3)
    assert data["test_proposals"][0].shape == (8, 4)
    assert data["test_label"][0].shape == (7, 7)

    loader = LTRLoader("train", sampler, batch_size=4, num_workers=2)
    batch = next(iter(loader))
    assert batch["train_images"].shape == (2, 4, 96, 96, 3)
    assert batch["train_anno"].shape == (2, 4, 4)
    assert batch["test_proposals"].shape == (2, 4, 8, 4)
    assert batch["proposal_iou"].shape == (2, 4, 8)
    assert batch["test_label"].shape == (2, 4, 7, 7)


@pytest.mark.filterwarnings("ignore")
def test_train_smoke_two_steps(tmp_path):
    """Two optimizer steps of the full DiMP objective on a tiny net, data-parallel over
    the 8 virtual CPU devices; loss must be finite and params must change."""
    import jax
    import jax.numpy as jnp
    import optax

    from pytracking_tpu.parallel.mesh import make_mesh, make_train_step, shard_batch
    from pytracking_tpu.training.actors.tracking import make_dimp_actor
    from tests.test_dimp_tracker import tiny_dimpnet

    net = tiny_dimpnet()
    S = 8
    sz = 64
    rng = np.random.RandomState(0)
    batch = {
        "train_images": jnp.asarray(rng.rand(2, S, sz, sz, 3) * 255, jnp.float32),
        "test_images": jnp.asarray(rng.rand(1, S, sz, sz, 3) * 255, jnp.float32),
        "train_anno": jnp.asarray(rng.rand(2, S, 4) * 10 + 20, jnp.float32),
        "test_proposals": jnp.asarray(rng.rand(1, S, 4, 4) * 10 + 20, jnp.float32),
        "proposal_iou": jnp.asarray(rng.rand(1, S, 4), jnp.float32),
        "test_label": jnp.asarray(rng.rand(1, S, 5, 5), jnp.float32),
    }
    variables = net.init(jax.random.PRNGKey(0), batch["train_images"],
                         batch["test_images"], batch["train_anno"],
                         batch["test_proposals"], train=False)
    actor = make_dimp_actor(net, train=True)
    optimizer = optax.adam(1e-4)
    step = make_train_step(actor, optimizer)

    mesh = make_mesh()
    params = variables["params"]
    opt_state = optimizer.init(params)
    bs = variables.get("batch_stats")
    p0 = float(jax.tree_util.tree_reduce(
        lambda a, x: a + np.abs(np.asarray(x)).sum(), params, 0.0))
    with mesh:
        sharded = shard_batch(mesh, batch)
        for _ in range(2):
            params, bs, opt_state, loss, stats = step(params, bs, opt_state, sharded)
        loss = float(loss)
    assert np.isfinite(loss)
    p1 = float(jax.tree_util.tree_reduce(
        lambda a, x: a + np.abs(np.asarray(x)).sum(), params, 0.0))
    assert p0 != p1
    assert np.isfinite(float(stats["ClfTrain/test_acc"]))
