"""Round-2 regression tests: multi-object init/merge fixes, presence-score files,
DAVIS decay binning, and golden parity of the eval robustness rules against the
reference implementation."""

import os

import numpy as np
import pytest


# ---------------------------------------------------------------- LWL init merge

def test_lwl_multiobj_init_merge_keeps_background():
    """initialize() must emit logits-convention segmentation_raw so that
    merge_results' sigmoid doesn't label the whole background as object 1
    (round-1 advisor finding, trackers/lwl.py:146)."""
    import jax

    import jax.numpy as jnp

    from pytracking_tpu.evaluation.multi_object_wrapper import MultiObjectWrapper
    from pytracking_tpu.trackers.lwl import LWLParams, LWLTracker
    from tests.test_lwl import tiny_lwl_net

    net = tiny_lwl_net()
    params = LWLParams(image_sample_size=(64, 64), sample_memory_size=4,
                       net_opt_iter=1, net_opt_update_iter=1,
                       border_mode="replicate")
    train_imgs = jnp.zeros((1, 1, 64, 64, 3))
    train_masks = jnp.zeros((1, 1, 64, 64))
    variables = net.init(jax.random.PRNGKey(0), train_imgs, train_imgs, train_masks,
                         num_refinement_iter=0, train=False)

    H, W = 96, 128
    label = np.zeros((H, W), np.uint8)
    label[20:40, 20:40] = 1
    label[60:80, 80:100] = 2
    im = np.full((H, W, 3), 40, np.uint8)

    wrapper = MultiObjectWrapper(LWLTracker, params, net, variables)
    out = wrapper.initialize(im, {
        "object_ids": ["1", "2"],
        "init_object_ids": ["1", "2"],
        "init_bbox": {"1": [20, 20, 20, 20], "2": [80, 60, 20, 20]},
        "init_mask": label,
    })
    seg = np.asarray(out["segmentation"])
    # background stays background, each object keeps its own id
    assert seg[0, 0] == 0
    assert (seg == 0).mean() > 0.5
    assert seg[30, 30] == 1
    assert seg[70, 90] == 2
    # aggregated probabilities near 0 on background, near 1 on the object
    raw1 = np.asarray(out["segmentation_raw"]["1"])
    assert raw1[0, 0] < 0.1 and raw1[30, 30] > 0.9


# ---------------------------------------------------------------- default merge

def test_default_merge_falls_back_to_binary_segmentation():
    from pytracking_tpu.evaluation.multi_object_wrapper import MultiObjectWrapper

    class FakeTracker:
        def __init__(self, params=None, net=None, variables=None):
            pass

    w = MultiObjectWrapper(FakeTracker, params=None)
    seg1 = np.zeros((8, 8), np.uint8)
    seg1[:4] = 1
    seg2 = np.zeros((8, 8), np.uint8)
    seg2[6:] = 1
    w.trackers = {"1": FakeTracker(), "2": FakeTracker()}
    merged = w._merge({"1": {"target_bbox": [0, 0, 4, 4], "segmentation": seg1},
                       "2": {"target_bbox": [0, 6, 4, 2], "segmentation": seg2}},
                      (8, 8))
    m = merged["segmentation"]
    assert m[0, 0] == 1 and m[7, 0] == 2 and m[5, 0] == 0


def test_default_merge_reads_threshold_from_params():
    from pytracking_tpu.evaluation.multi_object_wrapper import MultiObjectWrapper

    class P:
        segmentation_threshold = 0.9

    class FakeTracker:
        def __init__(self, *a):
            pass

    w = MultiObjectWrapper(FakeTracker, params=P())
    w.trackers = {"1": FakeTracker()}
    soft = np.full((4, 4), 0.8, np.float32)
    merged = w._merge({"1": {"target_bbox": [0, 0, 1, 1],
                             "segmentation": (soft > 0.5).astype(np.uint8),
                             "segmentation_soft": soft}}, (4, 4))
    assert (merged["segmentation"] == 0).all()   # 0.8 < 0.9 threshold


# ---------------------------------------------------------------- presence scores

def test_presence_scores_saved_per_object(tmp_path):
    from pytracking_tpu.evaluation.running import _save_tracker_output

    class Trk:
        results_dir = str(tmp_path)
        segmentation_dir = str(tmp_path)

    class Seq:
        name = "seq01"
        frames = ["a.jpg", "b.jpg"]

    output = {
        "target_bbox": [{"1": [0, 0, 2, 2], "2": [1, 1, 2, 2]},
                        {"1": [0, 1, 2, 2], "2": [1, 2, 2, 2]}],
        "time": [0.1, 0.2],
        "object_presence_score": [{"1": 0.9, "2": 0.8}, {"1": 0.7, "2": 0.6}],
    }
    _save_tracker_output(Seq(), Trk(), output)
    f1 = tmp_path / "seq01_1_object_presence_scores.txt"
    f2 = tmp_path / "seq01_2_object_presence_scores.txt"
    assert f1.is_file() and f2.is_file()
    np.testing.assert_allclose(np.loadtxt(str(f1)), [0.9, 0.7])

    # single-object path uses the plural reference filename too
    out2 = {"target_bbox": [[0, 0, 2, 2]], "time": [0.1],
            "object_presence_score": [0.5]}

    class Seq2:
        name = "seq02"
        frames = ["a.jpg"]

    _save_tracker_output(Seq2(), Trk(), out2)
    assert (tmp_path / "seq02_object_presence_scores.txt").is_file()


# ---------------------------------------------------------------- DAVIS decay

def test_vos_decay_uses_davis_binning():
    from pytracking_tpu.analysis.evaluate_vos import evaluate_sequence

    # 22 frames -> 20 evaluated; J rises then falls so first/last-quarter means
    # differ from the DAVIS linspace bins
    n = 22
    masks_gt, masks_pred = [], []
    for i in range(n):
        gt = np.zeros((10, 10), np.uint8)
        gt[2:8, 2:8] = 1
        pred = gt.copy()
        if i > n // 2:
            pred[:, : min(i - n // 2, 6) + 2] = 0   # progressive loss
        masks_gt.append(gt)
        masks_pred.append(pred)
    res = evaluate_sequence(masks_pred, masks_gt, [1])[1]

    # recompute with explicit DAVIS binning
    from pytracking_tpu.analysis.evaluate_vos import binary_jaccard
    j = np.array([binary_jaccard(p == 1, g == 1)
                  for p, g in list(zip(masks_pred, masks_gt))[1:-1]])
    ids = np.round(np.linspace(1, len(j), 5) + 1e-10).astype(int) - 1
    bins = [j[ids[k]:ids[k + 1] + 1] for k in range(4)]
    expect = max(np.mean(bins[0]) - np.mean(bins[3]), 0.0)
    assert abs(res["J_decay"] - expect) < 1e-9


# ------------------------------------------------------- LaGOT prec/rec/F1

def test_prec_rec_f1_perfect_and_missed(tmp_path):
    """Perfect predictions with full visibility -> F1 == 1; dropping presence
    score on missed frames recovers a higher F1 than reporting them."""
    from pytracking_tpu.analysis.extract_results import \
        extract_results_prec_rec_f1
    from pytracking_tpu.evaluation.data import Sequence

    n = 20
    anno = np.tile([10.0, 12.0, 30.0, 40.0], (n, 1))

    class Trk:
        name = "t"; parameter_name = "p"; run_id = None
        display_name = "t_p"
        results_dir = str(tmp_path)

    frames = [f"synthetic://0/{i}/64/64" for i in range(n)]
    seq = Sequence(name="sX", frames=frames, dataset="lagot",
                   ground_truth_rect=anno)
    np.savetxt(tmp_path / "sX.txt", anno.astype(int), delimiter="\t", fmt="%d")
    np.savetxt(tmp_path / "sX_object_presence_scores.txt", np.ones(n), fmt="%.2f")
    data = extract_results_prec_rec_f1([Trk()], [seq])
    assert abs(data["raw_data"]["t_p"]["f1_max"] - 1.0) < 1e-6

    # tracker loses the target on half the frames but reports low presence there
    pred = anno.copy()
    pred[10:, 0] += 200.0                      # zero overlap
    scores = np.ones(n)
    scores[10:] = 0.1
    np.savetxt(tmp_path / "sX.txt", pred.astype(int), delimiter="\t", fmt="%d")
    np.savetxt(tmp_path / "sX_object_presence_scores.txt", scores, fmt="%.2f")
    d = extract_results_prec_rec_f1([Trk()], [seq])["raw_data"]["t_p"]
    # best threshold keeps only the confident half: prec ~1, rec ~0.5 -> F1 ~2/3
    assert abs(d["f1_max"] - 2 / 3) < 0.05
    assert d["ths_max"] >= 0.1


def test_bundled_attribute_specs_load():
    from pytracking_tpu.evaluation.attribute_specs import (attribute_names,
                                                           load_attribute_spec)
    for ds in ("otb", "lasot", "uav", "avist"):
        assert load_attribute_spec(ds) is not None, ds
    assert "OCC" in attribute_names("otb")


# ------------------------------------------------------- golden robustness rules

@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not available")
@pytest.mark.parametrize("dataset", ["otb", "uav", "lasot"])
def test_calc_seq_err_robust_matches_reference(dataset):
    import tests.refshim  # noqa: F401  (installs stubs + sys.path)
    import torch
    from pytracking.analysis.extract_results import \
        calc_seq_err_robust as ref_calc

    from pytracking_tpu.analysis.extract_results import calc_seq_err_robust

    rng = np.random.RandomState(3)
    n = 50
    anno = np.abs(rng.randn(n, 4)) * 50 + 5
    pred = anno + rng.randn(n, 4) * 10
    pred[:, 2:] = np.abs(pred[:, 2:])
    pred[7, 2:] = 0.0                      # lost target -> copy-forward rule
    anno[12, 2:] = 0.0                     # invalid annotation frame
    visible = rng.rand(n) > 0.2 if dataset == "lasot" else None

    ov, ce, cn, valid = calc_seq_err_robust(pred, anno, dataset, visible)
    t_vis = torch.tensor(visible.astype(np.uint8)) if visible is not None else None
    r_ov, r_ce, r_cn, r_valid = ref_calc(torch.tensor(pred), torch.tensor(anno),
                                         dataset, t_vis)

    np.testing.assert_allclose(ov, r_ov.numpy(), atol=1e-10)
    np.testing.assert_allclose(ce, r_ce.numpy(), atol=1e-10)
    np.testing.assert_allclose(cn, r_cn.numpy(), atol=1e-10)
    np.testing.assert_array_equal(valid, r_valid.numpy().astype(bool))
