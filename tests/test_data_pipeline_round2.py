"""Round-2 data-pipeline classes: KYSProcessing/KYSSampler, RTSProcessing,
TaMOsDatasetSampler + multi-object TaMOsProcessing, TargetCandidateMatchingProcessing.
Golden shape/content checks on synthetic data (no downloads)."""

import numpy as np
import pytest


def _synth_video(n=40, H=120, W=160):
    from pytracking_tpu.training.datasets.synthetic_video import SyntheticVideoDataset
    return SyntheticVideoDataset(num_sequences=4, seq_len=n, H=H, W=W)


# ---------------------------------------------------------------- KYS

def test_kys_processing_shapes_and_absent_labels():
    from pytracking_tpu.training.processing import KYSProcessing

    np.random.seed(0)
    proc = KYSProcessing(
        search_area_factor=5.0, output_sz=128,
        center_jitter_param={"train_factor": 3.0, "train_mode": "uniform",
                             "test_factor": 4.5, "test_limit_motion": True,
                             "test_mode": "uniform"},
        scale_jitter_param={"train_factor": 0.25, "test_factor": 0.3},
        proposal_params={"boxes_per_frame": 8, "min_iou": 0.3,
                         "sigma_factor": [0.01, 0.05, 0.1, 0.2, 0.3]},
        label_function_params={"feature_sz": 8, "sigma_factor": 0.05,
                               "kernel_sz": 4},
        min_crop_inside_ratio=0.1)

    T_tr, T_te = 2, 5
    data = {
        "train_images": [np.random.rand(120, 160, 3).astype(np.float32) * 255
                         for _ in range(T_tr)],
        "train_anno": [np.array([40.0, 30.0, 30.0, 24.0])] * T_tr,
        "test_images": [np.random.rand(120, 160, 3).astype(np.float32) * 255
                        for _ in range(T_te)],
        "test_anno": [np.array([42.0, 32.0, 30.0, 24.0])] * T_te,
        "test_visible": np.array([1, 1, 0, 0, 1], np.float32),
        "test_valid_anno": np.ones(T_te, np.float32),
    }
    out = proc(data)
    assert out["train_images"][0].shape == (128, 128, 3)
    assert out["test_proposals"][0].shape == (8, 4)
    assert np.all(np.abs(out["proposal_iou"][0]) <= 1.0)
    # occluded frames carry ZERO labels (the KYS supervision signal)
    assert np.asarray(out["test_label"][2]).max() == 0.0
    assert np.asarray(out["test_label"][0]).max() > 0.1


def test_kys_sampler_occlusion_spanning():
    from pytracking_tpu.training.processing import KYSProcessing
    from pytracking_tpu.training.sampler import KYSSampler

    class OccDataset:
        """20 visible, 10 occluded, 30 visible frames."""
        def get_name(self):
            return "occ"

        def is_video_sequence(self):
            return True

        def has_occlusion_info(self):
            return True

        def get_num_sequences(self):
            return 1

        def get_sequence_info(self, seq_id):
            vis = np.ones(60)
            ratio = np.ones(60)
            ratio[20:30] = 0.2
            vis[20:30] = 0
            return {"visible": vis, "visible_ratio": ratio,
                    "bbox": [np.array([30.0, 30, 20, 20])] * 60}

        def get_frames(self, seq_id, ids, info):
            frames = [np.full((64, 64, 3), 100, np.float32) for _ in ids]
            anno = {"bbox": [np.array([30.0, 30, 20, 20]) for _ in ids],
                    "visible": np.array([info["visible"][i] for i in ids]),
                    "valid": np.ones(len(ids)),
                    "visible_ratio": np.array([info["visible_ratio"][i]
                                               for i in ids])}
            return frames, anno, None

    np.random.seed(1)
    sampler = KYSSampler([OccDataset()], samples_per_epoch=4,
                         sequence_sample_info={"num_train_frames": 2,
                                               "num_test_frames": 8,
                                               "max_train_gap": 30,
                                               "allow_missing_target": True,
                                               "mode": "Sequence"},
                         processing=None, sample_occluded_sequences=True)
    spans_occlusion = False
    for i in range(8):
        d = sampler[i]
        assert len(d["test_images"]) == 8
        assert d["test_valid_image"].shape == (8,)
        if (d["test_visible"] == 0).any() and (d["test_visible"] == 1).any():
            spans_occlusion = True
    assert spans_occlusion, "occlusion sampling never produced a spanning sequence"


# ---------------------------------------------------------------- RTS

def test_rts_processing_masks_and_labels():
    from pytracking_tpu.training.processing import RTSProcessing

    np.random.seed(0)
    proc = RTSProcessing(search_area_factor=5.0, output_sz=128,
                         center_jitter_factor={"train": 3, "test": 3},
                         scale_jitter_factor={"train": 0.25, "test": 0.25},
                         label_function_params={"feature_sz": 8,
                                                "sigma_factor": 0.05,
                                                "kernel_sz": 4})
    mask = np.zeros((120, 160), np.float32)
    mask[30:54, 40:70] = 1
    data = {"train_images": [np.random.rand(120, 160, 3) * 255],
            "train_anno": [np.array([40.0, 30.0, 30.0, 24.0])],
            "train_masks": [mask],
            "test_images": [np.random.rand(120, 160, 3) * 255],
            "test_anno": [np.array([40.0, 30.0, 30.0, 24.0])],
            "test_masks": [mask]}
    out = proc(data)
    assert out["train_masks"][0].shape == (128, 128)
    assert out["train_label"][0].shape[0] >= 8        # clf-branch Gaussian labels
    assert out["test_label"][0].max() > 0.1


# ---------------------------------------------------------------- TaMOs

def test_tamos_sampler_and_multiobject_processing():
    from pytracking_tpu.training.processing import TaMOsProcessing
    from pytracking_tpu.training.sampler import TaMOsDatasetSampler

    class MOTDataset:
        def __len__(self):
            return 1

        def get_name(self):
            return "mot"

        def is_video_sequence(self):
            return True

        def is_mot_dataset(self):
            return True

        def get_num_sequences(self):
            return 1

        def get_sequence_info(self, seq_id):
            return {"visible": np.ones((40, 2)),
                    "bbox": [{0: np.array([20.0, 20, 20, 20]),
                              1: np.array([70.0, 60, 24, 18])}] * 40}

        def get_frames(self, seq_id, ids, info):
            frames = [np.full((120, 160, 3), 90, np.float32) for _ in ids]
            anno = {"bbox": [info["bbox"][i] for i in ids]}
            return frames, anno, None

    np.random.seed(0)
    K = 4
    proc = TaMOsProcessing(search_area_factor=5.0, output_sz=128,
                           center_jitter_factor={"train": 0.0, "test": 1.0},
                           scale_jitter_factor={"train": 0.0, "test": 0.25},
                           label_function_params={"feature_sz": 8,
                                                  "sigma_factor": 0.05,
                                                  "kernel_sz": 1, "stride": 16},
                           num_objects=K, stride_high=8)
    sampler = TaMOsDatasetSampler([MOTDataset()], samples_per_epoch=2, max_gap=10,
                                  num_test_frames=1, num_train_frames=1,
                                  processing=proc)
    d = sampler[0]
    assert d["train_label"][0].shape == (K, 8, 8)
    assert d["train_ltrb_target"][0].shape == (K, 8, 8, 4)
    assert d["test_label"][0].shape == (16, 16, K)
    assert d["test_ltrb_target"][0].shape == (16, 16, K, 4)
    # both objects produce labels in their slots
    assert d["train_label"][0][0].max() > 0.1
    assert d["train_label"][0][1].max() > 0.1
    assert d["train_label"][0][2].max() == 0.0        # empty slot


# ------------------------------------------------- TCM processing

def test_tcm_processing_self_sup():
    from pytracking_tpu.training.processing import \
        TargetCandidateMatchingProcessing

    np.random.seed(0)
    K = 5
    proc = TargetCandidateMatchingProcessing(output_sz=128,
                                             num_target_candidates=K,
                                             score_map_sz=(23, 23))
    img = (np.random.rand(240, 320, 3) * 255).astype(np.float32)
    data = {"sup_mode": "self_sup", "img": [img],
            "search_area_box": [np.array([60.0, 40.0, 150.0, 150.0])],
            "target_candidate_coords": [np.array([[5, 7], [11, 11], [20, 3]])],
            "target_candidate_scores": [np.array([0.9, 0.5, 0.3], np.float32)]}
    out = proc(data)
    assert out["img_cropped0"].shape == (128, 128, 3)
    assert out["candidate_tsm_coords0"].shape == (K, 2)
    assert out["candidate_scores1"].shape == (K,)
    assert out["gt_assignment"].shape == (K, K)
    # matched slots are diagonal; fake slots are unmatched (-1)
    diag = np.diag(out["gt_assignment"])
    assert np.all((diag == 1) | (diag == 0))
    assert np.all(out["gt_matches0"][out["candidate_valid0"] == 0] == -1)
    assert np.all((out["candidate_tsm_coords0"] >= 0) &
                  (out["candidate_tsm_coords0"] < 23))


def test_tcm_processing_partial_sup():
    from pytracking_tpu.training.processing import \
        TargetCandidateMatchingProcessing

    np.random.seed(3)
    K = 5
    proc = TargetCandidateMatchingProcessing(output_sz=128,
                                             num_target_candidates=K)
    img = (np.random.rand(240, 320, 3) * 255).astype(np.float32)
    coords = np.array([[5, 7], [11, 11]])
    data = {"sup_mode": "partial_sup", "img": [img, img],
            "search_area_box": [np.array([60.0, 40.0, 150.0, 150.0])] * 2,
            "target_candidate_coords": [coords, coords],
            "target_candidate_scores": [np.array([0.9, 0.5], np.float32)] * 2,
            "target_anno_coord": [coords[0], coords[0]]}
    out = proc(data)
    assert out["gt_assignment"].shape == (K, K)
    # only the target candidate pair may be supervised as a match
    assert out["gt_assignment"].sum() <= 1.0
    # non-target real candidates stay ignored (-2)
    assert out["gt_matches0"][1] == -2
