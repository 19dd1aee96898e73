"""Compute per-sequence/per-frame tracking metrics from saved results.

Re-design of reference `pytracking/analysis/extract_results.py` (calc_iou_overlap:29,
calc_err_center:17, calc_seq_err_robust:41, extract_results:103). Reads the .txt result
files written by evaluation/running.py (same format as the reference), computes IoU
overlap + center errors per frame with the reference's robustness rules, and pickles an
`eval_data.pkl` consumable by plot_results.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np


def calc_err_center(pred_bb: np.ndarray, anno_bb: np.ndarray, normalized=False):
    """Center error per frame (reference extract_results.py:17-26)."""
    pred_center = pred_bb[:, :2] + 0.5 * (pred_bb[:, 2:] - 1.0)
    anno_center = anno_bb[:, :2] + 0.5 * (anno_bb[:, 2:] - 1.0)
    if normalized:
        pred_center = pred_center / anno_bb[:, 2:]
        anno_center = anno_center / anno_bb[:, 2:]
    return np.sqrt(((pred_center - anno_center) ** 2).sum(1))


def calc_iou_overlap(pred_bb: np.ndarray, anno_bb: np.ndarray) -> np.ndarray:
    """IoU per frame (reference extract_results.py:29-38)."""
    tl = np.maximum(pred_bb[:, :2], anno_bb[:, :2])
    br = np.minimum(pred_bb[:, :2] + pred_bb[:, 2:] - 1.0,
                    anno_bb[:, :2] + anno_bb[:, 2:] - 1.0)
    sz = np.clip(br - tl + 1.0, 0, None)
    intersection = sz.prod(axis=1)
    union = pred_bb[:, 2:].prod(axis=1) + anno_bb[:, 2:].prod(axis=1) - intersection
    return intersection / np.maximum(union, 1e-12)


def calc_seq_err_robust(pred_bb: np.ndarray, anno_bb: np.ndarray, dataset: str,
                        target_visible: Optional[np.ndarray] = None):
    """Per-frame errors with per-dataset robustness rules
    (reference extract_results.py:41-100): first frame is GT; invalid/occluded frames
    are excluded; lost predictions (nan/-1) count as failures."""
    pred_bb = pred_bb.astype(np.float64).copy()
    anno_bb = anno_bb.astype(np.float64)
    pred_bb[0, :] = anno_bb[0, :]

    if target_visible is not None:
        target_visible = target_visible.astype(bool)
        valid = ((anno_bb[:, 2:] > 0.0).sum(1) == 2) & target_visible
    else:
        valid = (anno_bb[:, 2:] > 0.0).sum(1) == 2

    err_center = calc_err_center(pred_bb, anno_bb)
    err_center_normalized = calc_err_center(pred_bb, anno_bb, normalized=True)
    err_overlap = calc_iou_overlap(pred_bb, anno_bb)

    # lost-target handling (reference :74-90)
    tracked = (pred_bb[:, 2:] > 0).sum(1) == 2
    if dataset in ("uav",):
        err_center[~tracked] = -1.0
    err_center[~tracked] = float("inf") if dataset not in ("uav",) else err_center[~tracked]
    err_center_normalized[~tracked] = np.inf
    err_overlap[~tracked] = -1.0

    return err_overlap[valid], err_center[valid], err_center_normalized[valid], valid


def extract_results(trackers: List, dataset, report_name: Optional[str] = None,
                    skip_missing_seq: bool = False,
                    plot_bin_gap: float = 0.05,
                    exclude_invalid_frames: bool = False) -> dict:
    """Compute success/precision statistics for every (sequence, tracker)
    (reference extract_results.py:103-183). Returns (and optionally pickles) the
    eval_data dict used by plot_results/print_results."""
    from pytracking_tpu.evaluation.environment import env_settings
    settings = env_settings()

    threshold_set_overlap = np.arange(0.0, 1.0 + plot_bin_gap, plot_bin_gap)
    threshold_set_center = np.arange(0, 51, 1, dtype=np.float64)
    threshold_set_center_norm = np.arange(0, 51, 1, dtype=np.float64) / 100.0

    avg_overlap_all = np.zeros((len(dataset), len(trackers)))
    ave_success_rate_plot_overlap = np.zeros((len(dataset), len(trackers),
                                              threshold_set_overlap.size))
    ave_success_rate_plot_center = np.zeros((len(dataset), len(trackers),
                                             threshold_set_center.size))
    ave_success_rate_plot_center_norm = np.zeros((len(dataset), len(trackers),
                                                  threshold_set_center.size))
    valid_sequence = np.ones(len(dataset), dtype=bool)

    for seq_id, seq in enumerate(dataset):
        anno_bb = np.asarray(seq.ground_truth_rect)
        target_visible = seq.target_visible
        for trk_id, trk in enumerate(trackers):
            base_results_path = os.path.join(trk.results_dir, seq.name)
            results_path = f"{base_results_path}.txt"
            if os.path.isfile(results_path):
                pred_bb = np.loadtxt(results_path, delimiter="\t")
                if pred_bb.ndim == 1:
                    pred_bb = pred_bb[None]
            elif skip_missing_seq:
                valid_sequence[seq_id] = False
                break
            else:
                raise FileNotFoundError(f"Result not found: {results_path}")

            n = min(len(pred_bb), len(anno_bb))
            err_overlap, err_center, err_center_norm, valid_frame = calc_seq_err_robust(
                pred_bb[:n], anno_bb[:n], seq.dataset,
                target_visible[:n] if target_visible is not None else None)

            avg_overlap_all[seq_id, trk_id] = err_overlap.mean() if err_overlap.size else 0.0
            if err_overlap.size:
                ave_success_rate_plot_overlap[seq_id, trk_id] = \
                    (err_overlap[:, None] > threshold_set_overlap[None]).mean(0)
                ave_success_rate_plot_center[seq_id, trk_id] = \
                    (err_center[:, None] < threshold_set_center[None]).mean(0)
                ave_success_rate_plot_center_norm[seq_id, trk_id] = \
                    (err_center_norm[:, None] < threshold_set_center_norm[None]).mean(0)

    eval_data = {
        "sequences": [s.name for s in dataset],
        "trackers": [{"name": t.name, "param": t.parameter_name,
                      "run_id": t.run_id,
                      "disp_name": getattr(t, "display_name", None) or
                      f"{t.name}_{t.parameter_name}"} for t in trackers],
        "valid_sequence": valid_sequence.tolist(),
        "ave_success_rate_plot_overlap": ave_success_rate_plot_overlap.tolist(),
        "ave_success_rate_plot_center": ave_success_rate_plot_center.tolist(),
        "ave_success_rate_plot_center_norm": ave_success_rate_plot_center_norm.tolist(),
        "avg_overlap_all": avg_overlap_all.tolist(),
        "threshold_set_overlap": threshold_set_overlap.tolist(),
        "threshold_set_center": threshold_set_center.tolist(),
        "threshold_set_center_norm": threshold_set_center_norm.tolist(),
    }

    if report_name is not None:
        out_dir = os.path.join(settings.result_plot_path, report_name)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "eval_data.pkl"), "wb") as f:
            pickle.dump(eval_data, f)
    return eval_data
