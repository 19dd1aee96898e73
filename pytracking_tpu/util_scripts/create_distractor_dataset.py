"""Dump a target-candidate (distractor) dataset for KeepTrack TCM training.

Re-design of reference `pytracking/util_scripts/create_distractor_dataset.py`
(run_tracker:141, extract_candidate_data:91): run a base tracker over a dataset,
extract the per-frame candidate sets (score-map local maxima: coordinates, scores,
flags for the sub-sequence state), and dump them per sequence into one JSON file the
KeepTrack training recipe can consume.

    python -m pytracking_tpu.util_scripts.create_distractor_dataset \
        dimp super_dimp lasot /path/to/save_dir
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_dump_seq_data_from_disk(path):
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return {}


def dump_seq_data_to_disk(save_path, seq_name, seq_data):
    d = load_dump_seq_data_from_disk(save_path)
    d[seq_name] = seq_data
    tmp = save_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f)
    os.replace(tmp, save_path)


def determine_frame_state(candidates, gt_box, th: float = 0.25):
    """Classify the frame (reference create_distractor_dataset.py:52-81): which
    candidate (if any) matches the annotation, and whether distractors exist."""
    scores = np.asarray(candidates["scores"])
    coords = np.asarray(candidates["coords"], np.float32)
    if gt_box is None or np.any(np.asarray(gt_box) < 0) or len(scores) == 0:
        return "invalid", -1
    cx = gt_box[0] + gt_box[2] / 2
    cy = gt_box[1] + gt_box[3] / 2
    d = np.hypot(coords[:, 1] - cx, coords[:, 0] - cy)
    radius = max(float(np.hypot(gt_box[2], gt_box[3])) / 2, 1.0)
    matches = d < radius
    if not np.any(matches & (scores > th)):
        return "target_lost", -1
    idx = int(np.argmax(np.where(matches, scores, -np.inf)))
    num_distractors = int(np.sum((scores > th) & ~matches))
    state = "target_with_distractors" if num_distractors > 0 else "target_only"
    return state, idx


def extract_candidate_data(tracker, seq, max_candidates: int = 8):
    """Track the sequence, recording the candidate set of every frame
    (reference :91-138). Uses the KeepTrack candidate extractor on the tracker's raw
    score map when available, else the score-map top-K."""
    from pytracking_tpu.evaluation.running import _read_image

    info = seq.init_info()
    tracker.initialize(_read_image(seq.frames[0]), info)
    seq_data = {}
    for i, frame_path in enumerate(seq.frames[1:], start=1):
        out = tracker.track(_read_image(frame_path))
        cand = out.get("candidates")
        if cand is None:
            # fall back: single candidate at the predicted box center
            bb = out["target_bbox"]
            cand = {"coords": [[bb[1] + bb[3] / 2, bb[0] + bb[2] / 2]],
                    "scores": [float(out.get("score", 1.0))]}
        gt = seq.ground_truth_rect[i] if seq.ground_truth_rect is not None and \
            i < len(seq.ground_truth_rect) else None
        state, match_idx = determine_frame_state(cand, gt)
        # search-area box (x, y, w, h) for TargetCandidateMatchingProcessing:
        # tracker-provided when available, else the search square around the
        # predicted box
        sa = out.get("search_area_box")
        if sa is None:
            bb = np.asarray(out["target_bbox"], np.float32)
            sz = float(np.sqrt(max(bb[2] * bb[3], 1.0))) * 6.0
            sa = [bb[0] + bb[2] / 2 - sz / 2, bb[1] + bb[3] / 2 - sz / 2, sz, sz]
        seq_data[str(i)] = {
            "coords": np.asarray(cand["coords"], np.float32).tolist(),
            "scores": np.asarray(cand["scores"], np.float32).tolist(),
            "state": state, "match_idx": match_idx,
            "search_area_box": np.asarray(sa, np.float32).tolist(),
            "anno": None if gt is None else np.asarray(gt, np.float32).tolist(),
        }
    return seq_data


def run_tracker(tracker_name, parameter_name, dataset_name, save_dir):
    from pytracking_tpu.evaluation.datasets import get_dataset
    from pytracking_tpu.evaluation.tracker import Tracker

    os.makedirs(save_dir, exist_ok=True)
    save_path = os.path.join(
        save_dir, f"target_candidates_dataset_{tracker_name}_{parameter_name}.json")
    done = load_dump_seq_data_from_disk(save_path)

    dataset = get_dataset(dataset_name)
    wrapper = Tracker(tracker_name, parameter_name)
    for seq in dataset:
        if seq.name in done:
            continue
        tracker = wrapper.create_tracker()
        seq_data = extract_candidate_data(tracker, seq)
        dump_seq_data_to_disk(save_path, seq.name, seq_data)
        print(f"{seq.name}: {len(seq_data)} frames")
    print(f"Saved to {save_path}")


def main():
    parser = argparse.ArgumentParser(
        description="Dump target-candidate data for KeepTrack training.")
    parser.add_argument("tracker_name", type=str)
    parser.add_argument("parameter_name", type=str)
    parser.add_argument("dataset_name", type=str)
    parser.add_argument("save_dir", type=str)
    args = parser.parse_args()
    run_tracker(args.tracker_name, args.parameter_name, args.dataset_name,
                args.save_dir)


if __name__ == "__main__":
    main()
