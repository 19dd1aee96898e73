"""Per-sequence evaluation driver and result IO.

Re-design of reference `pytracking/evaluation/running.py` (run_dataset:189,
run_sequence:138, _save_tracker_output:58). Result files are written in the EXACT
reference format so the reference's analysis tools (and ours) read either framework's
results interchangeably:
  <results_dir>/<tracker>/<param>/<seq_name>.txt           bbox per frame, tab-separated ints
  <seq_name>_time.txt                                       per-frame seconds
  multi-object: <seq_name>_<obj_id>.txt etc.

Eval-time parallelism: the reference uses multiprocessing.Pool over (seq × tracker)
(running.py:198-218). Here scaling out is by sharding the sequence list across
processes/hosts (`shard`/`num_shards` args) — each TPU process takes every
num_shards-th sequence; there is no inter-process communication at all.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from pytracking_tpu.evaluation.data import Sequence


def _read_image(path: str) -> np.ndarray:
    if path.startswith("synthetic://"):
        from pytracking_tpu.evaluation.adapters.synthetic import load_synthetic_frame
        return load_synthetic_frame(path)
    if path.lower().endswith((".jpg", ".jpeg")):
        # native libjpeg decode (native/src/image_io.cc) with PIL fallback
        from pytracking_tpu.utils.native_image import decode_jpeg
        return decode_jpeg(path)
    try:
        import cv2
        im = cv2.imread(path)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))


# OxUvA long-term benchmark submission format (reference running.py:13)
PREDICTION_FIELD_NAMES = ["video", "object", "frame_num", "present", "score",
                          "xmin", "xmax", "ymin", "ymax"]


def _save_tracker_output_oxuva(seq: Sequence, tracker, output: dict):
    """OxUvA CSV writer (reference running.py:15-55): one row per tracked frame
    with image-normalised [xmin,xmax,ymin,ymax] and a boolean presence decision
    thresholded on the tracker's object_presence_score."""
    import csv

    os.makedirs(tracker.results_dir, exist_ok=True)
    frame_names = [os.path.splitext(os.path.basename(f))[0] for f in seq.frames]
    img_h, img_w = output["image_shape"]
    bb = np.array(output["target_bbox"], np.float64)
    scores = np.array(output["object_presence_score"], np.float64)
    # (x, w) -> normalised [xmin, xmax, ymin, ymax], clipped to the image
    norm = np.stack([bb[:, 0] / img_w, (bb[:, 0] + bb[:, 2]) / img_w,
                     bb[:, 1] / img_h, (bb[:, 1] + bb[:, 3]) / img_h],
                    axis=1).clip(0.0, 1.0)
    norm, scores = norm[1:], scores[1:]      # frame 0 is the init frame
    frame_numbers = [int(n) for n in frame_names[1:]]
    vid_id, obj_id = seq.name.split("_")[:2]
    thresh = output.get("object_presence_score_threshold", 0.55)
    pred_file = os.path.join(tracker.results_dir, f"{vid_id}_{obj_id}.csv")
    with open(pred_file, "w") as fp:
        writer = csv.DictWriter(fp, fieldnames=PREDICTION_FIELD_NAMES)
        for i, fnum in enumerate(frame_numbers):
            writer.writerow({
                "video": vid_id, "object": obj_id, "frame_num": fnum,
                "present": str(bool(scores[i] > thresh)).lower(),
                "score": scores[i],
                "xmin": norm[i, 0], "xmax": norm[i, 1],
                "ymin": norm[i, 2], "ymax": norm[i, 3],
            })


def _results_exist(tracker, seq: Sequence) -> bool:
    """Skip-if-done (reference running.py:141-152)."""
    if seq.dataset == "oxuva":
        vid_id, obj_id = seq.name.split("_")[:2]
        return os.path.isfile(os.path.join(tracker.results_dir,
                                           f"{vid_id}_{obj_id}.csv"))
    if seq.object_ids is None:
        path = os.path.join(tracker.results_dir, f"{seq.name}.txt")
        return os.path.isfile(path)
    paths = [os.path.join(tracker.results_dir, f"{seq.name}_{oid}.txt")
             for oid in seq.object_ids]
    return all(os.path.isfile(p) for p in paths)


def _save_tracker_output(seq: Sequence, tracker, output: dict):
    """Write results in the reference's format (running.py:58-135)."""
    os.makedirs(tracker.results_dir, exist_ok=True)
    base = os.path.join(tracker.results_dir, seq.name)

    def save_bb(fname, data):
        arr = np.array(data).astype(int)
        np.savetxt(fname, arr, delimiter="\t", fmt="%d")

    def save_time(fname, data):
        np.savetxt(fname, np.array(data), delimiter="\t", fmt="%f")

    def save_score(fname, data):
        np.savetxt(fname, np.array(data).astype(float), delimiter="\t", fmt="%.2f")

    for key, data in output.items():
        if not data:
            continue
        if key == "target_bbox":
            if isinstance(data[0], (dict,)):  # multi-object
                by_obj = {}
                for frame in data:
                    for oid, bb in frame.items():
                        by_obj.setdefault(oid, []).append(bb)
                for oid, d in by_obj.items():
                    save_bb(f"{base}_{oid}.txt", d)
            else:
                save_bb(f"{base}.txt", data)
        elif key == "time":
            if isinstance(data[0], dict):
                by_obj = {}
                for frame in data:
                    for oid, t in frame.items():
                        by_obj.setdefault(oid, []).append(t)
                for oid, d in by_obj.items():
                    save_time(f"{base}_{oid}_time.txt", d)
            else:
                save_time(f"{base}_time.txt", data)
        elif key == "object_presence_score":
            if isinstance(data[0], dict):   # multi-object: one file per object
                by_obj = {}
                for frame in data:
                    for oid, s in frame.items():
                        by_obj.setdefault(oid, []).append(s)
                for oid, d in by_obj.items():
                    save_score(f"{base}_{oid}_object_presence_scores.txt", d)
            else:
                save_score(f"{base}_object_presence_scores.txt", data)
        elif key == "segmentation":
            from pytracking_tpu.utils.png_io import imwrite_indexed
            seg_dir = os.path.join(tracker.segmentation_dir, seq.name)
            os.makedirs(seg_dir, exist_ok=True)
            names = [os.path.splitext(os.path.basename(p))[0] for p in seq.frames]
            if len(set(names)) != len(names):   # synthetic:// URIs collide
                names = [f"{i:05d}" for i in range(len(seq.frames))]
            if len(data) == len(names) - 1:
                # tracker produced no init-frame segmentation: predictions start
                # at frame 1 — keep frame-name alignment
                names = names[1:]
            for name, seg in zip(names, data):
                imwrite_indexed(os.path.join(seg_dir, name + ".png"), seg)


def _register_visdom_debug(vis, image, out):
    """Feed the live-debug panes from a frame's tracker output (reference
    registers these inside each tracker, e.g. dimp.py:120-128 score map +
    tracker.py:214-222 'Tracking' overlay; here the harness feeds them from the
    step's debug outputs so the jitted trackers stay host-callback-free)."""
    try:
        bbox = out.get("target_bbox")
        panes = [image]
        if bbox is not None and not isinstance(bbox, dict):
            panes.append(np.asarray(bbox, np.float32))
        seg = out.get("segmentation")
        if seg is not None and not isinstance(seg, dict):
            panes.append(np.asarray(seg, np.float32))
        vis.register(panes, "Tracking", 1, "Tracking")
        if "score_map" in out:
            vis.register(np.asarray(out["score_map"]), "heatmap", 2, "Score Map")
        info = {k: out[k] for k in ("flag", "max_score", "object_presence_score")
                if k in out}
        if info:
            vis.register(info, "info_dict", 1, "Status")
    except Exception:
        pass  # debug UI must never break the tracking run


def run_sequence(seq: Sequence, tracker, debug: int = 0,
                 visdom_info=None, profile_dir: Optional[str] = None
                 ) -> Optional[dict]:
    """Track one sequence, save results (reference running.py:138-186).

    profile_dir: when set, wraps the sequence in `jax.profiler.trace` and writes a
    TensorBoard/XProf trace there (device timelines, HLO cost, HBM) — the TPU-native
    replacement for the reference's host-side timing debug levels."""
    if profile_dir:
        import jax

        os.makedirs(profile_dir, exist_ok=True)
        with jax.profiler.trace(profile_dir):
            out = run_sequence(seq, tracker, debug=debug, visdom_info=visdom_info)
        print(f"XProf trace written to {profile_dir} "
              "(view: tensorboard --logdir <dir>)")
        return out
    if debug == 0 and _results_exist(tracker, seq):
        print(f"FPS: {-1} -- skipping {seq.name}, results exist")
        return None

    if (visdom_info is not None or debug > 1) and \
            hasattr(tracker, "_init_visdom"):
        tracker._init_visdom(visdom_info, debug)

    output = {"target_bbox": [], "time": [], "object_presence_score": [],
              "segmentation": []}

    def track_frames():
        image = _read_image(seq.frames[0])
        output["image_shape"] = image.shape[:2]
        start = time.time()
        try:
            t = tracker.create_tracker(multiobj=seq.multiobj_mode)
        except TypeError:
            t = tracker.create_tracker()
        t.visdom = getattr(tracker, "visdom", None)
        if t.visdom is not None and hasattr(t, "enable_debug_outputs"):
            # before the first jit trace: the flag adds score-map outputs to the step
            t.enable_debug_outputs()
        info = seq.init_info()
        output["object_presence_score_threshold"] = getattr(
            getattr(t, "params", None), "object_presence_score_threshold", 0.55)
        prev_output = t.initialize(image, info) or {}
        init_time = time.time() - start
        init_bbox = info.get("init_bbox")
        if seq.object_ids is not None and not isinstance(init_bbox, dict):
            # multi-object outputs are per-object dicts — keep frame 0 homogeneous
            init_bbox = {oid: init_bbox
                         for oid in info.get("object_ids", seq.object_ids)}
        output["target_bbox"].append(init_bbox)
        output["time"].append(init_time)
        # the reference stores a default presence of 1.0 for the init frame
        # (tracker.py:191-197 init_default) so the presence file stays row-aligned
        # with the bbox file; per-object dict in multi-object mode
        init_presence = prev_output.get("object_presence_score")
        if init_presence is None:
            if seq.object_ids is not None:
                init_presence = {oid: 1.0
                                 for oid in info.get("object_ids", seq.object_ids)}
            else:
                init_presence = 1.0
        output["object_presence_score"].append(init_presence)
        if "segmentation" in prev_output:
            output["segmentation"].append(prev_output["segmentation"])

        wait_if_paused = getattr(tracker, "wait_if_paused", lambda: None)
        for frame_num, frame_path in enumerate(seq.frames[1:], start=1):
            wait_if_paused()
            image = _read_image(frame_path)
            start = time.time()
            info = seq.frame_info(frame_num)
            info["previous_output"] = prev_output
            out = t.track(image, info)
            prev_output = out
            if t.visdom is not None:
                _register_visdom_debug(t.visdom, image, out)
            output["time"].append(time.time() - start)
            output["target_bbox"].append(out["target_bbox"])
            if "object_presence_score" in out:
                output["object_presence_score"].append(out["object_presence_score"])
            if "segmentation" in out:
                output["segmentation"].append(out["segmentation"])

    try:
        track_frames()
    except Exception as e:  # per-sequence fault isolation (reference running.py:164-170)
        if debug:
            raise
        print(f"Sequence {seq.name} crashed: {e!r} -- skipping")
        return None

    total = sum(output["time"])
    n = len(output["time"])
    print(f"Tracker: {tracker.name} {tracker.parameter_name} , "
          f"Sequence: {seq.name}, FPS: {n / max(total, 1e-9):.2f}")
    if seq.dataset == "oxuva":
        _save_tracker_output_oxuva(seq, tracker, output)
    else:
        _save_tracker_output(seq, tracker, output)
    return output


def _run_sequence_job(args):
    """Spawned worker entry (reference running.py:198-218): rebuild the tracker
    wrapper in the child and run one sequence."""
    seq, tracker_info, debug = args
    from pytracking_tpu.evaluation.tracker import Tracker

    tracker = Tracker(*tracker_info)
    run_sequence(seq, tracker, debug=debug)


def run_dataset(dataset, trackers: List, debug: int = 0, threads: int = 0,
                shard: int = 0, num_shards: int = 1,
                profile_dir: Optional[str] = None):
    """Run (sequence × tracker) jobs (reference running.py:189-218). `shard` /
    `num_shards` shard the sequence list across processes/hosts for TPU-pod
    scale-out; `threads > 0` runs jobs in a spawn-based process pool (CPU backend
    only — multiple processes cannot share one TPU chip)."""
    seqs = [s for i, s in enumerate(dataset) if i % num_shards == shard]
    print(f"Evaluating {len(trackers)} trackers on {len(seqs)} sequences "
          f"(shard {shard}/{num_shards})")
    if threads > 0:
        import multiprocessing

        jobs = [(seq, (t.name, t.parameter_name, t.run_id), debug)
                for seq in seqs for t in trackers]
        ctx = multiprocessing.get_context("spawn")
        with ctx.Pool(threads) as pool:
            pool.map(_run_sequence_job, jobs)
    else:
        for seq in seqs:
            for tracker in trackers:
                run_sequence(seq, tracker, debug=debug, profile_dir=profile_dir)
                profile_dir = None  # profile only the first sequence
    print("Done")
