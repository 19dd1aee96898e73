"""YouTube-VOS adapter (reference ltr/dataset/youtubevos.py:72-167, used by the
evaluation registry's yt* entries).

Layout: <youtubevos_dir>/<year>/<split>/JPEGImages/<seq>/..., Annotations/<seq>/...,
meta.json describing per-object first frames (objects can appear mid-sequence).

Modes matching the reference:
  * ``all_frames=True`` — frames come from ``<split>_all_frames/JPEGImages``
    (annotations stay with the base split); submission zips for the YT-VOS
    server need every frame (reference youtubevos.py:103-117).
  * ``split='jjvalid'/'jjtrain'`` — custom splits carved from the train folder,
    selected by the reference-format data-spec ``youtubevos_<split>.txt``
    (reference vos_base.py:130-136 select_split).
  * ``cleanup=['starts']`` — fix the six known-bad object start frames
    (reference youtubevos.py:135-151); ``'aspect'`` drops sequences with
    unusual aspect ratios (reference youtubevos.py:128-133).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList

# (sequence, object_id, bad first frames from meta.json, actual first frame) —
# reference youtubevos.py:137-143
_BAD_START_FRAMES = [
    ("0e27472bea", "2", ["00055", "00060"], "00065"),
    ("5937b08d69", "4", ["00000"], "00005"),
    ("5e1ce354fd", "5", ["00010", "00015"], "00020"),
    ("7053e4f41e", "2", ["00000", "00005", "00010", "00015"], "00020"),
    ("720e3fa04c", "2", ["00050"], "00055"),
    ("c73c8e747f", "2", ["00035"], "00040"),
]


class YouTubeVOSDataset(BaseDataset):
    def __init__(self, version: str = "2019", split: str = "valid",
                 all_frames: bool = False, cleanup=None):
        super().__init__()
        self.version = version
        self.split = split
        self.all_frames = all_frames
        self.cleanup = set(cleanup) if cleanup else set()
        split_folder = "train" if split.startswith("jj") else split
        self.base_path = os.path.join(self.env_settings.youtubevos_dir, version,
                                      split_folder)
        if all_frames:
            self.jpeg_path = os.path.join(self.env_settings.youtubevos_dir,
                                          version, split_folder + "_all_frames",
                                          "JPEGImages")
        else:
            self.jpeg_path = os.path.join(self.base_path, "JPEGImages")

    def _select_names(self, meta: dict):
        names = list(meta.keys())
        if self.split.startswith("jj"):
            from pytracking_tpu.training.datasets.data_specs import load_str_spec
            keep = set(load_str_spec(f"youtubevos_{self.split}.txt"))
            names = [n for n in names if n in keep]
        if "aspect" in self.cleanup:
            # reference youtubevos.py:128-133: drop unusual aspect ratios
            from PIL import Image
            kept = []
            for n in names:
                img_dir = os.path.join(self.jpeg_path, n)
                first = sorted(os.listdir(img_dir))[0]
                with Image.open(os.path.join(img_dir, first)) as im:
                    a = im.width / im.height
                if 1.45 <= a <= 1.9:
                    kept.append(n)
            names = kept
        return names

    def get_sequence_list(self) -> SequenceList:
        from pytracking_tpu.utils.png_io import imread_indexed

        with open(os.path.join(self.base_path, "meta.json")) as f:
            meta = json.load(f)["videos"]

        bad_starts = {}
        if "starts" in self.cleanup:
            for seq, oid, bad, good in _BAD_START_FRAMES:
                bad_starts[(seq, oid)] = (set(bad), good)

        seqs = []
        for name in self._select_names(meta):
            info = meta[name]
            img_dir = os.path.join(self.jpeg_path, name)
            anno_dir = os.path.join(self.base_path, "Annotations", name)
            frames = sorted(os.path.join(img_dir, fn) for fn in os.listdir(img_dir)
                            if fn.endswith(".jpg"))
            frame_names = [os.path.splitext(os.path.basename(fr))[0] for fr in frames]
            object_ids = list(info["objects"].keys())

            # per-frame init data: an object is initialized at its first labeled frame
            init_data: dict = {}
            for oid, obj_info in info["objects"].items():
                obj_frames = list(obj_info["frames"])
                if (name, oid) in bad_starts:
                    bad, good = bad_starts[(name, oid)]
                    obj_frames = [f for f in obj_frames if f not in bad]
                    assert obj_frames[0] == good, \
                        f"cleanup 'starts' mismatch for {name}/{oid}"
                first = obj_frames[0]
                fidx = frame_names.index(first)
                mask_path = os.path.join(anno_dir, first + ".png")
                entry = init_data.setdefault(fidx, {"object_ids": [], "mask": None})
                entry["object_ids"].append(oid)
                if entry["mask"] is None and os.path.isfile(mask_path):
                    entry["mask"] = imread_indexed(mask_path)

            gt_segs = [os.path.join(anno_dir, fn + ".png") if
                       os.path.isfile(os.path.join(anno_dir, fn + ".png")) else None
                       for fn in frame_names]
            seqs.append(Sequence(name, frames, "yt" + self.version, None,
                                 ground_truth_seg=gt_segs, init_data=init_data,
                                 object_ids=object_ids, multiobj_mode=True))
        return SequenceList(seqs)
