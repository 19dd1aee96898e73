"""YouTube-VOS adapter (reference pytracking/evaluation/youtubevosdataset.py).

Layout: <youtubevos_dir>/<year>/<split>/JPEGImages/<seq>/..., Annotations/<seq>/...,
meta.json describing per-object first frames (objects can appear mid-sequence).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList


class YouTubeVOSDataset(BaseDataset):
    def __init__(self, version: str = "2019", split: str = "valid"):
        super().__init__()
        self.base_path = os.path.join(self.env_settings.youtubevos_dir, version, split)

    def get_sequence_list(self) -> SequenceList:
        from pytracking_tpu.utils.png_io import imread_indexed

        with open(os.path.join(self.base_path, "meta.json")) as f:
            meta = json.load(f)["videos"]

        seqs = []
        for name, info in meta.items():
            img_dir = os.path.join(self.base_path, "JPEGImages", name)
            anno_dir = os.path.join(self.base_path, "Annotations", name)
            frames = sorted(os.path.join(img_dir, fn) for fn in os.listdir(img_dir)
                            if fn.endswith(".jpg"))
            frame_names = [os.path.splitext(os.path.basename(fr))[0] for fr in frames]
            object_ids = list(info["objects"].keys())

            # per-frame init data: an object is initialized at its first labeled frame
            init_data: dict = {}
            for oid, obj_info in info["objects"].items():
                first = obj_info["frames"][0]
                fidx = frame_names.index(first)
                mask_path = os.path.join(anno_dir, first + ".png")
                entry = init_data.setdefault(fidx, {"object_ids": [], "mask": None})
                entry["object_ids"].append(oid)
                if entry["mask"] is None and os.path.isfile(mask_path):
                    entry["mask"] = imread_indexed(mask_path)

            gt_segs = [os.path.join(anno_dir, fn + ".png") if
                       os.path.isfile(os.path.join(anno_dir, fn + ".png")) else None
                       for fn in frame_names]
            seqs.append(Sequence(name, frames, "yt2019", None,
                                 ground_truth_seg=gt_segs, init_data=init_data,
                                 object_ids=object_ids, multiobj_mode=True))
        return SequenceList(seqs)
