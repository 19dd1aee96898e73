"""ImageNet-VID training dataset reader.

Re-design of reference `ltr/dataset/imagenetvid.py` (ImagenetVID:18,
_process_anno:105): each VID tracklet becomes a sequence. The per-frame XML
annotations are parsed once into a `cache.json` at the dataset root (same cache name
and entry schema as the reference so an existing cache is reusable).
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np

from pytracking_tpu.training.datasets.base import BaseVideoDataset


def _process_anno(root: str) -> List[dict]:
    """Build tracklets from the VID train XMLs (reference imagenetvid.py:105-160)."""
    base = os.path.join(root, "Annotations", "VID", "train")
    all_sequences = []
    for set_name in sorted(os.listdir(base)):
        set_id = int(set_name.split("_")[-1])
        for vid in sorted(os.listdir(os.path.join(base, set_name))):
            vid_id = int(vid.split("_")[-1])
            vdir = os.path.join(base, set_name, vid)
            anno_files = sorted(os.listdir(vdir))
            objects = [ET.parse(os.path.join(vdir, f)).findall("object")
                       for f in anno_files]
            tracklets = {}
            for f_id, targets in enumerate(objects):
                for t in targets:
                    tid = t.find("trackid").text
                    tracklets.setdefault(tid, f_id)
            for tid, start in tracklets.items():
                anno, visible = [], []
                class_name = None
                for f_id in range(start, len(objects)):
                    tgt = next((t for t in objects[f_id]
                                if t.find("trackid").text == tid), None)
                    if tgt is None:
                        break
                    class_name = class_name or tgt.find("name").text
                    x1 = int(tgt.find("bndbox/xmin").text)
                    y1 = int(tgt.find("bndbox/ymin").text)
                    x2 = int(tgt.find("bndbox/xmax").text)
                    y2 = int(tgt.find("bndbox/ymax").text)
                    anno.append([x1, y1, x2 - x1, y2 - y1])
                    visible.append(tgt.find("occluded").text == "0")
                all_sequences.append({"set_id": set_id, "vid_id": vid_id,
                                      "class_name": class_name,
                                      "start_frame": start, "anno": anno,
                                      "target_visible": visible})
    return all_sequences


class ImagenetVID(BaseVideoDataset):

    def __init__(self, root: str, min_length: int = 0):
        super().__init__("imagenet_vid", root)
        cache_file = os.path.join(root, "cache.json")
        if os.path.isfile(cache_file):
            with open(cache_file) as f:
                sequences = json.load(f)
        else:
            sequences = _process_anno(root)
            with open(cache_file, "w") as f:
                json.dump(sequences, f)
        self.sequence_list = [s for s in sequences if len(s["anno"]) >= min_length]

    def get_num_sequences(self):
        return len(self.sequence_list)

    def has_class_info(self):
        return True

    def get_sequence_info(self, seq_id: int):
        s = self.sequence_list[seq_id]
        bbox = np.asarray(s["anno"], np.float32)
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        visible = np.asarray(s["target_visible"], bool) & valid
        return {"bbox": bbox, "valid": valid, "visible": visible}

    def get_frames(self, seq_id: int, frame_ids: List[int],
                   anno: Optional[dict] = None):
        from pytracking_tpu.training.datasets.lasot import _read_image

        s = self.sequence_list[seq_id]
        set_name = f"ILSVRC2015_VID_train_{s['set_id']:04d}"
        vid_name = f"ILSVRC2015_train_{s['vid_id']:08d}"
        vdir = os.path.join(self.root, "Data", "VID", "train", set_name, vid_name)
        frames = [_read_image(os.path.join(
            vdir, f"{s['start_frame'] + t:06d}.JPEG")) for t in frame_ids]
        if anno is None:
            anno = self.get_sequence_info(seq_id)
        frame_anno = {k: [v[t] for t in frame_ids] for k, v in anno.items()}
        return frames, frame_anno, {"object_class_name": s["class_name"]}
