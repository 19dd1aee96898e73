"""TAO/BURST multi-object training dataset for TaMOs.

Re-design of reference `ltr/dataset/tao_burst.py` (TAOBURST:10): one JSON
(`TaoBurst.json`) maps sequence name -> {split, dataset_name, seq_name,
annotated_image_paths, track_ids, annotations: [ {track_id: xywh} per frame ]}.
multiobj=True yields whole sequences with per-track box dicts; multiobj=False
explodes tracks into single-object sequences.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from pytracking_tpu.training.datasets.base import BaseVideoDataset


class TAOBURST(BaseVideoDataset):

    def __init__(self, root: str, multiobj: bool = True):
        super().__init__("taoburst", root)
        with open(os.path.join(root, "TaoBurst.json")) as f:
            self.annos = json.load(f)
        self.multiobj = multiobj
        self.sequence_list = [(None, name) for name in self.annos]
        if not multiobj:
            exploded = []
            for _, name in self.sequence_list:
                for tid in self.annos[name]["track_ids"]:
                    exploded.append((str(tid), name))
            self.sequence_list = exploded

    def is_mot_dataset(self):
        return self.multiobj

    def get_num_sequences(self):
        return len(self.sequence_list)

    def get_sequence_info(self, seq_id: int):
        objid, name = self.sequence_list[seq_id]
        anno = self.annos[name]
        if objid is None:
            return {"bbox": anno["annotations"],
                    "num_tracks": len(anno["track_ids"])}
        bbox = np.asarray([b.get(objid, [-1, -1, -1, -1])
                           for b in anno["annotations"]], np.float32)
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        return {"bbox": bbox, "valid": valid, "visible": valid.copy()}

    def _seq_dir(self, name):
        a = self.annos[name]
        return os.path.join(self.root, "annotated_frames", a["split"],
                            a["dataset_name"], a["seq_name"])

    def get_frames(self, seq_id: int, frame_ids: List[int],
                   anno: Optional[dict] = None):
        from pytracking_tpu.training.datasets.lasot import _read_image

        objid, name = self.sequence_list[seq_id]
        a = self.annos[name]
        sdir = self._seq_dir(name)
        frames = [_read_image(os.path.join(
            sdir, a["annotated_image_paths"][t])) for t in frame_ids]
        if anno is None:
            anno = self.get_sequence_info(seq_id)
        frame_anno = {}
        for k, v in anno.items():
            if k == "num_tracks":
                continue
            frame_anno[k] = [v[t] for t in frame_ids]
        return frames, frame_anno, {"object_class_name": None}
