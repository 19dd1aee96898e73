"""TrackingNet adapter (reference pytracking/evaluation/trackingnetdataset.py).

Layout: <trackingnet_path>/TEST/{frames/<seq>/<i>.jpg, anno/<seq>.txt}."""

from __future__ import annotations

import os

import numpy as np

from pytracking_tpu.evaluation.adapters._util import load_text
from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList


class TrackingNetDataset(BaseDataset):
    def __init__(self, split: str = "TEST"):
        super().__init__()
        self.base_path = os.path.join(self.env_settings.trackingnet_path, split)

    def get_sequence_list(self) -> SequenceList:
        anno_dir = os.path.join(self.base_path, "anno")
        frames_dir = os.path.join(self.base_path, "frames")
        seqs = []
        for fn in sorted(os.listdir(anno_dir)):
            if not fn.endswith(".txt"):
                continue
            name = fn[:-4]
            gt = np.atleast_2d(load_text(os.path.join(anno_dir, fn)))
            seq_frames_dir = os.path.join(frames_dir, name)
            n = len([f for f in os.listdir(seq_frames_dir) if f.endswith(".jpg")])
            frames = [os.path.join(seq_frames_dir, f"{i}.jpg") for i in range(n)]
            seqs.append(Sequence(name, frames, "trackingnet", gt))
        return SequenceList(seqs)
