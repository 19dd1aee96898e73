"""UAV123 adapter (reference pytracking/evaluation/uavdataset.py).

Layout: <uav_path>/data_seq/UAV123/<seq>/ + anno/UAV123/<seq>.txt. The reference
inlines per-sequence frame ranges (uavdataset.py:22-330) because some sequences share
image folders with offsets; here sequences map 1:1 to annotation files and frames are
counted from the annotation length starting at the folder's first frame."""

from __future__ import annotations

import os

import numpy as np

from pytracking_tpu.evaluation.adapters._util import load_text
from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList


class UAVDataset(BaseDataset):
    def __init__(self):
        super().__init__()
        self.base_path = self.env_settings.uav_path

    def get_sequence_list(self) -> SequenceList:
        anno_dir = os.path.join(self.base_path, "anno", "UAV123")
        data_dir = os.path.join(self.base_path, "data_seq", "UAV123")
        seqs = []
        for fn in sorted(os.listdir(anno_dir)):
            if not fn.endswith(".txt"):
                continue
            name = fn[:-4]
            img_dir = os.path.join(data_dir, name)
            if not os.path.isdir(img_dir):
                # sub-sequences (e.g. bird1_1) share the base folder
                base = name.rsplit("_", 1)[0]
                img_dir = os.path.join(data_dir, base)
                if not os.path.isdir(img_dir):
                    continue
            gt = np.atleast_2d(load_text(os.path.join(anno_dir, fn)))
            frames = [os.path.join(img_dir, f"{i:06d}.jpg")
                      for i in range(1, len(gt) + 1)]
            from pytracking_tpu.evaluation.attribute_specs import sequence_attributes
            seqs.append(Sequence(f"uav_{name}", frames, "uav", gt,
                                 attributes=sequence_attributes("uav", name)))
        return SequenceList(seqs)
