"""LaSOT adapter (reference pytracking/evaluation/lasotdataset.py).

Layout: <lasot_path>/<class>-<id>/{img/, groundtruth.txt, full_occlusion.txt,
out_of_view.txt}. The test split is whatever sequences exist under the path (the
reference inlines the 280-name test list, lasotdataset.py:107-390; pointing
`lasot_path` at the extracted test set yields the same split).
"""

from __future__ import annotations

import os

import numpy as np

from pytracking_tpu.evaluation.adapters._util import load_text
from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList


class LaSOTDataset(BaseDataset):
    def __init__(self):
        super().__init__()
        self.base_path = self.env_settings.lasot_path

    def _seq_dirs(self):
        out = []
        for d in sorted(os.listdir(self.base_path)):
            p = os.path.join(self.base_path, d)
            if os.path.isdir(os.path.join(p, "img")):
                out.append((d, p))
            elif os.path.isdir(p):  # class-folder layout: <class>/<class>-<id>/
                for s in sorted(os.listdir(p)):
                    sp = os.path.join(p, s)
                    if os.path.isdir(os.path.join(sp, "img")):
                        out.append((s, sp))
        return out

    def get_sequence_list(self) -> SequenceList:
        seqs = []
        for name, seq_dir in self._seq_dirs():
            gt = np.atleast_2d(load_text(os.path.join(seq_dir, "groundtruth.txt")))
            occ_path = os.path.join(seq_dir, "full_occlusion.txt")
            oov_path = os.path.join(seq_dir, "out_of_view.txt")
            target_visible = None
            if os.path.isfile(occ_path) and os.path.isfile(oov_path):
                occ = load_text(occ_path).reshape(-1)
                oov = load_text(oov_path).reshape(-1)
                n = min(len(occ), len(oov), len(gt))
                target_visible = (occ[:n] == 0) & (oov[:n] == 0)
            frames = [os.path.join(seq_dir, "img", f"{i:08d}.jpg")
                      for i in range(1, len(gt) + 1)]
            from pytracking_tpu.evaluation.attribute_specs import sequence_attributes
            seqs.append(Sequence(name, frames, "lasot", gt,
                                 target_visible=target_visible,
                                 attributes=sequence_attributes("lasot", name)))
        return SequenceList(seqs)
