"""AVisT adapter (reference pytracking/evaluation/avistdataset.py).

Layout: <avist_path>/{sequences/<seq>/, anno/<seq>.txt, full_occlusion/<seq>.txt,
out_of_view/<seq>.txt}."""

from __future__ import annotations

import os

import numpy as np

from pytracking_tpu.evaluation.adapters._util import load_text
from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList


def load_scenarios() -> dict:
    """Bundled AVisT scenario spec: sequence -> short attribute codes, plus the
    short->long display-name map (reference avistdataset.py attribute columns;
    scenario names from the AVisT paper)."""
    import json

    spec_dir = os.environ.get(
        "PYTRACKING_TPU_ATTRIBUTE_SPECS_PATH",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "dataset_attribute_specs"))
    path = os.path.join(spec_dir, "avist_scenarios.json")
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


class AVisTDataset(BaseDataset):
    def __init__(self):
        super().__init__()
        self.base_path = self.env_settings.avist_path
        self._scenarios = load_scenarios()

    def get_sequence_list(self) -> SequenceList:
        anno_dir = os.path.join(self.base_path, "anno")
        seqs = []
        for fn in sorted(os.listdir(anno_dir)):
            if not fn.endswith(".txt"):
                continue
            name = fn[:-4]
            gt = np.atleast_2d(load_text(os.path.join(anno_dir, fn)))
            img_dir = os.path.join(self.base_path, "sequences", name)
            if not os.path.isdir(img_dir):
                continue
            frames = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir)
                            if f.lower().endswith((".jpg", ".png")))
            target_visible = None
            occ_p = os.path.join(self.base_path, "full_occlusion", name + ".txt")
            oov_p = os.path.join(self.base_path, "out_of_view", name + ".txt")
            if os.path.isfile(occ_p) and os.path.isfile(oov_p):
                occ = load_text(occ_p).reshape(-1)
                oov = load_text(oov_p).reshape(-1)
                n = min(len(occ), len(oov), len(gt))
                target_visible = (occ[:n] == 0) & (oov[:n] == 0)
            n = min(len(frames), len(gt))
            seqs.append(Sequence(name, frames[:n], "avist", gt[:n],
                                 target_visible=target_visible,
                                 attributes=self._scenarios.get(name)))
        return SequenceList(seqs)
