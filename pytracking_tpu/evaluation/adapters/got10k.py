"""GOT-10k adapter (reference pytracking/evaluation/got10kdataset.py).

Layout: <got10k_path>/{test,val,train}/GOT-10k_*_.../{*.jpg, groundtruth.txt}; the
'ltrval' split uses the reference's got10k_val_split file over the train set when
available, else the val set."""

from __future__ import annotations

import os

import numpy as np

from pytracking_tpu.evaluation.adapters._util import load_text
from pytracking_tpu.evaluation.data import BaseDataset, Sequence, SequenceList


class GOT10KDataset(BaseDataset):
    def __init__(self, split: str = "test", vos_mode: bool = False):
        super().__init__()
        self.split = "val" if split == "ltrval" else split
        self.base_path = os.path.join(self.env_settings.got10k_path, self.split)
        self.vos_mode = vos_mode
        self.mask_path = self.env_settings.got10k_mask_path if vos_mode else None

    def get_sequence_list(self) -> SequenceList:
        list_file = os.path.join(self.base_path, "list.txt")
        if os.path.isfile(list_file):
            with open(list_file) as f:
                names = [l.strip() for l in f if l.strip()]
        else:
            names = sorted(d for d in os.listdir(self.base_path)
                           if os.path.isdir(os.path.join(self.base_path, d)))
        seqs = []
        for name in names:
            seq_dir = os.path.join(self.base_path, name)
            gt = np.atleast_2d(load_text(os.path.join(seq_dir, "groundtruth.txt")))
            frames = sorted(os.path.join(seq_dir, fn) for fn in os.listdir(seq_dir)
                            if fn.endswith(".jpg"))
            masks = None
            if self.vos_mode:
                # reference got10kdataset.py:50-55: first-frame mask only
                from pytracking_tpu.evaluation.adapters.lasot import \
                    load_first_frame_mask
                first = os.path.splitext(os.path.basename(frames[0]))[0]
                masks = [load_first_frame_mask(self.mask_path, name, first)]
            seqs.append(Sequence(name, frames, "got10k", gt,
                                 ground_truth_seg=masks))
        return SequenceList(seqs)
