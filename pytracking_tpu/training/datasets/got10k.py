"""GOT-10k training dataset reader (reference ltr/dataset/got10k.py:14 incl. the
occlusion/cover labels :232-249)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from pytracking_tpu.training.datasets.base import BaseVideoDataset
from pytracking_tpu.training.datasets.lasot import _read_image


_SPLIT_FILES = {"train": "got10k_train_split.txt",
                "val": "got10k_val_split.txt",
                "vottrain": "got10k_vot_train_split.txt",
                "votval": "got10k_vot_val_split.txt"}


class Got10k(BaseVideoDataset):
    def __init__(self, root: str, split: Optional[str] = None, seq_ids=None):
        super().__init__("got10k", root)
        list_file = os.path.join(root, "list.txt")
        if os.path.isfile(list_file):
            with open(list_file) as f:
                self.sequence_list = [l.strip() for l in f if l.strip()]
        else:
            self.sequence_list = sorted(
                d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
        # split files hold integer indices into list.txt (reference
        # got10k.py:46-62; files from ltr/data_specs, see data_specs.py)
        if split is not None:
            if seq_ids is not None:
                raise ValueError("Cannot set both split and seq_ids.")
            if split not in _SPLIT_FILES:
                raise ValueError(f"Unknown split name {split!r}.")
            from pytracking_tpu.training.datasets.data_specs import load_int_spec
            seq_ids = load_int_spec(_SPLIT_FILES[split], root)
        if seq_ids is not None:
            self.sequence_list = [self.sequence_list[i] for i in seq_ids]

    def has_occlusion_info(self):
        return True

    def get_sequence_info(self, seq_id: int):
        seq_dir = os.path.join(self.root, self.sequence_list[seq_id])
        bbox = np.loadtxt(os.path.join(seq_dir, "groundtruth.txt"),
                          delimiter=",").reshape(-1, 4).astype(np.float32)
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        visible = valid.copy()
        occ_path = os.path.join(seq_dir, "absence.label")
        cover_path = os.path.join(seq_dir, "cover.label")
        if os.path.isfile(occ_path):
            absence = np.loadtxt(occ_path).reshape(-1).astype(bool)
            n = min(len(absence), len(visible))
            visible[:n] &= ~absence[:n]
        if os.path.isfile(cover_path):
            cover = np.loadtxt(cover_path).reshape(-1)
            n = min(len(cover), len(visible))
            visible[:n] &= cover[:n] > 0  # (reference got10k.py:241-249)
        return {"bbox": bbox, "valid": valid, "visible": visible}

    def get_frames(self, seq_id: int, frame_ids, anno=None):
        seq_dir = os.path.join(self.root, self.sequence_list[seq_id])
        frames = [_read_image(os.path.join(seq_dir, f"{i + 1:08d}.jpg"))
                  for i in frame_ids]
        if anno is None:
            anno = self.get_sequence_info(seq_id)
        frame_anno = {k: [v[i] for i in frame_ids] for k, v in anno.items()}
        return frames, frame_anno, {"object_class_name": None}
