"""Sequence / dataset containers for the evaluation harness.

Re-design of reference `pytracking/evaluation/data.py` (Sequence:21, BaseDataset:6,
SequenceList:160). Output-format compatible: per-frame ground-truth rects are
(x, y, w, h); `init_data` carries per-frame initialization (multi-object aware).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


class BaseDataset:
    """Base class for evaluation datasets (reference data.py:6-18)."""

    def __init__(self):
        from pytracking_tpu.evaluation.environment import env_settings
        self.env_settings = env_settings()

    def __len__(self):
        return len(self.get_sequence_list())

    def get_sequence_list(self) -> "SequenceList":
        raise NotImplementedError


class Sequence:
    """A single video sequence (reference data.py:21-157)."""

    def __init__(self, name: str, frames: List[str], dataset: str,
                 ground_truth_rect, ground_truth_seg=None, init_data: dict = None,
                 object_class: str = None, target_visible=None,
                 object_ids: Optional[List[str]] = None,
                 multiobj_mode: bool = False, attributes=None):
        self.name = name
        self.frames = frames
        self.dataset = dataset
        self.attributes = attributes or []
        if isinstance(ground_truth_rect, dict):   # multi-object: {obj_id: (N, 4)}
            self.ground_truth_rect = {k: np.asarray(v)
                                      for k, v in ground_truth_rect.items()}
        else:
            self.ground_truth_rect = np.asarray(ground_truth_rect) \
                if ground_truth_rect is not None else None
        self.ground_truth_seg = ground_truth_seg
        self.object_class = object_class
        self.target_visible = np.asarray(target_visible) \
            if target_visible is not None else None
        self.object_ids = object_ids
        self.multiobj_mode = multiobj_mode
        self.init_data = self._construct_init_data(init_data)

    def _construct_init_data(self, init_data):
        if init_data is not None:
            return init_data
        init_bbox = None
        if isinstance(self.ground_truth_rect, dict):
            init_bbox = {oid: list(map(float, r[0] if r.ndim == 2 else r))
                         for oid, r in self.ground_truth_rect.items()}
        elif self.ground_truth_rect is not None:
            rect = self.ground_truth_rect
            init_bbox = rect[0] if rect.ndim == 2 else rect
            init_bbox = list(map(float, init_bbox))
        d = {"bbox": init_bbox}
        # vos-mode SOT datasets carry a first-frame mask in ground_truth_seg
        # (reference data.py:87-88)
        if self.ground_truth_seg is not None and len(self.ground_truth_seg) and \
                self.ground_truth_seg[0] is not None:
            d["mask"] = self.ground_truth_seg[0]
        if self.object_ids is not None:
            d["object_ids"] = self.object_ids
        return {0: d}

    def init_info(self) -> dict:
        return self.frame_info(0)

    def frame_info(self, frame_num: int) -> dict:
        return self.object_init_data(frame_num)

    def init_bbox(self, frame_num: int = 0):
        return self.object_init_data(frame_num).get("init_bbox")

    def object_init_data(self, frame_num: int = 0) -> dict:
        if frame_num not in self.init_data:
            return {}
        raw = self.init_data[frame_num]
        out = {}
        for k, v in raw.items():
            if v is not None:
                out["init_" + k if not k.startswith("object_ids") else k] = v
        # a mask stored as a path is read lazily (reference data.py:132-137)
        if isinstance(out.get("init_mask"), str):
            from pytracking_tpu.utils.png_io import imread_indexed
            out["init_mask"] = imread_indexed(out["init_mask"])
        return out

    def __len__(self):
        return len(self.frames)

    def __repr__(self):
        return f"Sequence({self.name}, {len(self.frames)} frames)"


class SequenceList(list):
    """List of sequences with lookup by name (reference data.py:160-174)."""

    def __getitem__(self, item):
        if isinstance(item, str):
            for seq in self:
                if seq.name == item:
                    return seq
            raise IndexError(f"Sequence name not in the dataset: {item}")
        if isinstance(item, int):
            return super().__getitem__(item)
        return SequenceList(super().__getitem__(item))
