"""VOS wrappers for box-annotated datasets: Got10kVOS / LasotVOS / LVIS.

Re-design of reference `ltr/dataset/{got10kvos,lasotvos}.py` and `lvis.py`:
Got10kVOS/LasotVOS pair the bbox datasets with pre-generated pseudo-masks
(produced by the STA network, stored as indexed PNGs in a parallel directory tree
mirroring the sequence layout). LVIS is COCO-format instance annotations with a
different file name.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from pytracking_tpu.training.datasets.coco_seq import MSCOCOSeq


class _VOSMaskMixin:
    """Adds mask loading from `mask_root/<sequence-relative-path>/<frame>.png`."""

    mask_root: str = ""

    def _mask_path(self, seq_id: int, frame_id: int) -> str:
        raise NotImplementedError

    def _load_mask(self, seq_id, frame_id, shape):
        from pytracking_tpu.utils.png_io import imread_indexed

        p = self._mask_path(seq_id, frame_id)
        if os.path.isfile(p):
            return (imread_indexed(p) > 0).astype(np.float32)
        return np.zeros(shape[:2], np.float32)

    def has_segmentation_info(self):
        return True

    def get_frames(self, seq_id: int, frame_ids: List[int],
                   anno: Optional[dict] = None):
        frames, frame_anno, meta = super().get_frames(seq_id, frame_ids, anno)
        frame_anno["mask"] = [self._load_mask(seq_id, t, frames[0].shape)
                              for t in frame_ids]
        return frames, frame_anno, meta


def make_got10k_vos(root: str, mask_root: str, **kwargs):
    """Got10kVOS (reference got10kvos.py): GOT-10k boxes + STA pseudo-masks."""
    from pytracking_tpu.training.datasets.got10k import Got10k

    class Got10kVOS(_VOSMaskMixin, Got10k):
        def _mask_path(self, seq_id, frame_id):
            name = self.sequence_list[seq_id]
            return os.path.join(mask_root, name, f"{frame_id + 1:08d}.png")

    return Got10kVOS(root, **kwargs)


def make_lasot_vos(root: str, mask_root: str, **kwargs):
    """LasotVOS (reference lasotvos.py): LaSOT boxes + STA pseudo-masks."""
    from pytracking_tpu.training.datasets.lasot import Lasot

    class LasotVOS(_VOSMaskMixin, Lasot):
        def _mask_path(self, seq_id, frame_id):
            name = self.sequence_list[seq_id]
            cls = name.split("-")[0]
            return os.path.join(mask_root, cls, name, f"{frame_id + 1:08d}.png")

    return LasotVOS(root, **kwargs)


class LVIS(MSCOCOSeq):
    """LVIS instance dataset (reference lvis.py) — COCO-format JSON at
    `lvis_v1_<split>.json`; images live under the COCO directories."""

    def __init__(self, root: str, split: str = "train", min_area: float = 50.0):
        import json

        # bypass MSCOCOSeq.__init__ (different annotation file name/layout)
        from pytracking_tpu.training.datasets.base import BaseImageDataset
        BaseImageDataset.__init__(self, "lvis", root)
        with open(os.path.join(root, f"lvis_v1_{split}.json")) as f:
            data = json.load(f)
        self.img_info = {im["id"]: im for im in data["images"]}
        self.img_prefix = root
        self.sequence_list = [a for a in data["annotations"]
                              if a["bbox"][2] * a["bbox"][3] > min_area]
        self.cats = {c["id"]: c.get("name", "") for c in data.get("categories", [])}

    def get_frames(self, seq_id: int, frame_ids, anno=None):
        # LVIS images store their path in coco_url suffix
        a = self.sequence_list[seq_id]
        im_info = self.img_info[a["image_id"]]
        rel = im_info.get("coco_url", "").split("/")[-2:]
        im_info = dict(im_info, file_name=os.path.join(*rel) if len(rel) == 2
                       else im_info.get("file_name", ""))
        self.img_info[a["image_id"]] = im_info
        return super().get_frames(seq_id, frame_ids, anno)
