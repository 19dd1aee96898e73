"""Base class for VOS training datasets (DAVIS / YouTube-VOS layout).

Re-design of reference `ltr/dataset/vos_base.py` (VOSDatasetBase:205, VOSMeta:13):
the reference builds a cached `VOSMeta` JSON of per-object frame ranges; here the
directory layout (JPEGImages/<seq>/*.jpg + Annotations/<seq>/*.png indexed masks)
is scanned directly and per-object info derived from the first occurrence of each
object id. Each (sequence, object) pair becomes one single-object training sequence;
masks are binary per object, boxes derived via masks_to_bboxes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from pytracking_tpu.training.datasets.base import BaseVideoDataset
from pytracking_tpu.utils.png_io import imread_indexed


def _mask_to_bbox(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros(4, np.float32)
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return np.asarray([x0, y0, x1 - x0 + 1, y1 - y0 + 1], np.float32)


class VOSDatasetBase(BaseVideoDataset):
    """root must contain JPEGImages/<split-dirs> and Annotations (indexed PNGs)."""

    def __init__(self, name: str, img_root: str, anno_root: str,
                 sequences: Optional[List[str]] = None,
                 multiobj: bool = False):
        super().__init__(name, img_root)
        self.img_root = img_root
        self.anno_root = anno_root
        self.multiobj = multiobj
        seq_names = sequences or sorted(os.listdir(img_root))
        # one entry per (sequence, object)
        self.sequence_list = []
        self._frames: Dict[str, List[str]] = {}
        for sname in seq_names:
            sdir = os.path.join(img_root, sname)
            adir = os.path.join(anno_root, sname)
            if not os.path.isdir(sdir) or not os.path.isdir(adir):
                continue
            frames = sorted(f for f in os.listdir(sdir)
                            if f.lower().endswith((".jpg", ".jpeg", ".png")))
            self._frames[sname] = frames
            first_anno = sorted(os.listdir(adir))[0]
            m = imread_indexed(os.path.join(adir, first_anno))
            obj_ids = [int(i) for i in np.unique(m) if i != 0]
            if multiobj:
                self.sequence_list.append((sname, obj_ids))
            else:
                for oid in obj_ids:
                    self.sequence_list.append((sname, oid))

    def get_num_sequences(self):
        return len(self.sequence_list)

    def has_segmentation_info(self):
        return True

    def _anno_path(self, sname, frame_name):
        return os.path.join(self.anno_root, sname,
                            os.path.splitext(frame_name)[0] + ".png")

    def _load_mask(self, sname, frame_name, obj_id):
        p = self._anno_path(sname, frame_name)
        if not os.path.isfile(p):
            return None
        m = imread_indexed(p)
        return (m == obj_id).astype(np.float32)

    def get_sequence_info(self, seq_id: int):
        sname, obj_id = self.sequence_list[seq_id]
        frames = self._frames[sname]
        boxes, valid = [], []
        for fn in frames:
            m = self._load_mask(sname, fn, obj_id)
            if m is None:
                boxes.append(np.zeros(4, np.float32))
                valid.append(False)
            else:
                bb = _mask_to_bbox(m)
                boxes.append(bb)
                valid.append(bb[2] > 0 and bb[3] > 0)
        bbox = np.stack(boxes)
        valid = np.asarray(valid)
        return {"bbox": bbox, "valid": valid, "visible": valid.copy()}

    def get_frames(self, seq_id: int, frame_ids: List[int],
                   anno: Optional[dict] = None):
        from pytracking_tpu.training.datasets.lasot import _read_image

        sname, obj_id = self.sequence_list[seq_id]
        frames_names = self._frames[sname]
        frames = [_read_image(os.path.join(self.img_root, sname, frames_names[t]))
                  for t in frame_ids]
        if anno is None:
            anno = self.get_sequence_info(seq_id)
        frame_anno = {k: [v[t] for t in frame_ids] for k, v in anno.items()}
        masks = []
        for t in frame_ids:
            m = self._load_mask(sname, frames_names[t], obj_id)
            masks.append(m if m is not None else
                         np.zeros(frames[0].shape[:2], np.float32))
        frame_anno["mask"] = masks
        return frames, frame_anno, {"object_class_name": None}


class Davis(VOSDatasetBase):
    """DAVIS 2017 train split (reference ltr/dataset/davis.py)."""

    def __init__(self, root: str, split: str = "train", version: str = "2017"):
        seq_file = os.path.join(root, "ImageSets", version, split + ".txt")
        sequences = None
        if os.path.isfile(seq_file):
            with open(seq_file) as f:
                sequences = [l.strip() for l in f if l.strip()]
        super().__init__("davis", os.path.join(root, "JPEGImages", "480p"),
                         os.path.join(root, "Annotations", "480p"), sequences)


class YouTubeVOS(VOSDatasetBase):
    """YouTube-VOS train split (reference ltr/dataset/youtubevos.py)."""

    def __init__(self, root: str, split: str = "train", version: str = "2019"):
        base = os.path.join(root, version, split)
        super().__init__("youtubevos", os.path.join(base, "JPEGImages"),
                         os.path.join(base, "Annotations"))
