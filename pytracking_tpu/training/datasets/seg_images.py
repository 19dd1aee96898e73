"""Segmentation image datasets: ECSSD, MSRA10k, HKU-IS, SBD.

Re-design of reference `ltr/dataset/{ecssd,msra10k,hku_is,sbd}.py`: all four are
(image, binary-mask) pair collections used as foregrounds for SyntheticVideoBlend.
One configurable reader covers the shared layout (images dir + masks dir with
matching stems); dataset-specific subclasses pin the directory names.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from pytracking_tpu.training.datasets.base import BaseImageDataset
from pytracking_tpu.training.datasets.vos_base import _mask_to_bbox


class SegImageDataset(BaseImageDataset):

    def __init__(self, name: str, root: str, image_dir: str, mask_dir: str,
                 image_ext: str = ".jpg", mask_ext: str = ".png",
                 min_area: float = 100.0):
        super().__init__(name, root)
        self.image_dir = os.path.join(root, image_dir)
        self.mask_dir = os.path.join(root, mask_dir)
        self.mask_ext = mask_ext
        stems = sorted(os.path.splitext(os.path.basename(p))[0]
                       for p in glob.glob(os.path.join(self.image_dir,
                                                       "*" + image_ext)))
        self.sequence_list = [s for s in stems if os.path.isfile(
            os.path.join(self.mask_dir, s + mask_ext))]
        self.image_ext = image_ext
        self.min_area = min_area

    def get_num_sequences(self):
        return len(self.sequence_list)

    def has_segmentation_info(self):
        return True

    def _load(self, seq_id):
        from pytracking_tpu.training.datasets.lasot import _read_image
        from PIL import Image

        stem = self.sequence_list[seq_id]
        im = _read_image(os.path.join(self.image_dir, stem + self.image_ext))
        m = np.asarray(Image.open(
            os.path.join(self.mask_dir, stem + self.mask_ext)).convert("L"))
        return im, (m > 127).astype(np.float32)

    def get_sequence_info(self, seq_id: int):
        _, m = self._load(seq_id)
        bbox = _mask_to_bbox(m).reshape(1, 4)
        valid = np.array([bbox[0, 2] * bbox[0, 3] > self.min_area])
        return {"bbox": bbox, "valid": valid, "visible": valid.copy()}

    def get_frames(self, seq_id: int, frame_ids: List[int],
                   anno: Optional[dict] = None):
        im, m = self._load(seq_id)
        if anno is None:
            anno = self.get_sequence_info(seq_id)
        frames = [im for _ in frame_ids]
        frame_anno = {k: [v[0] for _ in frame_ids] for k, v in anno.items()}
        frame_anno["mask"] = [m for _ in frame_ids]
        return frames, frame_anno, {"object_class_name": None}


class ECSSD(SegImageDataset):
    """(reference ltr/dataset/ecssd.py)"""

    def __init__(self, root: str):
        super().__init__("ecssd", root, "images", "ground_truth_mask")


class MSRA10k(SegImageDataset):
    """(reference ltr/dataset/msra10k.py)"""

    def __init__(self, root: str):
        super().__init__("msra10k", root, "Imgs", "Imgs")


class HKUIS(SegImageDataset):
    """(reference ltr/dataset/hku_is.py)"""

    def __init__(self, root: str):
        super().__init__("hkuis", root, "imgs", "gt")


class SBD(SegImageDataset):
    """(reference ltr/dataset/sbd.py — simplified to the img/ + binary-mask layout;
    the original parses .mat instance annotations)."""

    def __init__(self, root: str):
        super().__init__("sbd", root, "img", "masks")
