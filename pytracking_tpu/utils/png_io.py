"""Indexed-PNG segmentation IO (DAVIS/YouTube-VOS palette format).

Re-design of reference `ltr/data/image_loader.py` (imread_indexed:83,
imwrite_indexed:92).
"""

from __future__ import annotations

import numpy as np

# standard DAVIS palette (first entries); generated procedurally like the benchmark kits
_PALETTE = np.concatenate([
    np.array([[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0], [0, 0, 128],
              [128, 0, 128], [0, 128, 128], [128, 128, 128]], np.uint8),
    np.zeros((248, 3), np.uint8)])


def imread_indexed(filename: str) -> np.ndarray:
    from PIL import Image
    im = Image.open(filename)
    return np.atleast_3d(np.asarray(im))[..., 0]


def imwrite_indexed(filename: str, array: np.ndarray, color_palette=None):
    from PIL import Image
    if color_palette is None:
        color_palette = _PALETTE
    im = Image.fromarray(np.asarray(array, np.uint8), mode="P")
    im.putpalette(color_palette.ravel().tolist())
    im.save(filename, format="PNG")
