"""Joint image/bbox/mask transforms for training data augmentation.

Re-design of reference `ltr/data/transforms.py` (Transform:10, TransformBase:89,
ToGrayscale:255, RandomHorizontalFlip:438, …). Host-side numpy: a `Transform` chain
rolls its random parameters ONCE per call and applies them jointly to every image/bbox/
mask passed in, so train and test frames of one sequence get identical augmentation
where the reference does (`joint` mode).

Images are HWC uint8/float RGB; boxes xywh; masks HW.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

import numpy as np


class TransformBase:
    """One augmentation: override roll() and the transform_* methods."""

    def roll(self):
        return None

    def transform_image(self, image, rolled):
        return image

    def transform_bbox(self, bbox, rolled, image_shape):
        return bbox

    def transform_mask(self, mask, rolled):
        return mask


class Transform:
    """A chain of TransformBase applied jointly (reference transforms.py:10-86).

    Call with keyword lists: image=[...], bbox=[...], mask=[...]; optional
    joint=False rolls independently per element.
    """

    def __init__(self, *transforms: TransformBase):
        self.transforms = list(transforms)

    def __call__(self, image=None, bbox=None, mask=None, joint: bool = True):
        single = not isinstance(image, (list, tuple)) if image is not None else \
            not isinstance(bbox, (list, tuple))
        images = [image] if single and image is not None else (image or [])
        bboxes = [bbox] if single and bbox is not None else (bbox or [])
        masks = [mask] if single and mask is not None else (mask or [])

        n = max(len(images), len(bboxes), len(masks))
        rolls_per_t = []
        for t in self.transforms:
            if joint:
                rolls_per_t.append([t.roll()] * n)
            else:
                rolls_per_t.append([t.roll() for _ in range(n)])

        out_images, out_bboxes, out_masks = list(images), list(bboxes), list(masks)
        for t, rolls in zip(self.transforms, rolls_per_t):
            for i in range(n):
                shape = out_images[i].shape if i < len(out_images) else None
                if i < len(out_images):
                    out_images[i] = t.transform_image(out_images[i], rolls[i])
                if i < len(out_bboxes):
                    out_bboxes[i] = t.transform_bbox(out_bboxes[i], rolls[i], shape)
                if i < len(out_masks):
                    out_masks[i] = t.transform_mask(out_masks[i], rolls[i])

        result = []
        if image is not None:
            result.append(out_images[0] if single else out_images)
        if bbox is not None:
            result.append(out_bboxes[0] if single else out_bboxes)
        if mask is not None:
            result.append(out_masks[0] if single else out_masks)
        return result[0] if len(result) == 1 else tuple(result)


class ToGrayscale(TransformBase):
    """(reference transforms.py:255-270)"""

    def __init__(self, probability: float = 0.5):
        self.probability = probability

    def roll(self):
        return random.random() < self.probability

    def transform_image(self, image, do_gray):
        if do_gray:
            w = np.array([0.299, 0.587, 0.114], image.dtype if
                         np.issubdtype(image.dtype, np.floating) else np.float32)
            gray = (image @ w)
            return np.stack([gray] * 3, axis=-1).astype(image.dtype)
        return image


class RandomHorizontalFlip(TransformBase):
    """(reference transforms.py:438-466)"""

    def __init__(self, probability: float = 0.5):
        self.probability = probability

    def roll(self):
        return random.random() < self.probability

    def transform_image(self, image, do_flip):
        return np.ascontiguousarray(image[:, ::-1]) if do_flip else image

    def transform_bbox(self, bbox, do_flip, image_shape):
        if do_flip:
            bbox = np.asarray(bbox, np.float32).copy()
            bbox[0] = image_shape[1] - bbox[0] - bbox[2]
        return bbox

    def transform_mask(self, mask, do_flip):
        return np.ascontiguousarray(mask[:, ::-1]) if do_flip else mask


class BrightnessJitter(TransformBase):
    """ToTensorAndJitter's brightness component (reference transforms.py:183-205)."""

    def __init__(self, brightness_jitter: float = 0.2):
        self.brightness_jitter = brightness_jitter

    def roll(self):
        return np.random.uniform(max(0, 1 - self.brightness_jitter),
                                 1 + self.brightness_jitter)

    def transform_image(self, image, factor):
        return np.clip(image.astype(np.float32) * factor, 0, 255)


class Normalize(TransformBase):
    """Not applied here: normalization happens on-device in extract_backbone. Kept as a
    no-op for recipe compatibility."""

    def __init__(self, mean=None, std=None):
        pass


class Blur(TransformBase):
    """Gaussian blur with probability (reference transforms.py:~350)."""

    def __init__(self, probability: float = 0.2, sigma_range=(0.2, 2.0)):
        self.probability = probability
        self.sigma_range = sigma_range

    def roll(self):
        if random.random() < self.probability:
            return random.uniform(*self.sigma_range)
        return None

    def transform_image(self, image, sigma):
        if sigma is None:
            return image
        try:
            import cv2
            k = int(2 * round(2 * sigma) + 1)
            return cv2.GaussianBlur(image.astype(np.float32), (k, k), sigma)
        except ImportError:
            return image
