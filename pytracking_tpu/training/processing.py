"""Per-sample processing: jitter → crop → resize → labels/proposals.

Re-design of reference `ltr/data/processing.py` (BaseProcessing:16, ATOMProcessing:40,
DiMPProcessing:337, KLDiMPProcessing:494). Host-side numpy; output is a dict of
fixed-shape float32 arrays ready for device batching.
"""

from __future__ import annotations

import random
from typing import Dict, Optional

import numpy as np

from pytracking_tpu.training import processing_utils as prutils
from pytracking_tpu.training.transforms import Transform


class BaseProcessing:
    def __init__(self, transform: Optional[Transform] = None,
                 train_transform: Optional[Transform] = None,
                 test_transform: Optional[Transform] = None,
                 joint_transform: Optional[Transform] = None):
        self.transform = {
            "train": train_transform or transform or Transform(),
            "test": test_transform or transform or Transform(),
            "joint": joint_transform,
        }

    def __call__(self, data: dict) -> dict:
        raise NotImplementedError


class DiMPProcessing(BaseProcessing):
    """DiMP training processing (reference processing.py:337-491): jitter the target
    box, crop search_area_factor² area, generate IoU-net proposals and Gaussian score
    labels."""

    def __init__(self, search_area_factor: float, output_sz: int, center_jitter_factor,
                 scale_jitter_factor, crop_type: str = "replicate",
                 max_scale_change=None, mode: str = "sequence",
                 proposal_params: Optional[dict] = None,
                 label_function_params: Optional[dict] = None, **kwargs):
        super().__init__(**kwargs)
        self.search_area_factor = search_area_factor
        self.output_sz = output_sz
        self.center_jitter_factor = center_jitter_factor
        self.scale_jitter_factor = scale_jitter_factor
        self.mode = mode
        self.proposal_params = proposal_params
        self.label_function_params = label_function_params

    def _get_jittered_box(self, box: np.ndarray, mode: str) -> np.ndarray:
        """(reference processing.py:365-379)"""
        jittered_size = box[2:4] * np.exp(np.random.randn(2) *
                                          self.scale_jitter_factor[mode])
        max_offset = np.sqrt(jittered_size.prod()) * self.center_jitter_factor[mode]
        jittered_center = box[0:2] + 0.5 * box[2:4] + \
            max_offset * (np.random.rand(2) - 0.5)
        return np.concatenate([jittered_center - 0.5 * jittered_size, jittered_size])

    def _generate_proposals(self, box: np.ndarray):
        p = self.proposal_params
        return prutils.gaussian_proposals(
            box, p["boxes_per_frame"], p.get("proposal_sigma", 0.05))

    def _generate_label_function(self, target_bb: np.ndarray, feature_sz=None):
        p = self.label_function_params
        return prutils.gaussian_label_function(
            target_bb, p["sigma_factor"], p["kernel_sz"],
            feature_sz if feature_sz is not None else p["feature_sz"],
            self.output_sz, end_pad_if_even=p.get("end_pad_if_even", True))

    def __call__(self, data: dict) -> dict:
        """data: {'train_images': [...], 'train_anno': [...], 'test_images': [...],
        'test_anno': [...]} -> adds cropped images, boxes, proposals, labels."""
        if self.transform["joint"] is not None:
            data["train_images"], data["train_anno"] = self.transform["joint"](
                image=data["train_images"], bbox=data["train_anno"])
            data["test_images"], data["test_anno"] = self.transform["joint"](
                image=data["test_images"], bbox=data["test_anno"], joint=False)

        for s in ("train", "test"):
            jittered = [self._get_jittered_box(np.asarray(a, np.float32), s)
                        for a in data[s + "_anno"]]
            crops, boxes = prutils.jittered_center_crop(
                data[s + "_images"], jittered, data[s + "_anno"],
                self.search_area_factor, self.output_sz)
            crops, boxes = self.transform[s](image=crops, bbox=boxes, joint=False)
            data[s + "_images"] = [np.asarray(c, np.float32) for c in crops]
            data[s + "_anno"] = [np.asarray(b, np.float32) for b in boxes]

        if self.proposal_params:
            proposals, gt_iou = zip(*[self._generate_proposals(a)
                                      for a in data["test_anno"]])
            data["test_proposals"] = list(proposals)
            data["proposal_iou"] = list(gt_iou)

        if self.label_function_params is not None:
            data["train_label"] = [self._generate_label_function(a[None])[0]
                                   for a in data["train_anno"]]
            data["test_label"] = [self._generate_label_function(a[None])[0]
                                  for a in data["test_anno"]]
        return data


class ATOMProcessing(DiMPProcessing):
    """ATOM processing (reference processing.py:40-157): same pipeline without score
    labels (proposals only)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("label_function_params", None)
        super().__init__(*args, **kwargs)


def _encode_ltrb(boxes: np.ndarray, output_sz: int, stride: int) -> np.ndarray:
    """Dense LTRB map of a box on the feature grid, normalized by the crop size
    (reference processing.py ToMPProcessing._generate_ltrb_targets)."""
    sz = output_sz // stride
    loc = np.arange(0, output_sz, stride, np.float32) + stride / 2
    xs = loc[None, :]
    ys = loc[:, None]
    x1, y1, w, h = [float(v) for v in boxes]
    l = xs - x1
    t = ys - y1
    r = (x1 + w) - xs
    b = (y1 + h) - ys
    l, t, r, b = [np.broadcast_to(v, (sz, sz)) for v in (l, t, r, b)]
    return np.stack([l, t, r, b], axis=-1) / output_sz


class ToMPProcessing(DiMPProcessing):
    """ToMP training processing (reference processing.py:1439-1616): crops + Gaussian
    labels + dense LTRB regression targets for train and test frames."""

    def __call__(self, data: dict) -> dict:
        data = super().__call__(data)
        stride = self.label_function_params.get("stride", 16) \
            if self.label_function_params else 16
        for s in ("train", "test"):
            data[s + "_ltrb_target"] = [
                _encode_ltrb(np.asarray(a, np.float32), self.output_sz, stride)
                for a in data[s + "_anno"]]
        return data


class KLDiMPProcessing(DiMPProcessing):
    """PrDiMP training processing (reference processing.py:494-667): Gaussian-mixture
    proposal sampling with densities for the KL regression objective, plus label
    DENSITY maps."""

    def _generate_proposals(self, box: np.ndarray):
        p = self.proposal_params
        num = p["boxes_per_frame"]
        sigmas = p.get("proposal_sigma", [(0.05, 0.05), (0.5, 0.5)])
        from pytracking_tpu.ops.bbox import rect_to_rel, rel_to_rect
        import jax.numpy as jnp

        box = np.asarray(box, np.float64)
        proposals = np.zeros((num, 4), np.float32)
        densities = np.zeros((num,), np.float32)
        sz_norm = box[2:]
        center_rel = np.concatenate([(box[:2] + box[2:] / 2) / sz_norm,
                                     np.log(np.maximum(box[2:], 1e-6))])
        proposals[0] = box
        densities[0] = 0.0
        for i in range(num):
            s = sigmas[np.random.randint(len(sigmas))]
            std = np.array([s[0], s[0], s[1], s[1]])
            if i == 0:
                d = np.zeros(4)
            else:
                d = np.random.randn(4) * std
            rel = center_rel + d
            c = rel[:2] * sz_norm
            wh = np.exp(rel[2:])
            proposals[i] = np.concatenate([c - wh / 2, wh])
            # mixture density at the drawn offset
            dens = np.mean([np.prod(
                np.exp(-0.5 * (d / np.array([sg[0], sg[0], sg[1], sg[1]])) ** 2) /
                (np.sqrt(2 * np.pi) * np.array([sg[0], sg[0], sg[1], sg[1]])))
                for sg in sigmas])
            densities[i] = dens
        gt_density = np.zeros((num,), np.float32)
        gt_density[0] = 1.0
        return proposals, densities, gt_density

    def __call__(self, data: dict) -> dict:
        if self.transform["joint"] is not None:
            data["train_images"], data["train_anno"] = self.transform["joint"](
                image=data["train_images"], bbox=data["train_anno"])
            data["test_images"], data["test_anno"] = self.transform["joint"](
                image=data["test_images"], bbox=data["test_anno"], joint=False)
        for s in ("train", "test"):
            jittered = [self._get_jittered_box(np.asarray(a, np.float32), s)
                        for a in data[s + "_anno"]]
            crops, boxes = prutils.jittered_center_crop(
                data[s + "_images"], jittered, data[s + "_anno"],
                self.search_area_factor, self.output_sz)
            crops, boxes = self.transform[s](image=crops, bbox=boxes, joint=False)
            data[s + "_images"] = [np.asarray(c, np.float32) for c in crops]
            data[s + "_anno"] = [np.asarray(b, np.float32) for b in boxes]

        if self.proposal_params:
            out = [self._generate_proposals(a) for a in data["test_anno"]]
            data["test_proposals"] = [o[0] for o in out]
            data["proposal_density"] = [o[1] for o in out]
            data["gt_density"] = [o[2] for o in out]

        if self.label_function_params is not None:
            p = self.label_function_params
            data["test_label_density"] = [
                prutils.gaussian_label_function(
                    a[None], p["sigma_factor"], p["kernel_sz"], p["feature_sz"],
                    self.output_sz, density=True)[0]
                for a in data["test_anno"]]
            data["train_label"] = [self._generate_label_function(a[None])[0]
                                   for a in data["train_anno"]]
        return data


class LWLProcessing(DiMPProcessing):
    """Segmentation crop processing (reference ltr/data/processing.py LWLProcessing):
    crops images AND masks around the jittered target box. Produces train/test_images,
    train/test_anno and train/test_masks (crop-sized binary masks)."""

    def __call__(self, data: dict) -> dict:
        if self.transform["joint"] is not None:
            data["train_images"], data["train_anno"] = self.transform["joint"](
                image=data["train_images"], bbox=data["train_anno"])
            data["test_images"], data["test_anno"] = self.transform["joint"](
                image=data["test_images"], bbox=data["test_anno"], joint=False)

        for s in ("train", "test"):
            jittered = [self._get_jittered_box(np.asarray(a, np.float32), s)
                        for a in data[s + "_anno"]]
            crops, boxes = prutils.jittered_center_crop(
                data[s + "_images"], jittered, data[s + "_anno"],
                self.search_area_factor, self.output_sz)
            mask_crops = None
            if s + "_masks" in data:
                mask_crops = [prutils.sample_target(
                    np.asarray(m, np.float32), j, self.search_area_factor,
                    self.output_sz)[0] for m, j in zip(data[s + "_masks"],
                                                       jittered)]
                mask_crops = [(m > 0.5).astype(np.float32) for m in mask_crops]
            crops, boxes = self.transform[s](image=crops, bbox=boxes, joint=False)
            data[s + "_images"] = [np.asarray(c, np.float32) for c in crops]
            data[s + "_anno"] = [np.asarray(b, np.float32) for b in boxes]
            if mask_crops is not None:
                data[s + "_masks"] = mask_crops

        if self.label_function_params is not None:
            data["train_label"] = [self._generate_label_function(a[None])[0]
                                   for a in data["train_anno"]]
            data["test_label"] = [self._generate_label_function(a[None])[0]
                                  for a in data["test_anno"]]
        return data


class TaMOsProcessing(ToMPProcessing):
    """Multi-object batch processing for TaMOs (reference processing.py
    TaMOsProcessing): lays single-object samples into K fixed slots — slot 0 carries
    the object, the rest stay empty (zero labels / zero sample region). Full
    multi-object blending comes from multi-object datasets; the slot layout and
    masking are what the TaMOs actor consumes either way."""

    def __init__(self, *args, num_objects: int = 3, stride_high: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_objects = num_objects
        self.stride_high = stride_high

    def __call__(self, data: dict) -> dict:
        data = super().__call__(data)
        K = self.num_objects
        sz_lo = self.output_sz // (self.label_function_params.get("stride", 16)
                                   if self.label_function_params else 16)
        sz_hi = self.output_sz // self.stride_high

        def slots(x, k_axis_last: bool):
            x = np.asarray(x, np.float32)
            out_shape = x.shape + (K,) if k_axis_last else (K,) + x.shape
            out = np.zeros(out_shape, np.float32)
            if k_axis_last:
                out[..., 0] = x
            else:
                out[0] = x
            return out

        # train side: (K, h, w) labels + (K, 4, h, w) ltrb, slot-first
        data["train_label"] = [slots(l, False) for l in data["train_label"]]
        data["train_ltrb_target"] = [
            np.transpose(slots(np.transpose(l, (2, 0, 1)), False), (0, 1, 2, 3))
            for l in data["train_ltrb_target"]]

        # test side on the high-res FPN grid, slot-last
        import pytracking_tpu.training.processing_utils as pu
        test_labels_hi = []
        test_ltrb_hi = []
        test_region = []
        for a in data["test_anno"]:
            lbl = self._generate_label_function(np.asarray(a, np.float32)[None],
                                                feature_sz=sz_hi)[0]
            test_labels_hi.append(slots(lbl, True))
            ltrb = _encode_ltrb(np.asarray(a, np.float32), self.output_sz,
                                self.stride_high)
            test_ltrb_hi.append(slots(ltrb, False).transpose(1, 2, 0, 3))
            x, y, w, h = [float(v) for v in a]
            ys = (np.arange(sz_hi) + 0.5) * self.stride_high
            xs = (np.arange(sz_hi) + 0.5) * self.stride_high
            inside = ((ys[:, None] >= y) & (ys[:, None] <= y + h) &
                      (xs[None, :] >= x) & (xs[None, :] <= x + w))
            test_region.append(slots(inside.astype(np.float32), True))
        data["test_label"] = test_labels_hi
        data["test_ltrb_target"] = test_ltrb_hi
        data["test_sample_region"] = test_region
        return data
