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


class RTSProcessing(LWLProcessing):
    """RTS training processing (reference ltr/data/processing.py:1617-1746
    RTSProcessing): LWL's image+mask crops plus DiMP-style Gaussian score labels
    for the classifier branch. LWLProcessing already emits both when
    label_function_params is set; this subclass pins the reference name."""


class KYSProcessing(BaseProcessing):
    """KYS training processing (reference ltr/data/processing.py:780-938): a
    synthetic camera-motion jitter per frame (uniform offsets, optionally
    motion-limited against the previous frame, retried until the crop overlaps
    the image), IoU-perturbed proposals, and Gaussian labels that are ZEROED on
    frames where the target is absent/occluded (test_visible x test_valid_anno) —
    the supervision KYS needs to learn propagation through occlusions."""

    def __init__(self, search_area_factor, output_sz, center_jitter_param,
                 scale_jitter_param, proposal_params=None,
                 label_function_params=None, min_crop_inside_ratio=0.0, **kwargs):
        super().__init__(**kwargs)
        self.search_area_factor = search_area_factor
        self.output_sz = output_sz
        self.center_jitter_param = center_jitter_param
        self.scale_jitter_param = scale_jitter_param
        self.proposal_params = proposal_params
        self.label_function_params = label_function_params
        self.min_crop_inside_ratio = min_crop_inside_ratio

    def _check_if_crop_inside_image(self, box, im_shape) -> bool:
        """(reference :818-841)"""
        import math
        x, y, w, h = [float(v) for v in box]
        if w <= 0.0 or h <= 0.0:
            return False
        crop_sz = math.ceil(math.sqrt(w * h) * self.search_area_factor)
        x1 = x + 0.5 * w - crop_sz * 0.5
        y1 = y + 0.5 * h - crop_sz * 0.5
        x2, y2 = x1 + crop_sz, y1 + crop_sz
        w_inside = max(min(x2, im_shape[1]) - max(x1, 0), 0)
        h_inside = max(min(y2, im_shape[0]) - max(y1, 0), 0)
        crop_area = (x2 - x1) * (y2 - y1)
        return crop_area > 0 and \
            (w_inside * h_inside / crop_area) > self.min_crop_inside_ratio

    def _generate_synthetic_motion(self, boxes, images, mode):
        """(reference :843-885)"""
        out_boxes = []
        for i in range(len(boxes)):
            orig = np.asarray(boxes[i], np.float32)
            jittered = np.array([1.0, 1.0, 10.0, 10.0], np.float32)
            for _ in range(10):
                size = orig[2:4] * np.exp(
                    np.random.randn(2) * self.scale_jitter_param[mode + "_factor"])
                max_offset = float(np.sqrt(size.prod()) *
                                   self.center_jitter_param[mode + "_factor"])
                offset_factor = np.random.rand(2) - 0.5
                center = orig[0:2] + 0.5 * orig[2:4] + max_offset * offset_factor
                if self.center_jitter_param.get(mode + "_limit_motion", False) \
                        and out_boxes:
                    prev_c = out_boxes[-1][:2] + 0.5 * out_boxes[-1][2:]
                    lim = float(np.sqrt(out_boxes[-1][2:].prod()) * 2.5)
                    for d in range(2):
                        if abs(center[d] - prev_c[d]) > lim:
                            center[d] = orig[d] + 0.5 * orig[d + 2] \
                                - max_offset * offset_factor[d]
                cand = np.concatenate([center - 0.5 * size, size])
                if self._check_if_crop_inside_image(cand, images[i].shape):
                    jittered = cand
                    break
            out_boxes.append(jittered.astype(np.float32))
        return out_boxes

    def _generate_proposals(self, box):
        """min-IoU perturbation proposals (reference :886-903); gt_iou in [-1, 1]."""
        p = self.proposal_params
        num = p["boxes_per_frame"]
        proposals = np.zeros((num, 4), np.float32)
        gt_iou = np.zeros(num, np.float32)
        for i in range(num):
            proposals[i], gt_iou[i] = prutils.perturb_box(
                np.asarray(box, np.float32), min_iou=p["min_iou"],
                sigma_factor=p["sigma_factor"])
        return proposals, gt_iou * 2 - 1

    def __call__(self, data: dict) -> dict:
        if self.transform["joint"] is not None:
            data["train_images"], data["train_anno"] = self.transform["joint"](
                image=data["train_images"], bbox=data["train_anno"])
            data["test_images"], data["test_anno"] = self.transform["joint"](
                image=data["test_images"], bbox=data["test_anno"], joint=False)

        for s in ("train", "test"):
            jittered = self._generate_synthetic_motion(
                [np.asarray(a, np.float32) for a in data[s + "_anno"]],
                data[s + "_images"], s)
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
            p = self.label_function_params

            def label(a):
                return prutils.gaussian_label_function(
                    np.asarray(a, np.float32)[None], p["sigma_factor"],
                    p["kernel_sz"], p["feature_sz"], self.output_sz,
                    end_pad_if_even=p.get("end_pad_if_even", True))[0]

            data["train_label"] = [label(a) for a in data["train_anno"]]
            visible = np.asarray(data.get("test_visible",
                                          np.ones(len(data["test_anno"]))),
                                 np.float32)
            valid = np.asarray(data.get("test_valid_anno",
                                        np.ones(len(data["test_anno"]))),
                               np.float32)
            absent = 1.0 - visible * valid
            data["test_label"] = [label(a) * (1.0 - absent[i])
                                  for i, a in enumerate(data["test_anno"])]
        return data


class TargetCandidateMatchingProcessing(BaseProcessing):
    """KeepTrack TCM training processing (reference ltr/data/processing.py:940-1446
    TargetCandiateMatchingProcessing). self_sup: one frame, candidates matched to a
    jittered second view of the same search area, with random candidate dropout
    (re-detection / occlusion simulation), farthest-point fake-candidate padding to
    a fixed K, and score/coordinate augmentation. partial_sup: two consecutive
    frames with supervision only on the annotated target's candidate. Assignment
    semantics: 1 match, -1 no-match (dustbin), -2 ignored."""

    def __init__(self, output_sz, num_target_candidates: int = 5,
                 score_map_sz=(23, 23), enable_search_area_aug: bool = True,
                 search_area_jitter_value: int = 100,
                 img_aug_transform=None, **kwargs):
        super().__init__(**kwargs)
        self.output_sz = output_sz
        self.K = num_target_candidates
        self.score_map_sz = score_map_sz
        self.enable_search_area_aug = enable_search_area_aug
        self.sa_jitter = search_area_jitter_value
        self.img_aug_transform = img_aug_transform

    # ---- helpers (reference :1308-1446) ----

    def _candidate_drop_out(self, coords0, coords1):
        n = min(coords1.shape[0], self.K)
        n_drop = int(round(0.25 * n * np.random.rand()))
        idx = np.random.permutation(n)[:n_drop]
        pad0 = np.zeros((self.K, 2), np.float32)
        pad1 = np.zeros((self.K, 2), np.float32)
        valid0 = np.zeros(self.K, np.float32)
        valid1 = np.zeros(self.K, np.float32)
        pad0[:n] = coords0[:n]
        pad1[:n] = coords1[:n]
        valid0[:n] = 1
        valid1[:n] = 1
        if np.random.rand() < 0.5:
            pad0[idx] = 0
            valid0[idx] = 0
        else:
            pad1[idx] = 0
            valid1[idx] = 0
        return pad0, pad1, valid0, valid1

    def _pad_with_fake_candidates(self, pads, valids, sa_boxes, im_shape):
        """Fill empty slots with farthest-point random candidates inside the
        search areas (reference :1333-1363)."""
        H, W = im_shape[:2]
        lows, highs = [], []
        for sa in sa_boxes:
            x, y, w, h = [int(v) for v in sa]
            lows.append((max(0, y), max(0, x)))
            highs.append((min(H, y + h), min(W, x + w)))
        filled = [v.copy() for v in valids]
        for i in range(self.K):
            for k in range(len(pads)):
                if filled[k][i] == 0:
                    cs = np.stack([
                        np.random.rand(20) * (highs[k][0] - lows[k][0]) + lows[k][0],
                        np.random.rand(20) * (highs[k][1] - lows[k][1]) + lows[k][1],
                    ], axis=1)
                    used = np.concatenate([p[f == 1] for p, f in zip(pads, filled)])
                    if used.size:
                        dist = np.sqrt(((used[:, None] - cs[None]) ** 2).sum(-1))
                        best = int(dist.min(axis=0).argmax())
                    else:
                        best = 0
                    pads[k][i] = cs[best]
                    filled[k][i] = 1
        return pads

    def _fake_scores(self, scores, valid):
        out = np.zeros(self.K, np.float32)
        n = min(len(scores), self.K)
        out[:n][valid[:n] == 1] = np.asarray(scores, np.float32)[:n][valid[:n] == 1]
        n_fake = int((valid == 0).sum())
        out[valid == 0] = np.minimum(np.abs(np.random.randn(n_fake)) / 50,
                                     0.025) + 0.05
        return out

    def _augment_scores(self, scores, valid):
        """Score noise (reference :1372-1400, condensed): valid candidates get
        small Gaussian noise, clipped positive, order roughly preserved."""
        out = scores.copy()
        m = valid == 1
        out[m] = np.clip(out[m] + 0.1 * np.random.randn(int(m.sum())), 0.001, None)
        return out

    def _augment_coords(self, coords, valid):
        out = coords.copy()
        m = valid == 1
        out[m] = out[m] + np.random.randn(int(m.sum()), 2) * 2.0
        return out

    def _img_to_tsm(self, img_coords, sa_box):
        x, y, w, h = [float(v) for v in sa_box]
        r = np.round((img_coords[:, 0] - y) / h * (self.score_map_sz[0] - 1))
        c = np.round((img_coords[:, 1] - x) / w * (self.score_map_sz[1] - 1))
        return np.stack([np.clip(r, 0, self.score_map_sz[0] - 1),
                         np.clip(c, 0, self.score_map_sz[1] - 1)],
                        axis=1).astype(np.int64)

    def _tsm_to_img(self, tsm_coords, sa_box):
        x, y, w, h = [float(v) for v in sa_box]
        return np.stack([
            h * (tsm_coords[:, 0].astype(np.float32) / (self.score_map_sz[0] - 1)) + y,
            w * (tsm_coords[:, 1].astype(np.float32) / (self.score_map_sz[1] - 1)) + x,
        ], axis=1)

    # ---- modes ----

    def __call__(self, data: dict) -> dict:
        if data.get("sup_mode", "self_sup") == "self_sup":
            return self._self_sup(data)
        return self._partial_sup(data)

    def _self_sup(self, data: dict) -> dict:
        img = np.asarray(data["img"][0])
        tsm_coords = np.asarray(data["target_candidate_coords"][0])
        scores = np.asarray(data["target_candidate_scores"][0], np.float32)
        sa_box0 = np.asarray(data["search_area_box"][0], np.float32)
        sa_box1 = sa_box0.copy()
        if self.enable_search_area_aug:
            x, y, w, h = [int(v) for v in sa_box0]
            l = self.sa_jitter
            sa_box1 = np.array([x + np.random.randint(-w // l, w // l + 1),
                                y + np.random.randint(-h // l, h // l + 1),
                                w + np.random.randint(-w // l, w // l + 1),
                                h + np.random.randint(-h // l, h // l + 1)],
                               np.float32)
        crop0 = prutils.sample_target_from_crop_region(img, sa_box0, self.output_sz)
        crop1 = prutils.sample_target_from_crop_region(img, sa_box1, self.output_sz)
        if self.transform["train"] is not None:
            crop0 = np.asarray(self.transform["train"](image=[crop0])[0],
                               np.float32)
        if self.img_aug_transform is not None:
            crop1 = np.asarray(self.img_aug_transform(image=[crop1])[0],
                               np.float32)
        img_coords = self._tsm_to_img(tsm_coords, sa_box0)
        p0, p1, v0, v1 = self._candidate_drop_out(img_coords, img_coords.copy())
        p0, p1 = self._pad_with_fake_candidates([p0, p1], [v0, v1],
                                                [sa_box0, sa_box1], img.shape)
        s0 = self._fake_scores(scores, v0)
        s1 = self._augment_scores(self._fake_scores(scores, v1), v1)
        p1 = self._augment_coords(p1, v1)

        gt_assign = np.zeros((self.K, self.K), np.float32)
        gt_assign[np.arange(self.K), np.arange(self.K)] = v0 * v1
        gt_m0 = np.arange(self.K, dtype=np.float32)
        gt_m1 = np.arange(self.K, dtype=np.float32)
        gt_m0[(v0 == 0) | (v1 == 0)] = -1
        gt_m1[(v0 == 0) | (v1 == 0)] = -1

        return {
            "img_cropped0": np.asarray(crop0, np.float32),
            "img_cropped1": np.asarray(crop1, np.float32),
            "candidate_img_coords0": p0, "candidate_img_coords1": p1,
            "candidate_tsm_coords0": self._img_to_tsm(p0, sa_box0),
            # real candidates keep frame-0 search-area geometry; fakes were drawn
            # inside the augmented area (reference :1051-1063)
            "candidate_tsm_coords1": np.where(
                (v1 == 1)[:, None], self._img_to_tsm(p1, sa_box0),
                self._img_to_tsm(p1, sa_box1)),
            "candidate_scores0": s0, "candidate_scores1": s1,
            "candidate_valid0": v0, "candidate_valid1": v1,
            "img_shape0": np.asarray(img.shape[:2], np.int64),
            "img_shape1": np.asarray(img.shape[:2], np.int64),
            "gt_assignment": gt_assign, "gt_matches0": gt_m0, "gt_matches1": gt_m1,
        }

    def _partial_sup(self, data: dict) -> dict:
        imgs = [np.asarray(i) for i in data["img"]]
        sa = [np.asarray(b, np.float32) for b in data["search_area_box"]]
        tsm = [np.asarray(c) for c in data["target_candidate_coords"]]
        scores = [np.asarray(s, np.float32)
                  for s in data["target_candidate_scores"]]
        anno = [np.asarray(a) for a in data["target_anno_coord"]]

        crops = [prutils.sample_target_from_crop_region(im, b, self.output_sz)
                 for im, b in zip(imgs, sa)]
        if self.transform["train"] is not None:
            crops = [np.asarray(self.transform["train"](image=[c])[0],
                                np.float32) for c in crops]

        def gt_idx(coords, a):
            d = np.abs(coords - a[None]).sum(axis=1)
            return int(d.argmin())

        g0, g1 = gt_idx(tsm[0], anno[0]), gt_idx(tsm[1], anno[1])
        img_coords = [self._tsm_to_img(t, b) for t, b in zip(tsm, sa)]

        drop = np.random.rand() < 0.25
        frame_id = np.random.randint(2)
        pads, valids = [], []
        for k in range(2):
            pad = np.zeros((self.K, 2), np.float32)
            val = np.zeros(self.K, np.float32)
            n = min(len(img_coords[k]), self.K)
            pad[:n] = img_coords[k][:n]
            val[:n] = 1
            if drop and frame_id == k and (g0 if k == 0 else g1) < self.K:
                gi = g0 if k == 0 else g1
                pad[gi] = 0
                val[gi] = 0
            pads.append(pad)
            valids.append(val)
        pads = self._pad_with_fake_candidates(pads, valids, sa, imgs[0].shape)
        s_pad = [self._fake_scores(s, v) for s, v in zip(scores, valids)]

        gt_assign = np.zeros((self.K, self.K), np.float32)
        gt_m0 = np.full(self.K, -2, np.float32)
        gt_m1 = np.full(self.K, -2, np.float32)
        if g0 < self.K and g1 < self.K:
            gt_assign[g0, g1] = valids[0][g0] * valids[1][g1]
            if drop and frame_id == 0:
                gt_m1[g1] = -1
            elif drop and frame_id == 1:
                gt_m0[g0] = -1
            else:
                gt_m0[g0] = g1
                gt_m1[g1] = g0

        return {
            "img_cropped0": np.asarray(crops[0], np.float32),
            "img_cropped1": np.asarray(crops[1], np.float32),
            "candidate_img_coords0": pads[0], "candidate_img_coords1": pads[1],
            "candidate_tsm_coords0": self._img_to_tsm(pads[0], sa[0]),
            "candidate_tsm_coords1": self._img_to_tsm(pads[1], sa[1]),
            "candidate_scores0": s_pad[0], "candidate_scores1": s_pad[1],
            "candidate_valid0": valids[0], "candidate_valid1": valids[1],
            "img_shape0": np.asarray(imgs[0].shape[:2], np.int64),
            "img_shape1": np.asarray(imgs[1].shape[:2], np.int64),
            "gt_assignment": gt_assign, "gt_matches0": gt_m0, "gt_matches1": gt_m1,
        }


class TaMOsProcessing(ToMPProcessing):
    """Multi-object processing for TaMOs (reference processing.py:1749-1950
    TaMOsProcessing): annotations are per-frame {obj_id: box} dicts (from
    TaMOsDatasetSampler); all objects are cropped with ONE shared search region
    (anchored on a jittered reference object), and every object's Gaussian label /
    dense LTRB map lands in its id's slot of the K fixed object slots."""

    def __init__(self, *args, num_objects: int = 3, stride_high: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_objects = num_objects
        self.stride_high = stride_high

    def _crop_multi(self, images, annos, mode):
        """Crop each frame around a jittered anchor box; transform ALL object
        boxes into crop coords. annos: list of {obj_id: box}."""
        crops, out_annos = [], []
        crop_sz = np.array([self.output_sz, self.output_sz], np.float32)
        for im, a in zip(images, annos):
            anchor_id = min(a.keys())
            anchor = self._get_jittered_box(np.asarray(a[anchor_id], np.float32),
                                            mode)
            crop, rf = prutils.sample_target(np.asarray(im), anchor,
                                             self.search_area_factor,
                                             self.output_sz)
            crops.append(np.asarray(crop, np.float32))
            out_annos.append({k: prutils.transform_image_to_crop(
                np.asarray(b, np.float32), anchor, rf, crop_sz)
                for k, b in a.items()})
        return crops, out_annos

    def __call__(self, data: dict) -> dict:
        # normalize to dict annos ({0: box} for single-object datasets)
        for s in ("train", "test"):
            data[s + "_anno"] = [a if isinstance(a, dict)
                                 else {0: np.asarray(a, np.float32)}
                                 for a in data[s + "_anno"]]
        for s in ("train", "test"):
            crops, annos = self._crop_multi(data[s + "_images"],
                                            data[s + "_anno"], s)
            imgs, _ = self.transform[s](image=crops,
                                        bbox=[list(a.values())[0] for a in annos],
                                        joint=False)
            data[s + "_images"] = [np.asarray(c, np.float32) for c in imgs]
            data[s + "_anno"] = annos

        K = self.num_objects
        p = self.label_function_params or {}
        sz_lo = self.output_sz // p.get("stride", 16)
        sz_hi = self.output_sz // self.stride_high

        def make_label(box, feature_sz):
            return self._generate_label_function(
                np.asarray(box, np.float32)[None], feature_sz=feature_sz)[0]

        def slotify(a, feature_sz, stride, k_last):
            """One frame's {obj_id: box} -> K-slot labels/ltrb/sample-region."""
            lbl = np.zeros((K, feature_sz, feature_sz), np.float32)
            ltrb = np.zeros((K, feature_sz, feature_sz, 4), np.float32)
            region = np.zeros((K, feature_sz, feature_sz), np.float32)
            for oid, box in a.items():
                if oid >= K:
                    continue
                lbl[oid] = make_label(box, feature_sz)
                ltrb[oid] = _encode_ltrb(np.asarray(box, np.float32),
                                         self.output_sz, stride)
                x, y, w, h = [float(v) for v in box]
                cs = (np.arange(feature_sz) + 0.5) * stride
                region[oid] = (((cs[:, None] >= y) & (cs[:, None] <= y + h) &
                                (cs[None, :] >= x) & (cs[None, :] <= x + w))
                               .astype(np.float32))
            if k_last:
                return (lbl.transpose(1, 2, 0), ltrb.transpose(1, 2, 0, 3),
                        region.transpose(1, 2, 0))
            return lbl, ltrb, region

        # train side on the transformer grid, slot-first (K, h, w) / (K, h, w, 4)
        tr = [slotify(a, sz_lo, p.get("stride", 16), k_last=False)
              for a in data["train_anno"]]
        data["train_label"] = [t[0] for t in tr]
        data["train_ltrb_target"] = [t[1] for t in tr]

        # test side on the high-res FPN grid, slot-last
        te = [slotify(a, sz_hi, self.stride_high, k_last=True)
              for a in data["test_anno"]]
        data["test_label"] = [t[0] for t in te]
        data["test_ltrb_target"] = [t[1] for t in te]
        data["test_sample_region"] = [t[2] for t in te]
        return data
