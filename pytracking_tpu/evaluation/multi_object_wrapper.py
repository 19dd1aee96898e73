"""Multi-object tracking wrapper: run one single-object tracker per target.

Re-design of reference `pytracking/evaluation/multi_object_wrapper.py`
(MultiObjectWrapper:7): objects can be initialized at any frame; outputs are merged
per-frame into {obj_id: value} dicts, with soft-mask argmax merging for segmentation
trackers (default_merge:64) or a tracker-provided `merge_results` hook.

TPU note: each object's tracker holds its own jitted state; all instances share the
same compiled functions (same static config), so N objects cost N executions of the
same XLA program. A vmapped object axis is the next optimization step for the natively
multi-object trackers (TaMOs handles that case inside the model itself).
"""

from __future__ import annotations

import copy
from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np


class MultiObjectWrapper:
    multiobj_mode = "parallel"

    def __init__(self, base_tracker_class, params, net=None, variables=None,
                 fast_load: bool = False):
        self.base_tracker_class = base_tracker_class
        self.params = params
        self.net = net
        self.variables = variables
        self.trackers: "OrderedDict[Any, Any]" = OrderedDict()
        self.initialized_ids: list = []
        self._frame_num = 0

    def _create(self):
        return self.base_tracker_class(self.params, self.net, self.variables)

    def _split_info(self, info: dict) -> Dict[Any, dict]:
        """Per-object init info (reference multi_object_wrapper.py:37-61)."""
        info_split = {}
        for obj_id in info.get("object_ids", []):
            d = {"object_ids": [obj_id]}
            for k in ("init_bbox", "init_mask"):
                v = info.get(k)
                if v is None:
                    continue
                if isinstance(v, dict):
                    if obj_id in v:
                        d[k] = v[obj_id]
                elif k == "init_mask":
                    d[k] = (np.asarray(v) == int(obj_id)).astype(np.uint8)
                else:
                    d[k] = v
            info_split[obj_id] = d
        return info_split

    def initialize(self, image, info: dict) -> Optional[dict]:
        self._frame_num = 1
        self.trackers = OrderedDict()
        self.initialized_ids = []
        info = dict(info)
        init_ids = info.get("init_object_ids")
        if init_ids is not None and len(init_ids) == 0:
            # empty (re-)init: clear state, nothing to track yet (reference
            # multi_object_wrapper.py:104-105, driven by run_video_generic reset)
            return None
        object_ids = list(info.get("object_ids") or init_ids or ["1"])
        init_ids = list(init_ids) if init_ids is not None else list(object_ids)
        info.setdefault("object_ids", object_ids)
        per_obj = self._split_info({**info, "object_ids": init_ids})
        init_outs = OrderedDict()
        for obj_id in init_ids:
            t = self._create()
            out = t.initialize(image, per_obj[obj_id]) or {}
            if per_obj[obj_id].get("init_bbox") is not None:
                out.setdefault("target_bbox", per_obj[obj_id]["init_bbox"])
            self.trackers[obj_id] = t
            init_outs[obj_id] = out
        self.initialized_ids = list(init_ids)
        if any(init_outs.values()):
            return self._merge(init_outs, image.shape[:2])
        return {}

    def track(self, image, info: Optional[dict] = None) -> dict:
        self._frame_num += 1
        info = dict(info or {})

        # new objects this frame: explicit init_object_ids (reference protocol,
        # multi_object_wrapper.py:141-176) or unseen ids in object_ids (dataset
        # adapters that list every live object per frame)
        new_ids = list(info.get("init_object_ids") or [])
        if not new_ids:
            new_ids = [oid for oid in info.get("object_ids", [])
                       if oid not in self.trackers]

        obj_info = {k: v for k, v in info.items()
                    if k not in ("object_ids", "init_object_ids", "init_bbox",
                                 "init_mask", "sequence_object_ids")}
        # track the already-initialized objects FIRST (reference :147-155) — a
        # freshly added object is initialized on this frame, not tracked on it
        outputs = OrderedDict((oid, self.trackers[oid].track(image, obj_info))
                              for oid in self.initialized_ids)

        if new_ids:
            per_obj = self._split_info({**info, "object_ids": new_ids})
            prev_output = info.get("previous_output", OrderedDict())
            for oid in new_ids:
                t = self.trackers.get(oid) or self._create()
                obj_init = dict(per_obj[oid])
                obj_init["previous_output"] = prev_output
                out = t.initialize(image, obj_init) or {}
                if per_obj[oid].get("init_bbox") is not None:
                    out.setdefault("target_bbox", per_obj[oid]["init_bbox"])
                self.trackers[oid] = t
                outputs[oid] = out
            self.initialized_ids.extend(new_ids)
        return self._merge(outputs, image.shape[:2])

    def _merge(self, outputs: Dict[Any, dict], im_shape) -> dict:
        """Merge per-object outputs: tracker-custom `merge_results` hook if present
        (reference multi_object_wrapper.py:96-101), else the default soft-mask argmax
        merge (:64-92)."""
        first = next(iter(self.trackers.values()), None)
        if first is not None and hasattr(first, "merge_results"):
            return first.merge_results(outputs)
        merged: dict = {"target_bbox": {}, "object_presence_score": {}}
        seg_scores = {}
        for oid, out in outputs.items():
            if "target_bbox" in out:
                merged["target_bbox"][oid] = out["target_bbox"]
            if "object_presence_score" in out:
                merged["object_presence_score"][oid] = out["object_presence_score"]
            # soft masks when the tracker emits them, else the binary mask
            # (reference default_merge:74)
            seg = out.get("segmentation_soft", out.get("segmentation"))
            if seg is not None:
                seg_scores[oid] = np.asarray(seg, np.float32)
        if not merged["object_presence_score"]:
            merged.pop("object_presence_score")
        if seg_scores:
            ids = list(seg_scores)
            stack = np.stack([seg_scores[i] for i in ids])      # (N, H, W)
            thr = getattr(self.params, "segmentation_threshold", 0.5)
            obj_ids = np.array([0] + [int(i) for i in ids], np.uint8)
            merged["segmentation"] = obj_ids[
                np.where(stack.max(axis=0) > thr, stack.argmax(axis=0) + 1, 0)]
        return merged
