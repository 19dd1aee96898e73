"""VOT/TraX protocol adapter.

Re-design of reference `pytracking/evaluation/vot.py` (VOT:24) and `vot2020.py`
(VOT:30, make_full_size:23): a thin client over the `trax` package (the official VOT
toolkit protocol). The toolkit launches the tracker process and communicates
region/image paths over the TraX socket; this wrapper exposes the same
`VOT(region_format).region()/report()/frame()` API the reference trackers use.

The `trax` package ships with the VOT toolkit; it is imported lazily so the rest of the
framework has no dependency on it.
"""

from __future__ import annotations

import collections
from typing import Optional

import numpy as np

Rectangle = collections.namedtuple("Rectangle", ["x", "y", "width", "height"])
Point = collections.namedtuple("Point", ["x", "y"])
Polygon = collections.namedtuple("Polygon", ["points"])


def make_full_size(x: np.ndarray, output_sz) -> np.ndarray:
    """Zero-pad a mask to the full image size (reference vot2020.py:23-35).
    output_sz: (width, height)."""
    if x.shape[0] == output_sz[1] and x.shape[1] == output_sz[0]:
        return x
    pad_x = output_sz[0] - x.shape[1]
    pad_y = output_sz[1] - x.shape[0]
    return np.pad(x, ((0, max(pad_y, 0)), (0, max(pad_x, 0))))[:output_sz[1],
                                                               :output_sz[0]]


class VOT:
    """TraX protocol client (reference vot.py:24-112, vot2020.py:38-143)."""

    def __init__(self, region_format: str, channels=None):
        import trax

        assert region_format in (trax.Region.RECTANGLE, trax.Region.POLYGON,
                                 trax.Region.MASK)
        if channels is None:
            channels = ["color"]
        elif channels == "rgbd":
            channels = ["color", "depth"]
        elif channels == "rgbt":
            channels = ["color", "ir"]

        self._trax = trax.Server([region_format], [trax.Image.PATH], channels)
        request = self._trax.wait()
        assert request.type == "initialize"

        self._region = self._convert_region_in(request.region)
        self._image = {k: v.path() for k, v in request.image.items()}
        if len(self._image) == 1:
            self._image = next(iter(self._image.values()))
        self._trax.status(request.region)

    def _convert_region_in(self, region):
        import trax

        if isinstance(region, trax.Polygon):
            return Polygon([Point(x[0], x[1]) for x in region])
        if isinstance(region, trax.Mask):
            return region.array(True)
        return Rectangle(*region.bounds())

    def region(self):
        return self._region

    def report(self, region, confidence: Optional[float] = None):
        import trax

        if isinstance(region, Polygon):
            tregion = trax.Polygon.create([(p.x, p.y) for p in region.points])
        elif isinstance(region, np.ndarray):
            tregion = trax.Mask.create(region)
        else:
            tregion = trax.Rectangle.create(region.x, region.y, region.width,
                                            region.height)
        properties = {}
        if confidence is not None:
            properties["confidence"] = confidence
        self._trax.status(tregion, properties)

    def frame(self):
        if hasattr(self, "_image"):
            image = self._image
            del self._image
            return image
        request = self._trax.wait()
        if request.type == "frame":
            image = {k: v.path() for k, v in request.image.items()}
            if len(image) == 1:
                image = next(iter(image.values()))
            return image
        return None

    def quit(self):
        if hasattr(self, "_trax"):
            self._trax.quit()

    def __del__(self):
        self.quit()


def run_vot2020(tracker_name: str, tracker_param: str, run_id=None):
    """VOT2020 mask-protocol entry (reference tracker.py:464-554)."""
    import cv2

    from pytracking_tpu.evaluation.tracker import Tracker

    handle = VOT("mask")
    selection = handle.region()
    imagefile = handle.frame()
    if not imagefile:
        return
    image = cv2.cvtColor(cv2.imread(imagefile), cv2.COLOR_BGR2RGB)
    mask = make_full_size(selection, (image.shape[1], image.shape[0]))
    ys, xs = np.nonzero(mask)
    bbox = [float(xs.min()), float(ys.min()),
            float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)]

    tracker = Tracker(tracker_name, tracker_param, run_id).create_tracker()
    tracker.initialize(image, {"init_bbox": bbox, "init_mask": mask,
                               "object_ids": ["1"]})

    while True:
        imagefile = handle.frame()
        if not imagefile:
            break
        image = cv2.cvtColor(cv2.imread(imagefile), cv2.COLOR_BGR2RGB)
        out = tracker.track(image)
        if "segmentation" in out:
            handle.report(np.asarray(out["segmentation"], np.uint8))
        else:
            b = out["target_bbox"]
            handle.report(Rectangle(b[0], b[1], b[2], b[3]),
                          out.get("object_presence_score"))


def run_vot(tracker_name: str, tracker_param: str, run_id=None):
    """Legacy polygon protocol (reference tracker.py:556-624)."""
    import cv2

    from pytracking_tpu.evaluation.tracker import Tracker
    from pytracking_tpu.utils.convert_vot_anno import convert_vot_anno_to_rect

    handle = VOT("polygon")
    vot_anno = handle.region()
    vot_anno = [[p.x, p.y] for p in vot_anno.points]

    tracker_wrapper = Tracker(tracker_name, tracker_param, run_id)
    spec = tracker_wrapper.get_parameters()
    conv_type = getattr(spec.params, "vot_anno_conversion_type", "preserve_area")
    bbox = convert_vot_anno_to_rect(np.array(vot_anno).flatten(), conv_type)

    imagefile = handle.frame()
    if not imagefile:
        return
    image = cv2.cvtColor(cv2.imread(imagefile), cv2.COLOR_BGR2RGB)
    tracker = tracker_wrapper.create_tracker()
    tracker.initialize(image, {"init_bbox": list(bbox)})

    while True:
        imagefile = handle.frame()
        if not imagefile:
            break
        image = cv2.cvtColor(cv2.imread(imagefile), cv2.COLOR_BGR2RGB)
        out = tracker.track(image)
        b = out["target_bbox"]
        handle.report(Rectangle(b[0], b[1], b[2], b[3]))
