"""Tracker wrapper: loads tracker class + parameters by name, manages result paths,
runs sequences/videos.

Re-design of reference `pytracking/evaluation/tracker.py` (Tracker:37): the same
registry-by-import-path pattern — `pytracking_tpu.parameter.<name>.<param>` must expose
`parameters()` returning a `TrackerSpec` (static params + net constructor + variables),
and `pytracking_tpu.trackers.<name>` exposes the tracker class via
`get_tracker_class()`.
"""

from __future__ import annotations

import importlib
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, List, Optional

import numpy as np

from pytracking_tpu.evaluation.environment import env_settings


@dataclass
class TrackerSpec:
    """What a parameter file produces: the static tracker params plus the model."""
    params: Any
    net: Any = None
    variables: Any = None
    tracker_kwargs: dict = None


class Tracker:
    """Wraps a tracker name + parameter name (reference tracker.py:37-105)."""

    def __init__(self, name: str, parameter_name: str, run_id: Optional[int] = None,
                 display_name: Optional[str] = None):
        self.name = name
        self.parameter_name = parameter_name
        self.run_id = run_id
        self.display_name = display_name

        env = env_settings()
        if self.run_id is None:
            self.results_dir = os.path.join(env.results_path, name, parameter_name)
        else:
            self.results_dir = os.path.join(env.results_path, name,
                                            f"{parameter_name}_{run_id:03d}")
        self.segmentation_dir = os.path.join(env.segmentation_path, name, parameter_name)

        tracker_module = importlib.import_module(f"pytracking_tpu.trackers.{name}")
        self.tracker_class = tracker_module.get_tracker_class()
        self._spec = None
        self.visdom = None
        self.pause_mode = False
        self.step = False

    # -------------------------------------------------------------- live debug

    def _init_visdom(self, visdom_info, debug: int):
        """Interactive debug UI (reference tracker.py:72-98): a visdom connection
        with pause/step keyboard control on the 'Tracking' window — space toggles
        pause, right-arrow single-steps while paused."""
        from pytracking_tpu.utils.visdom import Visdom

        visdom_info = visdom_info or {}
        self.pause_mode = False
        self.step = False
        if debug > 0 or visdom_info.get("use_visdom", True):
            try:
                self.visdom = Visdom(debug,
                                     {"handler": self._visdom_ui_handler,
                                      "win_id": "Tracking"},
                                     visdom_info=visdom_info)
                help_text = ("You can pause/unpause the tracker by pressing "
                             "'space' with the 'Tracking' window selected. "
                             "During paused mode, you can track for one frame "
                             "by pressing the right arrow key. To enable/"
                             "disable plotting of a data block, tick/untick "
                             "the corresponding entry in 'Block List'.")
                self.visdom.register(help_text, "text", 1, "Help")
            except Exception:
                self.visdom = None

    def _visdom_ui_handler(self, data):
        if data.get("event_type") == "KeyPress":
            if data.get("key") == " ":
                self.pause_mode = not self.pause_mode
            elif data.get("key") == "ArrowRight" and self.pause_mode:
                self.step = True

    def wait_if_paused(self):
        """Block while the user has paused tracking (reference
        tracker.py:214-222)."""
        while True:
            if not self.pause_mode:
                return
            if self.step:
                self.step = False
                return
            time.sleep(0.1)

    def get_parameters(self) -> TrackerSpec:
        if self._spec is None:
            param_module = importlib.import_module(
                f"pytracking_tpu.parameter.{self.name}.{self.parameter_name}")
            self._spec = param_module.parameters()
        return self._spec

    def create_tracker(self, multiobj: bool = False):
        import os

        spec = self.get_parameters()
        kwargs = spec.tracker_kwargs or {}
        if multiobj and getattr(self.tracker_class, "multiobj_mode", "parallel") \
                == "parallel":
            # opt-in device-native multi-object path: one vmapped jitted step over
            # the object axis (e.g. LWLMultiObjectTracker) — much faster on TPU,
            # but requires all objects initialized in the first frame
            vm_cls = getattr(self.tracker_class, "vmap_multiobj_class", None)
            if vm_cls is not None and \
                    os.environ.get("PYTRACKING_TPU_VMAP_MULTIOBJ", "0") == "1":
                return vm_cls(spec.params, spec.net, spec.variables)
            from pytracking_tpu.evaluation.multi_object_wrapper import \
                MultiObjectWrapper
            return MultiObjectWrapper(self.tracker_class, spec.params, spec.net,
                                      spec.variables)
        return self.tracker_class(spec.params, spec.net, spec.variables, **kwargs)

    # ------------------------------------------------------------------ video/webcam

    def run_video(self, videofilepath: str, optional_box=None, debug: int = 0):
        """Interactive/video-file tracking (reference tracker.py:260-446). Draws the
        output box on each frame with OpenCV; if no box given, asks for a selection."""
        import cv2

        tracker = self.create_tracker()
        cap = cv2.VideoCapture(videofilepath)
        success, frame = cap.read()
        if not success:
            raise IOError(f"Cannot read {videofilepath}")
        frame_rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if optional_box is None:
            optional_box = cv2.selectROI("select", frame, False)
        tracker.initialize(frame_rgb, {"init_bbox": list(optional_box)})

        results = [list(optional_box)]
        while True:
            success, frame = cap.read()
            if not success:
                break
            out = tracker.track(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            results.append(out["target_bbox"])
        cap.release()
        return results
