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

    def run_video_generic(self, videofilepath: Optional[str] = None,
                          optional_box=None, debug: int = 0, visdom_info=None,
                          save_results: bool = False, frame_source=None,
                          event_source=None, display: Optional[bool] = None,
                          camera_id: int = 0):
        """Interactive MULTI-object video/webcam loop (reference
        tracker.py:260-446 run_video_generic): mouse-drawn boxes add new objects
        at ANY frame through MultiObjectWrapper; already-tracked objects keep
        tracking while new ones initialize on their draw frame.

        Headless/scripted mode (tests, batch): pass `frame_source` (an iterable
        of RGB uint8 frames) and/or `event_source`, a callable
        `event_source(frame_number) -> list[event]` with events
          ("add_box", [x, y, w, h])  — same as finishing a mouse-drawn rectangle
          ("reset",)                 — same as pressing 'r'
          ("quit",)                  — same as pressing 'q'
        When `event_source` is given the cv2 UI is skipped entirely.

        Returns {obj_id: [xywh per frame since that object's init]}.
        """
        from collections import OrderedDict

        self._init_visdom(visdom_info, debug)
        tracker = self.create_tracker(multiobj=True)

        interactive = event_source is None and (display is None or display)
        cv2 = None
        cap = None
        ui = None
        display_name = f"Display: {self.name}"
        if frame_source is None or interactive:
            import cv2  # noqa: F811  (real UI / video decode path)
        if frame_source is None:
            cap = cv2.VideoCapture(videofilepath if videofilepath is not None
                                   else camera_id)

            def _frames():
                while True:
                    ok, f = cap.read()
                    if not ok or f is None:
                        return
                    yield cv2.cvtColor(f, cv2.COLOR_BGR2RGB)

            frame_source = _frames()
        if interactive:
            ui = _UIControl()
            cv2.namedWindow(display_name,
                            cv2.WINDOW_NORMAL | cv2.WINDOW_KEEPRATIO)
            cv2.resizeWindow(display_name, 960, 720)
            cv2.setMouseCallback(display_name, ui.mouse_callback)

        next_object_id = 1
        sequence_object_ids: list = []
        prev_output = OrderedDict()
        output_boxes: "OrderedDict[str, list]" = OrderedDict()
        frame_number = 0
        quit_requested = False

        for frame in frame_source:
            frame_number += 1
            new_boxes = []
            do_reset = False

            if event_source is not None:
                for ev in event_source(frame_number) or []:
                    if ev[0] == "add_box":
                        new_boxes.append(list(map(float, ev[1])))
                    elif ev[0] == "reset":
                        do_reset = True
                    elif ev[0] == "quit":
                        quit_requested = True
            elif ui is not None and ui.new_init:
                ui.new_init = False
                new_boxes.append(ui.get_bb())

            if frame_number == 1 and optional_box is not None:
                new_boxes.insert(0, list(map(float, optional_box)))

            if do_reset:
                next_object_id = 1
                sequence_object_ids = []
                prev_output = OrderedDict()
                tracker.initialize(frame, {"object_ids": [],
                                           "init_object_ids": [],
                                           "init_bbox": OrderedDict()})

            info = OrderedDict()
            info["previous_output"] = prev_output
            if new_boxes:
                ids = [str(next_object_id + i) for i in range(len(new_boxes))]
                next_object_id += len(new_boxes)
                info["init_object_ids"] = ids
                info["init_bbox"] = OrderedDict(zip(ids, new_boxes))
                for oid, b in zip(ids, new_boxes):
                    output_boxes[oid] = [b]
                if not sequence_object_ids:
                    # first object(s): initialize() instead of track()
                    # (reference :349-359 via optional_box / first draw)
                    out = tracker.initialize(
                        frame, {"init_bbox": info["init_bbox"],
                                "init_object_ids": ids, "object_ids": ids,
                                "sequence_object_ids": ids}) or {}
                    prev_output = OrderedDict(out)
                    sequence_object_ids.extend(ids)
                    if interactive:
                        self._display_generic(cv2, display_name, frame, out, ui)
                    continue
                sequence_object_ids.extend(ids)

            if sequence_object_ids:
                info["sequence_object_ids"] = list(sequence_object_ids)
                info["object_ids"] = list(sequence_object_ids)
                out = tracker.track(frame, info)
                prev_output = OrderedDict(out)
                for oid, bb in out.get("target_bbox", {}).items():
                    output_boxes.setdefault(oid, []).append(
                        [float(v) for v in bb])
            else:
                out = {}

            if interactive:
                key = self._display_generic(cv2, display_name, frame, out, ui)
                if key == ord("q"):
                    quit_requested = True
                elif key == ord("r"):
                    next_object_id = 1
                    sequence_object_ids = []
                    prev_output = OrderedDict()
                    tracker.initialize(frame, {"object_ids": [],
                                               "init_object_ids": [],
                                               "init_bbox": OrderedDict()})
            if quit_requested:
                break

        if cap is not None:
            cap.release()
        if interactive:
            cv2.destroyAllWindows()
        if save_results and videofilepath is not None:
            import numpy as np
            base = os.path.splitext(videofilepath)[0]
            for oid, boxes in output_boxes.items():
                np.savetxt(f"{base}_{oid}.txt", np.asarray(boxes, float),
                           delimiter="\t", fmt="%d")
        return output_boxes

    @staticmethod
    def _display_generic(cv2, display_name, frame_rgb, out, ui):
        """Draw boxes/selection and pump the UI; returns the pressed key."""
        disp = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR)
        if ui is not None and ui.mode == "select":
            cv2.rectangle(disp, ui.get_tl(), ui.get_br(), (255, 0, 0), 2)
        for oid, bb in (out or {}).get("target_bbox", {}).items():
            x, y, w, h = [int(v) for v in bb]
            color = _DISP_COLORS[int(oid) % len(_DISP_COLORS)]
            cv2.rectangle(disp, (x, y), (x + w, y + h), color, 3)
            cv2.putText(disp, str(oid), (x, y - 5),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
        cv2.putText(disp, "Select target(s). 'r' reset | 'q' quit", (10, 25),
                    cv2.FONT_HERSHEY_COMPLEX_SMALL, 1, (255, 255, 255), 2)
        cv2.imshow(display_name, disp)
        return cv2.waitKey(1)


_DISP_COLORS = [(39, 127, 255), (0, 255, 0), (0, 0, 255), (255, 0, 0),
                (255, 255, 0), (255, 0, 255), (0, 255, 255), (128, 128, 128)]


class _UIControl:
    """Mouse-rectangle state machine (reference tracker.py:289-319)."""

    def __init__(self):
        self.mode = "init"      # init | select
        self.target_tl = (-1, -1)
        self.target_br = (-1, -1)
        self.new_init = False

    def mouse_callback(self, event, x, y, flags, param):
        import cv2
        if event == cv2.EVENT_LBUTTONDOWN and self.mode == "init":
            self.target_tl = (x, y)
            self.target_br = (x, y)
            self.mode = "select"
        elif event == cv2.EVENT_MOUSEMOVE and self.mode == "select":
            self.target_br = (x, y)
        elif event == cv2.EVENT_LBUTTONDOWN and self.mode == "select":
            self.target_br = (x, y)
            self.mode = "init"
            self.new_init = True

    def get_tl(self):
        return self.target_tl if self.target_tl[0] < self.target_br[0] \
            else self.target_br

    def get_br(self):
        return self.target_br if self.target_tl[0] < self.target_br[0] \
            else self.target_tl

    def get_bb(self):
        tl, br = self.get_tl(), self.get_br()
        return [min(tl[0], br[0]), min(tl[1], br[1]),
                abs(br[0] - tl[0]), abs(br[1] - tl[1])]
