"""Interactive multi-object video loop (reference tracker.py:260-446
run_video_generic), driven headlessly with scripted events: objects added by
"mouse-drawn" boxes at ANY frame flow through MultiObjectWrapper — existing
objects keep tracking while the new one initializes on its draw frame."""

import numpy as np

from pytracking_tpu.evaluation.tracker import Tracker, TrackerSpec, _UIControl


class StepTracker:
    """Deterministic fake single-object tracker: box drifts +2px/frame in x."""

    multiobj_mode = "parallel"

    def __init__(self, params=None, net=None, variables=None):
        self.box = None

    def initialize(self, image, info):
        self.box = list(map(float, info["init_bbox"]))
        return {}

    def track(self, image, info=None):
        self.box = [self.box[0] + 2.0, self.box[1], self.box[2], self.box[3]]
        return {"target_bbox": list(self.box)}


def _make_wrapper():
    t = Tracker.__new__(Tracker)
    t.name = "steptracker"
    t.parameter_name = "default"
    t.run_id = None
    t.display_name = "steptracker"
    t.tracker_class = StepTracker
    t._spec = TrackerSpec(params=None)
    t.visdom = None
    t.pause_mode = False
    t.step = False
    return t


def _frames(n, h=48, w=64):
    return [np.full((h, w, 3), i, np.uint8) for i in range(n)]


def test_add_second_object_mid_sequence():
    wrapper = _make_wrapper()

    events = {3: [("add_box", [30, 10, 8, 8])], 6: [("quit",)]}
    out = wrapper.run_video_generic(
        optional_box=[10, 10, 8, 8],
        frame_source=iter(_frames(10)),
        event_source=lambda fn: events.get(fn, []))

    assert set(out.keys()) == {"1", "2"}
    # object 1: init box at frame 1, tracked frames 2..6
    assert len(out["1"]) == 6
    np.testing.assert_allclose(out["1"][0], [10, 10, 8, 8])
    np.testing.assert_allclose(out["1"][-1], [20, 10, 8, 8])  # 5 steps of +2
    # object 2: drawn at frame 3 (recorded once by the UI and once as the init
    # output, mirroring the reference's double-append), tracked frames 4..6
    assert len(out["2"]) == 5
    np.testing.assert_allclose(out["2"][0], [30, 10, 8, 8])
    np.testing.assert_allclose(out["2"][1], [30, 10, 8, 8])
    np.testing.assert_allclose(out["2"][-1], [36, 10, 8, 8])  # 3 steps of +2
    # while object 2 initialized at frame 3, object 1 still TRACKED that frame
    np.testing.assert_allclose(out["1"][2], [14, 10, 8, 8])


def test_reset_clears_objects():
    wrapper = _make_wrapper()
    events = {2: [("add_box", [5, 5, 6, 6])],
              4: [("reset",)],
              5: [("add_box", [20, 20, 6, 6])],
              7: [("quit",)]}
    out = wrapper.run_video_generic(
        frame_source=iter(_frames(10)),
        event_source=lambda fn: events.get(fn, []))
    # after reset, ids restart at 1 and the new object overwrites the record
    assert "1" in out
    np.testing.assert_allclose(out["1"][0], [20, 20, 6, 6])
    # frames 6,7 tracked after the frame-5 init
    assert len(out["1"]) == 3


def test_ui_control_box_normalization():
    ui = _UIControl()
    ui.target_tl = (50, 40)
    ui.target_br = (10, 90)
    assert ui.get_bb() == [10, 40, 40, 50]


def test_multiobjectwrapper_empty_reinit_returns_none():
    from pytracking_tpu.evaluation.multi_object_wrapper import MultiObjectWrapper

    w = MultiObjectWrapper(StepTracker, params=None)
    im = np.zeros((8, 8, 3), np.uint8)
    assert w.initialize(im, {"object_ids": [], "init_object_ids": [],
                             "init_bbox": {}}) is None
    assert w.initialized_ids == []
    # objects can then be added through track()
    out = w.track(im, {"init_object_ids": ["1"],
                       "init_bbox": {"1": [1, 1, 4, 4]}})
    assert "1" in out["target_bbox"]
