"""Harness round-trip: synthetic dataset → dummy tracker → result files →
extract_results → score table."""

import os

import numpy as np
import pytest

from pytracking_tpu.evaluation.datasets import get_dataset
from pytracking_tpu.evaluation.running import run_dataset, run_sequence
from pytracking_tpu.analysis.extract_results import (calc_iou_overlap,
                                                     extract_results)
from pytracking_tpu.analysis.plot_results import get_scores, print_results


class OracleTracker:
    """Returns ground truth with small noise — end of pipeline sanity."""

    def __init__(self, seq, noise):
        self.seq = seq
        self.noise = noise
        self.t = 0

    def initialize(self, image, info):
        self.t = 0
        return {}

    def track(self, image, info=None):
        self.t += 1
        gt = np.asarray(self.seq.ground_truth_rect[self.t], float)
        return {"target_bbox": (gt + self.noise).tolist()}


class WrapperStub:
    """Mimics evaluation.tracker.Tracker for run_sequence."""

    def __init__(self, results_dir, seq, noise=0.0):
        self.name = "oracle"
        self.parameter_name = "default"
        self.run_id = None
        self.display_name = "oracle_default"
        self.results_dir = results_dir
        self.segmentation_dir = results_dir
        self._seq = seq
        self._noise = noise

    def create_tracker(self):
        return OracleTracker(self._seq, self._noise)


def test_synthetic_dataset_shapes():
    ds = get_dataset("synthetic")
    assert len(ds) == 3
    seq = ds[0]
    assert len(seq.frames) == 20
    assert seq.ground_truth_rect.shape == (20, 4)
    from pytracking_tpu.evaluation.running import _read_image
    im = _read_image(seq.frames[0])
    assert im.shape == (240, 320, 3)
    assert seq.init_info()["init_bbox"] is not None


def test_run_sequence_and_extract_results(tmp_path):
    os.environ["PYTRACKING_TPU_ROOT"] = str(tmp_path)
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None  # reset cache

    ds = get_dataset("synthetic")
    wrappers = []
    for seq in ds:
        w = WrapperStub(str(tmp_path / "tracking_results" / "oracle" / "default"),
                        seq, noise=2.0)
        run_sequence(seq, w, debug=0)
        wrappers.append(w)

    # result files exist, reference format: ints, tab-separated
    f0 = tmp_path / "tracking_results" / "oracle" / "default" / f"{ds[0].name}.txt"
    assert f0.is_file()
    arr = np.loadtxt(f0, delimiter="\t")
    assert arr.shape == (20, 4)

    scores = print_results([wrappers[0]], ds, report_name="test_report")
    # oracle with 2px noise on ~30px targets: AUC high
    assert scores["AUC"][0] > 70.0
    assert (tmp_path / "result_plots" / "test_report" / "eval_data.pkl").is_file()


def test_skip_if_done(tmp_path, capsys):
    os.environ["PYTRACKING_TPU_ROOT"] = str(tmp_path)
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None

    ds = get_dataset("synthetic")
    w = WrapperStub(str(tmp_path / "r"), ds[0])
    run_sequence(ds[0], w)
    out1 = capsys.readouterr().out
    assert "FPS" in out1
    run_sequence(ds[0], w)
    out2 = capsys.readouterr().out
    assert "skipping" in out2


def test_calc_iou_overlap():
    a = np.array([[0.0, 0.0, 10, 10]])
    b = np.array([[5.0, 0.0, 10, 10]])
    iou = calc_iou_overlap(a, b)
    assert 0.3 < iou[0] < 0.4  # ~5/15 with the -1/+1 convention


def test_create_tracker_vmap_multiobj_route(monkeypatch):
    """PYTRACKING_TPU_VMAP_MULTIOBJ=1 routes multiobj creation to the tracker's
    vmap class; default stays on MultiObjectWrapper."""
    from pytracking_tpu.evaluation.tracker import Tracker, TrackerSpec
    from pytracking_tpu.evaluation.multi_object_wrapper import MultiObjectWrapper

    class FakeVmapTracker:
        def __init__(self, params, net, variables):
            self.kind = "vmap"

    class FakeTracker:
        multiobj_mode = "parallel"
        vmap_multiobj_class = FakeVmapTracker

        def __init__(self, params, net, variables):
            self.kind = "single"

    t = Tracker.__new__(Tracker)
    t.tracker_class = FakeTracker
    t._spec = TrackerSpec(params=None, net=None, variables=None)

    monkeypatch.delenv("PYTRACKING_TPU_VMAP_MULTIOBJ", raising=False)
    assert isinstance(t.create_tracker(multiobj=True), MultiObjectWrapper)
    monkeypatch.setenv("PYTRACKING_TPU_VMAP_MULTIOBJ", "1")
    assert isinstance(t.create_tracker(multiobj=True), FakeVmapTracker)
    assert t.create_tracker(multiobj=False).kind == "single"


def test_per_attribute_scenario_table(tmp_path, capsys):
    """AVisT-style scenario breakdown: sequences carrying attribute codes are
    grouped into a per-scenario AUC table (reference
    notebooks/analyze_avist_results.ipynb + plot_results.py:588-624)."""
    os.environ["PYTRACKING_TPU_ROOT"] = str(tmp_path)
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None

    from pytracking_tpu.analysis.plot_results import print_per_attribute_results

    ds = get_dataset("synthetic")
    # attach AVisT-style scenario codes to the synthetic sequences
    codes = [["R", "FO"], ["R"], ["LL"]]
    for seq, att in zip(ds, codes):
        seq.attributes = att

    wrappers = []
    for seq in ds:
        w = WrapperStub(str(tmp_path / "tracking_results" / "oracle" / "default"),
                        seq, noise=2.0)
        run_sequence(seq, w, debug=0)
        wrappers.append(w)

    capsys.readouterr()
    table = print_per_attribute_results(
        [wrappers[0]], ds, report_name="attr_report",
        attribute_specs={"R": "Rain", "FO": "Fog", "LL": "Low-light"})
    out = capsys.readouterr().out
    assert set(table) == {"R", "FO", "LL"}
    assert "Rain" in out and "Low-light" in out
    # oracle tracker: every scenario AUC is high
    for row in table.values():
        assert row["oracle_default"] > 70.0


def test_avist_scenario_spec_loads():
    from pytracking_tpu.evaluation.adapters.avist import load_scenarios
    sc = load_scenarios()
    assert len(sc["att_name_short"]) == len(sc["att_name_long"]) == 18
    # every sequence entry uses known short codes
    known = set(sc["att_name_short"])
    seq_entries = {k: v for k, v in sc.items() if not k.startswith("att_")}
    assert len(seq_entries) > 100
    for v in seq_entries.values():
        assert set(v) <= known
