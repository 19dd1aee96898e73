"""Small surfaces: VOT mask padding, net-wrapper preprocessing, headless playback
(reference vot.py make_full_size, features/net_wrappers.py:56-68,
analysis/playback_results.py)."""

import os

import numpy as np
import pytest


def test_make_full_size_pads_and_crops():
    from pytracking_tpu.evaluation.vot import make_full_size

    m = np.ones((4, 6), np.uint8)
    out = make_full_size(m, (10, 8))     # output_sz (W, H)
    assert out.shape == (8, 10)
    assert out[:4, :6].sum() == 24 and out.sum() == 24
    # larger than target -> cropped
    out2 = make_full_size(np.ones((8, 10), np.uint8), (6, 4))
    assert out2.shape == (4, 6)


def test_net_with_backbone_preprocess():
    from pytracking_tpu.features.net_wrappers import NetWithBackbone

    w = NetWithBackbone.__new__(NetWithBackbone)
    import jax.numpy as jnp
    w.image_format = "bgr"
    w._mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(1, 1, 1, -1)
    w._std = jnp.asarray([0.229, 0.224, 0.225]).reshape(1, 1, 1, -1)
    im = np.zeros((1, 4, 4, 3), np.float32)
    im[..., 0] = 255.0                       # blue channel (BGR input)
    out = np.asarray(w.preprocess_image(im))
    # BGR -> RGB flip puts the 255 into the LAST channel before normalization
    assert abs(out[0, 0, 0, 2] - (1.0 - 0.406) / 0.225) < 1e-5
    assert abs(out[0, 0, 0, 0] - (0.0 - 0.485) / 0.229) < 1e-5


def test_playback_results_headless(tmp_path):
    cv2 = pytest.importorskip("cv2")

    from pytracking_tpu.analysis.playback_results import playback_results
    from pytracking_tpu.evaluation.adapters.synthetic import SyntheticDataset

    os.environ["PYTRACKING_TPU_ROOT"] = str(tmp_path)
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None

    ds = SyntheticDataset(num_sequences=1, num_frames=5).get_sequence_list()
    seq = ds[0]

    class FakeTracker:
        name, parameter_name = "fake", "p"
        results_dir = str(tmp_path)

    np.savetxt(os.path.join(str(tmp_path), f"{seq.name}.txt"),
               np.tile([10, 10, 20, 20], (5, 1)), delimiter="\t", fmt="%d")
    out = str(tmp_path / "play.mp4")
    playback_results([FakeTracker()], seq, output_path=out)
    assert os.path.getsize(out) > 1000
    envmod._env_settings = None


def test_visdom_headless_panes(tmp_path):
    """All reference pane modes render through the headless dump backend
    (featmap, cost_volume(+ui), bbreg, Tracking, lineplot, info_dict)."""
    import numpy as np

    from pytracking_tpu.utils.visdom import Visdom

    v = Visdom(debug=3, visdom_info={"server": "127.0.0.1", "port": 1},
               dump_dir=str(tmp_path))
    assert v._vis is None   # no server: dump backend
    im = np.random.rand(64, 64, 3).astype(np.float32) * 255
    fm = np.random.rand(8, 16, 16).astype(np.float32)
    cv = np.random.rand(36, 6, 6).astype(np.float32)
    for i in range(20):     # dumps fire every 20 registers
        v.register(im, "image", 1, "im")
        v.register((im, [10, 10, 20, 20]), "Tracking", 1, "Tracking")
        v.register(fm, "featmap", 1, "feat")
        v.register(cv, "cost_volume", 1, "cv")
        v.register((im, (6, 6)), "cost_volume_ui", 1, "cv_ui")
        v.register((im, np.ones((2, 4)) * 12, np.ones((2, 4)) * 14), "bbreg",
                   1, "bbreg")
        v.register(np.arange(5.0), "lineplot", 1, "lp")
        v.register({"a": 1}, "info_dict", 1, "info")
    files = list(tmp_path.iterdir())
    kinds = {f.name.split("_")[0] for f in files}
    assert {"im", "feat", "cv", "bbreg", "lp", "info"} <= kinds, files


def test_tracker_pause_step_handler():
    from pytracking_tpu.evaluation.tracker import Tracker

    trk = Tracker("dimp", "dimp50")
    assert trk.pause_mode is False
    trk._visdom_ui_handler({"event_type": "KeyPress", "key": " "})
    assert trk.pause_mode is True
    trk._visdom_ui_handler({"event_type": "KeyPress", "key": "ArrowRight"})
    assert trk.step is True
    trk.wait_if_paused()          # consumes the step without blocking
    assert trk.step is False
    trk._visdom_ui_handler({"event_type": "KeyPress", "key": " "})
    assert trk.pause_mode is False
    trk.wait_if_paused()          # returns immediately when not paused


def test_maybe_bf16_variables_casts_only_f32(monkeypatch):
    import jax.numpy as jnp

    from pytracking_tpu.utils.loading import maybe_bf16_variables

    tree = {"params": {"w": jnp.ones((2, 2), jnp.float32)},
            "batch_stats": {"mean": jnp.zeros((2,), jnp.float32)},
            "counter": jnp.asarray(3, jnp.int32)}
    monkeypatch.delenv("PYTRACKING_TPU_BF16", raising=False)
    same = maybe_bf16_variables(tree)
    assert same["params"]["w"].dtype == jnp.float32

    monkeypatch.setenv("PYTRACKING_TPU_BF16", "1")
    cast = maybe_bf16_variables(tree)
    assert cast["params"]["w"].dtype == jnp.bfloat16
    assert cast["batch_stats"]["mean"].dtype == jnp.bfloat16
    assert cast["counter"].dtype == jnp.int32
