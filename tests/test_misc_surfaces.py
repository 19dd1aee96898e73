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
