"""Frame-shape bucketing: heterogeneous image sizes share one compiled step.

The reference's eager torch trackers pay zero XLA compile (running.py:138 runs
cold); our jitted steps specialize on the static frame shape. BaseTracker's
bucket padding (base.py:_prepare_image) pads frames edge-replicate up to the
next PYTRACKING_TPU_SHAPE_BUCKETS multiple and threads the TRUE (H, W) through
the jit as a traced array, so:

  * sequences whose shapes land in the same bucket reuse ONE executable
    (test_bucket_reuses_one_executable);
  * results are unchanged vs running without padding — replicate-border patch
    reads into the pad region return border values because the padding
    replicates them (test_padding_preserves_results);
  * TaMOs' whole-frame warp matches the antialiased resize it replaces
    (test_tamos_whole_frame_warp_matches_resize).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_dimp_tracker import make_frame, tiny_dimpnet

from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker


def _make_tracker():
    net = tiny_dimpnet()
    params = DiMPParams(
        image_sample_size=96, kernel_size=4, sample_memory_size=8,
        net_opt_iter=2, net_opt_update_iter=1, net_opt_hn_iter=1, train_skipping=5,
        augmentation=(("fliplr", True),),
        num_init_random_boxes=2, box_refinement_iter=1, iounet_k=2)
    dummy_train = jnp.zeros((1, 1, 96, 96, 3))
    dummy_bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    dummy_prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy_train, dummy_train, dummy_bb,
                         dummy_prop, train=False)
    return DiMPTracker(params, net, variables)


def _run_sequence(tracker, H, W, n=3):
    centers = [(H // 2 + 3 * t, W // 2 + 2 * t) for t in range(n)]
    frame0 = make_frame(*centers[0], H=H, W=W)
    tracker.initialize(frame0, {"init_bbox": [centers[0][1] - 10,
                                              centers[0][0] - 10, 20, 20]})
    boxes = []
    for t in range(1, n):
        out = tracker.track(make_frame(*centers[t], H=H, W=W))
        boxes.append(out["target_bbox"])
    return np.asarray(boxes)


@pytest.mark.filterwarnings("ignore")
def test_bucket_reuses_one_executable(monkeypatch):
    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "128")
    tracker = _make_tracker()
    # (150, 200) and (170, 230) both pad to the (256, 256) bucket
    _run_sequence(tracker, 150, 200)
    _run_sequence(tracker, 170, 230)
    # the shape-specialized CROP program compiled once (shared bucket) and the
    # heavy shape-independent step compiled once
    assert tracker._jit_crop._cache_size() == 1
    assert tracker._jit_track_patch._cache_size() == 1
    assert tracker._jit_init_crop._cache_size() == 1
    assert tracker._jit_init_patch._cache_size() == 1
    # a shape in a DIFFERENT bucket recompiles ONLY the crop program
    _run_sequence(tracker, 150, 300)
    assert tracker._jit_crop._cache_size() == 2
    assert tracker._jit_track_patch._cache_size() == 1
    assert tracker._jit_init_patch._cache_size() == 1


@pytest.mark.filterwarnings("ignore")
def test_padding_preserves_results(monkeypatch):
    tracker = _make_tracker()
    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "0")
    ref = _run_sequence(tracker, 150, 200, n=4)
    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "128")
    got = _run_sequence(tracker, 150, 200, n=4)
    # replicate-pad + true-size threading is mathematically the same crop; only
    # summation order inside the resample matmuls differs
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.filterwarnings("ignore")
def test_inside_major_border_mode_uses_true_size(monkeypatch):
    """'inside_major' shrinks the crop against the TRUE image size, not the
    padded one (ops/patch.py:_shrink_inside via the im_sz argument). With an
    off-center target near the image border, the shrink math would differ
    visibly if it saw the padded extent."""
    import dataclasses

    def make():
        t = _make_tracker()
        t.params = dataclasses.replace(t.params, border_mode="inside_major",
                                       patch_max_scale_change=1.5)
        return t

    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "0")
    ref = _run_sequence(make(), 150, 200, n=3)
    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "128")
    got = _run_sequence(make(), 150, 200, n=3)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_prepare_image_padding_semantics(monkeypatch):
    from pytracking_tpu.trackers.base import BaseTracker

    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "64")
    t = BaseTracker(params=None)
    img = np.arange(100 * 130 * 3, dtype=np.uint8).reshape(100, 130, 3)
    padded, (h, w) = t._prepare_image(img)
    assert (h, w) == (100, 130)
    assert padded.shape == (128, 192, 3)
    # edge-replicate: pad rows/cols repeat the border
    np.testing.assert_array_equal(padded[99], padded[110])
    np.testing.assert_array_equal(padded[:, 129], padded[:, 150])
    # exact-bucket shapes pass through untouched (no copy)
    img2 = np.zeros((128, 192, 3), np.uint8)
    p2, _ = t._prepare_image(img2)
    assert p2 is img2
    # granularity is parsed ONCE at construction (round-4 advisor finding):
    # changing the env mid-sequence does not change an existing tracker...
    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "0")
    p3, _ = t._prepare_image(img)
    assert p3.shape == (128, 192, 3)
    # ...a new tracker picks it up; disabled -> identity
    t2 = BaseTracker(params=None)
    p4, _ = t2._prepare_image(img)
    assert p4 is img
    # malformed env fails fast at construction, not mid-sequence
    monkeypatch.setenv("PYTRACKING_TPU_SHAPE_BUCKETS", "banana")
    with pytest.raises(ValueError):
        BaseTracker(params=None)


def test_tamos_whole_frame_warp_matches_resize():
    """The traced-scale sample_patch warp equals the static jax.image.resize +
    edge-pad it replaced (same antialiased triangle filter).

    Geometry chosen so the scaled extent is integral (100 * 0.6 = 60): the old
    path truncated the scaled extent to ints (int(H*s)), which perturbs its
    effective vertical scale by up to 1/th — the new warp applies ONE uniform
    traced scale instead (self-consistent with the box mapping through sfac),
    so only the truncation-free geometry is bit-comparable."""
    from pytracking_tpu.ops.patch import sample_patch

    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((100, 160, 3)).astype(np.float32))
    Hs, Ws = 64, 96
    H_im, W_im = im.shape[0], im.shape[1]
    # static reference path (the pre-bucketing TaMOs code)
    if H_im / W_im <= Hs / Ws:
        s = float(Ws) / W_im
        th, tw = int(H_im * s), Ws
    else:
        s = float(Hs) / H_im
        th, tw = Hs, int(W_im * s)
    th, tw = min(th, Hs), min(tw, Ws)
    scaled = jax.image.resize(im, (th, tw, 3), "bilinear")
    want = jnp.pad(scaled, ((0, Hs - th), (0, Ws - tw), (0, 0)), mode="edge")

    sj = jnp.where(H_im / W_im <= Hs / Ws, Ws / W_im, Hs / H_im)
    extent = jnp.array([Hs, Ws], jnp.float32) / sj
    pos = extent / 2.0 - 0.5
    got, _ = sample_patch(im, pos, extent, (Hs, Ws), mode="replicate")

    # content region matches to resample tolerance; the fractional boundary
    # row/col may differ (the old path truncated the scaled extent to ints)
    np.testing.assert_allclose(np.asarray(got[:th - 1, :tw - 1]),
                               np.asarray(want[:th - 1, :tw - 1]),
                               rtol=1e-3, atol=1e-3)
