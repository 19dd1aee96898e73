"""DiMP tracking-regime DECISION parity vs the reference (dimp.py:238-303,
update_memory:430-484), exercised through ALL four flags.

Why score injection: with random-init weights the online-learned filter tops out
at max-score ~0.05 (measured: 10..60 steepest-descent iterations barely move it),
so every frame is `not_found`; and boosting the learned filter by a common factor
amplifies the documented half-pixel crop-convention difference (PARITY.md) from
3e-3 per filter element into disagreeing argmax cells, so the traces diverge for
reasons that have nothing to do with the decision logic. This test therefore
drives BOTH implementations' real tracker loops with IDENTICAL scripted score
maps (classify_target / _classify monkeypatched; everything else — crops,
backbone, memory, sample-weight bookkeeping, learned-filter updates — runs for
real), isolating exactly the layer VERDICT r2 flagged as untested: the
`normal` / `hard_negative` (both branches) / `uncertain` / `not_found`
transitions, the position bookkeeping they gate, and the memory-update
machinery (replace indices, per-sample weights, learning-rate switching,
train_skipping) behind them.

IoU-Net refinement is disabled on both sides (use_iou_net=False — a supported
reference mode, dimp.py:124,150): with random weights its gradient ascent is
chaotic and would re-introduce network noise into the box trace.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference checkout not available", allow_module_level=True)

import tests.refshim  # noqa: F401

import jax
import jax.numpy as jnp

from pytracking_tpu.utils import port_weights as pw
from tests.test_reference_parity import randomize_bn_stats
from tests.test_tracker_trace_parity import (_MY_AUG, _REF_AUG,
                                             _build_my_tracker,
                                             _build_reference_tracker)

SZ = 19          # dimp50 score-map size: feat 18 + (ksz+1)%2
C = (SZ - 1) / 2  # score center
TRAIN_SKIPPING = 3


def _blob(peaks):
    """Score map with Gaussian blobs at [(row, col, amp)] (sigma=1 cell)."""
    y, x = np.mgrid[0:SZ, 0:SZ].astype(np.float64)
    m = np.zeros((SZ, SZ))
    for r, c, a in peaks:
        m = np.maximum(m, a * np.exp(-0.5 * ((y - r) ** 2 + (x - c) ** 2)))
    return m.astype(np.float32)


def _scripted_maps():
    """One map per frame, each designed to land WELL inside one decision region
    (decision thresholds: not_found 0.25, hard_negative ratio 0.5, distractor
    ratio 0.8, displacement 0.8*sqrt(19*19)/2 = 7.6 cells, neighborhood mask
    half-width ~4.5 cells)."""
    c = int(C)
    return [
        # 1: single strong peak near center -> normal
        ("normal", _blob([(c + 1, c + 1, 1.0)])),
        # 2: secondary peak at 0.6 ratio (< 0.8 distractor, > 0.5 hard-neg)
        #    -> hard_negative, main peak taken (ref dimp.py:291-295)
        ("hard_negative", _blob([(c + 1, c, 1.0), (c - 8, c - 8, 0.6)])),
        # 3: two comparable peaks (ratio 0.9 > 0.8) BOTH displaced > 7.6 cells
        #    -> uncertain; position still follows peak 1 (ref :137-141,264-271)
        ("uncertain", _blob([(c + 8, c, 1.0), (c - 8, c, 0.9)])),
        # 4: distractor ratio 0.85, main near previous position, distractor far
        #    -> hard_negative, main peak taken (ref :273-276)
        ("hard_negative", _blob([(c + 1, c + 1, 1.0), (c, c - 8, 0.85)])),
        # 5: distractor ratio 0.85, main peak FAR, distractor near previous
        #    -> hard_negative, SECOND peak taken (ref :278-283)
        ("hard_negative", _blob([(c + 8, c + 8, 1.0), (c - 1, c, 0.85)])),
        # 6: max 0.1 < 0.25 -> not_found, position held (ref :259-262)
        ("not_found", _blob([(c + 2, c, 0.1)])),
        # 7: recovery -> normal; frame_num multiple of train_skipping=3 also
        #    exercises the periodic classifier refit on both sides
        ("normal", _blob([(c - 1, c - 1, 0.9)])),
        # 8: normal again (post-refit step)
        ("normal", _blob([(c + 1, c, 0.8)])),
    ]


@pytest.fixture(scope="module")
def dimp_pair_noiou():
    import ltr.models.tracking.dimpnet as ref_dimpnet

    torch.manual_seed(0)
    ref_net = ref_dimpnet.dimpnet50(
        backbone_pretrained=False, filter_size=4, optim_iter=3,
        clf_feat_norm=True, clf_feat_blocks=0, final_conv=True,
        out_feature_dim=512, optim_init_step=0.9, optim_init_reg=0.1,
        init_gauss_sigma=0.9, num_dist_bins=100, bin_displacement=0.1,
        mask_init_factor=3.0, target_mask_act="sigmoid", score_act="relu")
    ref_net.eval()
    randomize_bn_stats(ref_net)
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    variables = pw.port_dimpnet(sd, layers=(3, 4, 6, 3), block="bottleneck")
    return ref_net, variables


def _frames(n, h=480, w=640):
    rng = np.random.default_rng(3)
    bg = rng.integers(30, 90, (h, w, 3)).astype(np.uint8)
    tex = rng.integers(140, 255, (40, 40, 3)).astype(np.uint8)
    ims = []
    for _ in range(n):
        im = bg.copy()
        im[220:260, 300:340] = tex
        ims.append(im)
    return ims, [300.0, 220.0, 40.0, 40.0]


def test_dimp_decision_paths_match_reference(dimp_pair_noiou):
    ref_net, variables = dimp_pair_noiou
    script = _scripted_maps()
    frames, init_bbox = _frames(len(script) + 1)

    # ---------------- reference side
    ref = _build_reference_tracker(ref_net, not_found_threshold=0.25)
    ref.params.use_iou_net = False
    ref.params.train_skipping = TRAIN_SKIPPING
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})
    current = {"map": None}
    ref.classify_target = lambda test_x: torch.from_numpy(
        current["map"]).reshape(1, 1, SZ, SZ)

    # ---------------- our side (eager so the scripted _classify is consulted
    # every frame instead of being baked into one jit trace)
    mine = _build_my_tracker(variables, not_found_threshold=0.25)
    # params are frozen dataclasses -> rebuild with overrides
    from dataclasses import replace
    mine.params = replace(mine.params, use_iou_net=False,
                          train_skipping=TRAIN_SKIPPING)
    mine._classify = lambda weights, feat: jnp.asarray(
        current["map"]).reshape(1, SZ, SZ, 1)

    with jax.disable_jit():
        mine.initialize(frames[0], {"init_bbox": list(init_bbox)})

        flags_seen = []
        for i, (expected_flag, score_map) in enumerate(script):
            current["map"] = score_map
            ref_out = ref.track(frames[i + 1])
            my_out = mine.track(frames[i + 1])

            ref_flag = ref.debug_info["flag"]
            assert my_out["flag"] == ref_flag == expected_flag, \
                f"frame {i + 1}: mine={my_out['flag']} ref={ref_flag} " \
                f"expected={expected_flag}"
            flags_seen.append(ref_flag)

            # position bookkeeping: same peak followed, same clamping; the only
            # cross-side slack is the documented half-pixel crop quantization,
            # compounding slowly through sample_pos
            np.testing.assert_allclose(
                np.asarray(my_out["target_bbox"], np.float64),
                np.asarray(ref_out["target_bbox"], np.float64), atol=2.0)

            # memory bookkeeping: replace index, number stored, and the FULL
            # 50-sample weight vector (pins learning-rate switching: 0.02 on
            # hard_negative frames, 0.01 otherwise; skipped on uncertain and
            # not_found frames) must agree exactly
            assert int(mine.state.num_stored) == int(ref.num_stored_samples[0])
            assert int(mine.state.prev_ind) == int(ref.previous_replace_ind[0]
                                                   if ref.previous_replace_ind[0]
                                                   is not None else -1)
            np.testing.assert_allclose(np.asarray(mine.state.mem_weights),
                                       ref.sample_weights[0].numpy(), atol=1e-6)
            # stored target boxes agree to the crop-quantization band
            n = int(ref.num_stored_samples[0])
            np.testing.assert_allclose(np.asarray(mine.state.mem_boxes[:n]),
                                       ref.target_boxes[:n].numpy(), atol=2.5)

    # all four decision regimes actually occurred
    assert set(flags_seen) == {"normal", "hard_negative", "uncertain",
                               "not_found"}
