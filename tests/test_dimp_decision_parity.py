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


# --------------------------------------------------------------------------- KYS

KSZ = 18  # KYS operates on the feature-grid-cropped score (ref kys.py:243)
KC = KSZ // 2


def _kblob(peaks, sz=KSZ):
    y, x = np.mgrid[0:sz, 0:sz].astype(np.float64)
    m = np.zeros((sz, sz))
    for r, c, a in peaks:
        m = np.maximum(m, a * np.exp(-0.5 * ((y - r) ** 2 + (x - c) ** 2)))
    return m.astype(np.float32)


def _kys_script():
    """(expected_flag, fused 18x18, dimp 19x19) per frame. Fused flags are only
    normal/not_found (ref kys.py:379-382); hard_negative comes from dimp-score
    hn mining (ref :384-409: second dimp peak > 0.5x the dimp score at the
    fused location and > 0.1)."""
    c = KC

    def dimp19(peaks):
        return np.pad(_kblob(peaks), ((0, 1), (0, 1)))

    return [
        # 1: clean fused peak, single dimp peak at the same cell -> normal
        ("normal", _kblob([(c + 1, c + 1, 1.0)]),
         dimp19([(c + 1, c + 1, 0.3)])),
        # 2: fused and dimp peaks offset by EXACTLY one cell -> the dimp peak
        #    wins (remove_offset_in_fused_score); still normal
        ("normal", _kblob([(c + 1, c, 1.0)]), dimp19([(c, c, 0.3)])),
        # 3: distant second dimp peak at 0.8x the at-loc score (>0.5, >0.1)
        #    -> hard_negative via hn mining
        ("hard_negative", _kblob([(c, c, 1.0)]),
         dimp19([(c, c, 0.3), (c - 7, c - 7, 0.24)])),
        # 4: fused max below 0.05 -> not_found (dimp irrelevant)
        ("not_found", _kblob([(c, c, 0.01)]), dimp19([(c, c, 0.3)])),
        # 5: recovery on the train_skipping cadence -> periodic refit
        ("normal", _kblob([(c - 1, c - 1, 0.9)]),
         dimp19([(c - 1, c - 1, 0.3)])),
        # 6: second dimp peak below the 0.1 floor -> stays normal
        ("normal", _kblob([(c + 1, c, 0.8)]),
         dimp19([(c + 1, c, 0.3), (c - 7, c, 0.09)])),
    ]


def test_kys_fused_decision_paths_match_reference():
    """KYS fused localization decision parity (round-2 verdict ask #2): both
    loops driven by IDENTICAL scripted fused responses + dimp score maps
    through normal / snap-to-dimp-peak / hn-mining hard_negative / not_found,
    with memory bookkeeping compared each frame."""
    import ltr.models.tracking.kysnet as ref_kysnet

    from pytracking.features.net_wrappers import NetWithBackbone
    from pytracking.tracker.kys import KYS
    from pytracking.utils.params import TrackerParams

    from pytracking_tpu.models.tracking.kysnet import kysnet_res50
    from pytracking_tpu.trackers.kys import KYSParams, KYSTracker

    torch.manual_seed(0)
    ref_net = ref_kysnet.kysnet_res50(
        backbone_pretrained=False, optim_iter=3, cv_kernel_size=3,
        cv_max_displacement=9, cv_stride=1, init_gauss_sigma=0.9,
        train_feature_extractor=False, train_iounet=False, detach_length=0,
        state_dim=8, representation_predictor_dims=(16,),
        conf_measure="entropy", dimp_thresh=0.05)
    ref_net.eval()
    randomize_bn_stats(ref_net)
    variables = pw.port_kysnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})

    script = _kys_script()
    frames, init_bbox = _frames(len(script) + 1)

    wrapper = NetWithBackbone(net_path="unused", use_gpu=False)
    wrapper.net = ref_net
    wrapper.initialize = lambda *a, **k: None
    p = TrackerParams()
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            image_sample_size=288, search_area_scale=5, sample_memory_size=50,
            learning_rate=0.01, init_samples_minimum_weight=0.25,
            train_skipping=TRAIN_SKIPPING, output_sigma_factor=1 / 4,
            update_classifier=True, net_opt_iter=10, net_opt_update_iter=2,
            net_opt_hn_iter=1,
            use_augmentation=True, augmentation=_REF_AUG,
            augmentation_expansion_factor=2, random_shift_factor=0,
            window_output=True, use_clipped_window=True,
            effective_search_area=10.0, apply_window_to_dimp_score=True,
            dimp_threshold=0.05, target_not_found_threshold_fused=0.05,
            reset_state_during_occlusion=False,
            prev_feat_remove_subpixel_shift=True, move_feat_to_center=True,
            update_scale_when_uncertain=True, use_iou_net=False,
            hard_negative_learning_rate=0.02, hard_negative_threshold=0.5,
            remove_offset_in_fused_score=True, perform_hn_mining_dimp=True,
            target_neighborhood_scale_safe=2.2,
            score_downsample_factor=1).items():
        setattr(p, k, v)
    p.net = wrapper
    ref = KYS(p)
    ref.visdom = None
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})

    current = {"fused": None, "dimp": None}
    ref.classify_target = lambda x: torch.from_numpy(
        current["dimp"][:KSZ, :KSZ]).reshape(1, 1, KSZ, KSZ)
    ref.get_response_prediction = lambda bf, sd: (
        torch.from_numpy(current["fused"]).reshape(1, 1, KSZ, KSZ),
        torch.zeros(1, 1, KSZ, KSZ), torch.zeros(1, 8, KSZ, KSZ))

    params = KYSParams(
        image_sample_size=288, search_area_scale=5.0, kernel_size=4,
        sample_memory_size=50, learning_rate=0.01,
        init_samples_minimum_weight=0.25, train_skipping=TRAIN_SKIPPING,
        update_classifier=True, net_opt_iter=10, net_opt_update_iter=2,
        use_augmentation=True, augmentation=_MY_AUG, random_shift_factor=0.0,
        update_scale_when_uncertain=True, use_iou_net=False,
        hard_negative_learning_rate=0.02,
        perform_hn_mining_dimp=True, target_neighborhood_scale_safe=2.2,
        iounet_augmentation=False, iounet_k=3, num_init_random_boxes=0,
        box_jitter_pos=0.1, box_jitter_sz=0.5, maximal_aspect_ratio=6.0,
        box_refinement_iter=5, box_refinement_step_length=1.0,
        box_refinement_step_decay=1.0)
    mine = KYSTracker(params, kysnet_res50(
        optim_iter=3, init_gauss_sigma=0.9, state_dim=8,
        representation_predictor_dims=(16,), conf_measure="entropy",
        dimp_thresh=0.05), variables)
    mine._classify = lambda w, f: jnp.asarray(
        current["dimp"]).reshape(1, SZ, SZ, 1)
    mine._predict_response = lambda mp, mc, sp, ds, il, win, state_valid=None: (
        jnp.asarray(current["fused"]).reshape(1, KSZ, KSZ, 1),
        jnp.zeros_like(sp), None)

    with jax.disable_jit():
        mine.initialize(frames[0], {"init_bbox": list(init_bbox)})

        flags_seen = []
        for i, (expected_flag, fused, dimp) in enumerate(script):
            current["fused"], current["dimp"] = fused, dimp
            ref_out = ref.track(frames[i + 1])
            my_out = mine.track(frames[i + 1])

            ref_flag = ref.debug_info["flag"]
            assert my_out["flag"] == ref_flag == expected_flag, \
                f"frame {i + 1}: mine={my_out['flag']} ref={ref_flag} " \
                f"expected={expected_flag}"
            flags_seen.append(ref_flag)

            np.testing.assert_allclose(
                np.asarray(my_out["target_bbox"], np.float64),
                np.asarray(ref_out["target_bbox"], np.float64), atol=2.0)

            assert int(mine.state.num_stored) == int(ref.num_stored_samples[0])
            np.testing.assert_allclose(np.asarray(mine.state.mem_weights),
                                       ref.sample_weights[0].numpy(), atol=1e-6)

    assert set(flags_seen) == {"normal", "hard_negative", "not_found"}


# -------------------------------------------------------------------------- ATOM

ASZ = 18            # ATOM raw response grid (feature cells)
AC = 8.5            # effective center after the even-kernel pi phase shift
AOUT = 288          # Fourier-upsampled score grid


def _atom_script():
    """(expected_flag, raw 18x18 response) per frame, designed for the
    INTERPOLATED 288-grid decision thresholds: not_found 0.25, distractor 0.8,
    hard-negative 0.5, displacement 0.8*288/2 = 115.2 grid = 7.2 raw cells from
    the grid center, neighborhood half-width ~4 raw cells. The reference flags
    'normal' as None (atom.py:406)."""
    c = AC
    return [
        ("normal", _blob18([(c + 1, c + 1, 1.0)])),
        # distant second peak at 0.6 (plain hard-negative branch)
        ("hard_negative", _blob18([(c + 1, c, 1.0), (c - 6, c - 6, 0.6)])),
        # two comparable peaks BOTH >7.2 cells from center -> uncertain
        ("uncertain", _blob18([(c + 7.6, c + 3, 1.0), (c - 7.6, c - 3, 0.9)])),
        # main far, distractor near center -> hard_negative taking peak 2
        ("hard_negative", _blob18([(c + 7.6, c + 5, 1.0), (c - 1, c, 0.85)])),
        ("not_found", _blob18([(c, c, 0.1)])),
        # recovery on the train_skipping cadence -> CG refit both sides
        ("normal", _blob18([(c - 1, c - 1, 0.9)])),
    ]


def _blob18(peaks):
    y, x = np.mgrid[0:ASZ, 0:ASZ].astype(np.float64)
    m = np.zeros((ASZ, ASZ))
    for r, c, a in peaks:
        m = np.maximum(m, a * np.exp(-0.5 * ((y - r) ** 2 + (x - c) ** 2)))
    return m.astype(np.float32)


def test_atom_decision_paths_match_reference(monkeypatch):
    """ATOM tracking-regime decision parity (reference atom.py:341-406) with
    IDENTICAL scripted RAW filter responses on both sides — the Fourier
    interpolation (cfft2 + pi phase shift + sample_fs), wrap-around argmax,
    neighborhood masking, displacement analysis, memory bookkeeping, and the
    periodic CG refit all run for real."""
    import ltr.models.bbreg.atom as ref_atom

    import pytracking.features.deep as ref_deep
    from pytracking.features.extractor import MultiResolutionExtractor
    from pytracking.tracker.atom import ATOM
    from pytracking.utils.params import FeatureParams, TrackerParams

    import pytracking_tpu.trackers.atom as my_atom_mod
    from pytracking_tpu.models.tracking.atomnet import atom_resnet18
    from pytracking_tpu.trackers.atom import ATOMParams, ATOMTracker
    from tests.test_tracker_trace_parity import _MY_AUG, _REF_AUG

    torch.manual_seed(0)
    ref_net = ref_atom.atom_resnet18(backbone_pretrained=False)
    ref_net.eval()
    randomize_bn_stats(ref_net)
    variables = pw.port_atomnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})

    script = _atom_script()
    frames, init_bbox = _frames(len(script) + 1)

    ref_deep.load_network = lambda path: ref_net

    deep_params = TrackerParams()
    for k, v in dict(learning_rate=0.01, init_samples_minimum_weight=0.25,
                     output_sigma_factor=1 / 4, kernel_size=(4, 4),
                     compressed_dim=64, filter_reg=1e-1, projection_reg=1e-4,
                     use_augmentation=True).items():
        setattr(deep_params, k, v)

    p = TrackerParams()
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            max_image_sample_size=(18 * 16) ** 2,
            min_image_sample_size=(18 * 16) ** 2, search_area_scale=5,
            feature_size_odd=False, CG_iter=5, init_CG_iter=60, init_GN_iter=6,
            post_init_CG_iter=0, fletcher_reeves=False, standard_alpha=True,
            CG_forgetting_rate=None, sample_memory_size=250,
            train_skipping=TRAIN_SKIPPING,
            feature_window=False, window_output=False,
            scale_factors=torch.ones(1), score_upsample_factor=1,
            augmentation=_REF_AUG, augmentation_expansion_factor=2,
            random_shift_factor=0, update_projection_matrix=True,
            proj_init_method="pca", filter_init_method="zeros",
            projection_activation="none", response_activation=("mlu", 0.05),
            advanced_localization=True, target_not_found_threshold=0.25,
            distractor_threshold=0.8, hard_negative_threshold=0.5,
            target_neighborhood_scale=2.2, dispalcement_scale=0.8,
            hard_negative_learning_rate=0.02, hard_negative_CG_iter=5,
            update_scale_when_uncertain=True, use_iou_net=False,
            iounet_augmentation=False, iounet_k=3, num_init_random_boxes=0,
            box_jitter_pos=0.1, box_jitter_sz=0.5, maximal_aspect_ratio=6,
            box_refinement_iter=5, box_refinement_step_length=1,
            box_refinement_step_decay=1).items():
        setattr(p, k, v)
    p.features = MultiResolutionExtractor([ref_deep.ATOMResNet18(
        net_path="unused", output_layers=["layer3"], use_gpu=False,
        fparams=FeatureParams(feature_params=[deep_params]),
        normalize_power=2)])

    ref = ATOM(p)
    ref.visdom = None
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})

    current = {"map": None}

    from pytracking.libs.tensorlist import TensorList as RefTL
    ref.apply_filter = lambda x: RefTL(
        [torch.from_numpy(current["map"]).reshape(1, 1, ASZ, ASZ)])

    params = ATOMParams(
        proj_init_method="pca", filter_init_method="zeros",
        augmentation=_MY_AUG, random_shift_factor=0.0, num_init_random_boxes=0,
        use_iou_net=False, train_skipping=TRAIN_SKIPPING)
    mine = ATOMTracker(params, atom_resnet18(), variables)

    # shape-aware seam: only the single-sample TRACK response is scripted; the
    # init joint optimization and the periodic CG refit over the memory batch
    # keep the real correlation (matching the reference, whose apply_filter is
    # only on the track path)
    _real_conv = my_atom_mod._conv_same

    def _scripted_conv(x, w):
        if x.shape[0] == 1 and current["map"] is not None:
            return jnp.asarray(current["map"]).reshape(1, ASZ, ASZ, 1)
        return _real_conv(x, w)

    with jax.disable_jit():
        mine.initialize(frames[0], {"init_bbox": list(init_bbox)})
        monkeypatch.setattr(my_atom_mod, "_conv_same", _scripted_conv)

        flags_seen = []
        for i, (expected_flag, raw_map) in enumerate(script):
            current["map"] = raw_map
            ref_out = ref.track(frames[i + 1])
            my_out = mine.track(frames[i + 1])

            ref_flag = ref.debug_info["flag"] or "normal"   # None == normal
            assert my_out["flag"] == ref_flag == expected_flag, \
                f"frame {i + 1}: mine={my_out['flag']} ref={ref_flag} " \
                f"expected={expected_flag}"
            flags_seen.append(ref_flag)

            np.testing.assert_allclose(
                np.asarray(my_out["target_bbox"], np.float64),
                np.asarray(ref_out["target_bbox"], np.float64), atol=2.0)

            assert int(mine.state.num_stored) == int(ref.num_stored_samples[0])
            n = int(ref.num_stored_samples[0])
            np.testing.assert_allclose(np.asarray(mine.state.mem_weights[:n]),
                                       ref.sample_weights[0][:n].numpy(),
                                       atol=1e-6)

    assert set(flags_seen) == {"normal", "hard_negative", "uncertain",
                               "not_found"}
