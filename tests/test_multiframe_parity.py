"""Multi-frame tracker-loop parity for ToMP, TaMOs and PrDiMP vs the reference
(the round-2 verdict's #3 ask): ≥3-frame traces INCLUDING memory-update frames.

ToMP (ref tomp.py:142-225): conf_ths lowered so the 2-slot memory update fires
on every found frame; asserts per-frame flag/box parity and the full memory
bookkeeping (weights, replace index, stored boxes/labels).

TaMOs (ref tamos.py:300-420): whole-frame sampling means BOTH sides see
identical inputs every frame — divergence can only enter through the memory
and label-pool update, which is exactly what gets exercised.

PrDiMP (ref dimp.py:94-188 with score_preprocess='softmax'): the full loop over
scripted score maps (same device as test_dimp_decision_parity — random-weight
scores never clear the decision thresholds, and the softmax amplifies the
documented half-pixel crop delta), driving the softmax preprocessing, the
decision logic, memory updates with learning-rate switching, and the periodic
classifier refit on both sides.
"""

import os
from dataclasses import replace

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
from tests.test_tracker_trace_parity import (_MY_AUG, _build_my_tracker,
                                             _build_reference_tracker,
                                             _synthetic_sequence)


# ------------------------------------------------------------------------ ToMP

def test_tomp50_multi_frame_trace_parity_with_memory_updates():
    import ltr.models.tracking.tompnet as ref_tompnet

    from pytracking.features.net_wrappers import NetWithBackbone
    from pytracking.tracker.tomp import ToMP
    from pytracking.utils.params import TrackerParams

    from pytracking_tpu.models.tracking.tompnet import tompnet50
    from pytracking_tpu.trackers.tomp import ToMPParams, ToMPTracker

    torch.manual_seed(0)
    ref_net = ref_tompnet.tompnet50(backbone_pretrained=False, final_conv=True,
                                    head_feat_norm=True, out_feature_dim=512,
                                    feature_sz=18, frozen_backbone_layers=[])
    ref_net.eval()
    randomize_bn_stats(ref_net)
    variables = pw.port_tompnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})

    n_frames = 5
    frames, init_bbox = _synthetic_sequence(n=n_frames)

    wrapper = NetWithBackbone(net_path="unused", use_gpu=False)
    wrapper.net = ref_net
    wrapper.initialize = lambda *a, **k: None
    p = TrackerParams()
    # reference parameter/tomp/tomp50.py, with conf_ths lowered so the 2-slot
    # memory update (tomp.py:182-199) fires on found frames, and not_found
    # disabled so random-weight scores keep tracking
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            train_feature_size=18, feature_stride=16, image_sample_size=288,
            search_area_scale=5, border_mode="inside_major",
            patch_max_scale_change=1.5, sample_memory_size=2,
            learning_rate=0.01, init_samples_minimum_weight=0.25,
            train_skipping=20, update_classifier=True, window_output=False,
            use_augmentation=False, augmentation={},
            augmentation_expansion_factor=2, random_shift_factor=1 / 3,
            advanced_localization=True, target_not_found_threshold=-1.0,
            distractor_threshold=0.8, hard_negative_threshold=0.5,
            target_neighborhood_scale=2.2, dispalcement_scale=0.8,
            hard_negative_learning_rate=0.02, update_scale_when_uncertain=True,
            conf_ths=-1.0, search_area_rescaling_at_occlusion=True).items():
        setattr(p, k, v)
    p.net = wrapper
    ref = ToMP(p)
    ref.visdom = None
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})

    # the reference ToMP never exposes its localization flag (tomp.py:168 uses
    # it only for control flow) — record it from localize_target's return
    _orig_localize = ref.localize_target

    def _recording_localize(*a, **k):
        out = _orig_localize(*a, **k)
        ref._last_flag = out[3]
        return out

    ref.localize_target = _recording_localize

    mine = ToMPTracker(replace(ToMPParams(), conf_ths=-1.0,
                               target_not_found_threshold=-1.0),
                       tompnet50(), variables)
    mine.initialize(frames[0], {"init_bbox": list(init_bbox)})

    updates_seen = 0
    for t in range(1, n_frames):
        ref_out = ref.track(frames[t])
        my_out = mine.track(frames[t])

        ref_flag = ref._last_flag
        assert my_out["flag"] == ref_flag, \
            f"frame {t}: mine={my_out['flag']} ref={ref_flag}"

        # the transformer amplifies the documented half-pixel crop difference;
        # the direct box regression then feeds pos/scale back into the next
        # crop, so the bound loosens slowly with t
        np.testing.assert_allclose(
            np.asarray(my_out["target_bbox"], np.float64),
            np.asarray(ref_out["target_bbox"], np.float64), atol=2.0 + 0.5 * t)

        # memory bookkeeping (2-slot ring: slot 0 = init frame, slot 1 cycles).
        # The reference counter grows unboundedly (tomp.py update_memory
        # `num_stored_samples += 1`) and relies on torch slice-clamping; ours
        # saturates at the memory size — compare the effective count.
        M = 2
        assert int(mine.state.num_stored) == min(int(ref.num_stored_samples[0]), M)
        np.testing.assert_allclose(np.asarray(mine.state.mem_weights),
                                   ref.sample_weights[0].numpy(), atol=1e-6)
        n = min(int(ref.num_stored_samples[0]), M)
        # random-weight bbox regression inflates the box to image size, so the
        # half-pixel crop convention (PARITY.md) scales with it: relative bound
        np.testing.assert_allclose(np.asarray(mine.state.mem_boxes[:n]),
                                   ref.target_boxes[:n].numpy(),
                                   rtol=0.03, atol=9.0)
        if n > 1:
            updates_seen += 1
            # stored labels for the update slot: Gaussians at the stored
            # position — the random-weight box regression inflates the target,
            # so the crop-convention delta shifts the center sub-cell; assert
            # the peaks land on the same/adjacent cell
            my_lbl = np.asarray(mine.state.mem_labels[1])
            ref_lbl = ref.target_labels[0][1, 0].numpy()
            assert my_lbl.shape == ref_lbl.shape
            my_pk = np.unravel_index(my_lbl.argmax(), my_lbl.shape)
            ref_pk = np.unravel_index(ref_lbl.argmax(), ref_lbl.shape)
            assert max(abs(my_pk[0] - ref_pk[0]), abs(my_pk[1] - ref_pk[1])) <= 1, \
                f"frame {t}: label peaks {my_pk} vs {ref_pk}"

    assert updates_seen >= 3, "memory-update frames were not exercised"


# ----------------------------------------------------------------------- TaMOs

def test_tamos_multi_frame_trace_parity_with_memory_updates():
    import ltr.models.tracking.tamosnet as ref_tamosnet

    from pytracking.features.net_wrappers import NetWithBackbone
    from pytracking.tracker.tamos import TaMOs
    from pytracking.utils.params import TrackerParams

    from pytracking_tpu.models.tracking.tamosnet import tamosnet_resnet50
    from pytracking_tpu.trackers.tamos import TaMOsParams, TaMOsTracker

    torch.manual_seed(0)
    ref_net = ref_tamosnet.tamosnet_resnet50(
        backbone_pretrained=False, filter_size=1, head_feat_blocks=0,
        head_feat_norm=True, final_conv=True, out_feature_dim=256,
        feature_sz=(36, 24), head_layer=["layer2", "layer3"], num_tokens=10,
        label_enc="gaussian", box_enc="ltrb_token",
        fpn_head_cls_output_mode=["high"], fpn_head_bbreg_output_mode=["high"],
        frozen_backbone_layers=[])
    ref_net.eval()
    randomize_bn_stats(ref_net)
    variables = pw.port_tamosnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})

    n_frames = 4
    frames, init_bbox = _synthetic_sequence(n=n_frames)

    wrapper = NetWithBackbone(net_path="unused", use_gpu=False)
    wrapper.net = ref_net
    wrapper.initialize = lambda *a, **k: None
    p = TrackerParams()
    # reference parameter/tamos/tamos_resnet50.py with conf_ths lowered so the
    # memory/label-pool update (tamos.py:330-420) fires every found frame
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            train_feature_size=[24, 36], feature_stride=16,
            image_sample_size=[384, 576], search_area_scale=5,
            sample_memory_size=2, learning_rate=0.01,
            init_samples_minimum_weight=0.25, update_classifier=True,
            window_output=False, use_augmentation=False, augmentation={},
            augmentation_expansion_factor=2, random_shift_factor=1 / 3,
            advanced_localization=True, target_not_found_threshold=-1.0,
            distractor_threshold=0.8, hard_negative_threshold=0.5,
            target_neighborhood_scale=1.5, dispalcement_scale=0.8,
            hard_negative_learning_rate=0.02, update_scale_when_uncertain=True,
            conf_ths=-1.0, search_area_rescaling_at_occlusion=False,
            use_gt_box=True, plot_iou=False, normalize_scores=True).items():
        setattr(p, k, v)
    p.net = wrapper
    ref = TaMOs(p)
    ref.visdom = None
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})

    # record the per-object localization flag (only lives in control flow)
    flags_ref = {}
    _orig_loc = ref.localize_target

    def _recording_localize(scores, scale_factor, oid):
        out = _orig_loc(scores, scale_factor, oid)
        flags_ref[oid] = out[2]
        return out

    ref.localize_target = _recording_localize

    mine = TaMOsTracker(replace(TaMOsParams(), conf_ths=-1.0,
                                target_not_found_threshold=-1.0),
                        tamosnet_resnet50(), variables)
    mine.enable_debug_outputs()
    mine.initialize(frames[0], {"init_bbox": list(init_bbox)})

    from pytracking_tpu.trackers.dimp import FLAG_NAMES

    for t in range(1, n_frames):
        ref_out = ref.track(frames[t])
        my_out = mine.track(frames[t])
        # the decision path (incl. the displacement analysis and the lr/update
        # gating behind it) must take the same branch every frame
        my_flag = FLAG_NAMES[int(mine.state.flag[0])]
        assert my_flag == flags_ref[1], \
            f"frame {t}: mine={my_flag} ref={flags_ref[1]}"
        # whole-frame sampling: inputs identical each frame, so the output
        # boxes must stay near-identical through the memory updates
        np.testing.assert_allclose(
            np.asarray(my_out["target_bbox"], np.float64),
            np.asarray(ref_out["target_bbox"], np.float64), atol=1.0 + t)

    # label pool / memory actually updated past the init frame on both sides.
    # The reference counter grows unboundedly (tamos.py:539
    # `num_stored_samples += 1`, slice-clamped on use); ours saturates at M.
    M = 2
    assert int(mine.state.num_stored) == min(int(ref.num_stored_samples[0]), M)
    assert int(ref.num_stored_samples[0]) > 1, "no memory update ever fired"
    np.testing.assert_allclose(np.asarray(mine.state.mem_weights),
                               ref.sample_weights[0].numpy(), atol=1e-6)
    n = min(int(ref.num_stored_samples[0]), M)
    np.testing.assert_allclose(np.asarray(mine.state.mem_boxes[:n]),
                               ref.target_boxes[:n].numpy(), atol=3.0)


# ---------------------------------------------------------------------- PrDiMP

SZ = 19
C = (SZ - 1) / 2


def _blob(peaks):
    y, x = np.mgrid[0:SZ, 0:SZ].astype(np.float64)
    m = np.zeros((SZ, SZ))
    for r, c, a in peaks:
        m = np.maximum(m, a * np.exp(-0.5 * ((y - r) ** 2 + (x - c) ** 2)))
    return m.astype(np.float32)


def _scripted_maps_prdimp():
    """Raw maps whose SOFTMAX lands in each decision regime. With a sharp peak
    of amplitude A, softmax max ≈ e^A / (e^A + 350); secondary-peak ratios in
    softmax space are e^(A2-A1). Thresholds: not_found 0.04, hard_negative
    ratio 0.5 (ΔA = ln 0.5 = -0.69), distractor 0.8 (ΔA = -0.22)."""
    c = int(C)
    return [
        ("normal", _blob([(c + 1, c + 1, 10.0)])),
        # ΔA=-0.5: ratio e^-0.5=0.61 in (0.5, 0.8) -> hard_negative, peak 1
        ("hard_negative", _blob([(c + 1, c, 10.0), (c - 8, c - 8, 9.5)])),
        # ΔA=-0.1: ratio 0.90 > 0.8, both displaced far -> uncertain
        ("uncertain", _blob([(c + 8, c, 10.0), (c - 8, c, 9.9)])),
        # ΔA=-0.15: distractor, main near previous -> hard_negative, peak 1
        ("hard_negative", _blob([(c + 1, c + 1, 10.0), (c, c - 8, 9.85)])),
        # flat map -> softmax max ≈ 1/361 < 0.04 -> not_found
        ("not_found", _blob([(c + 2, c, 0.1)])),
        # recovery on a train_skipping multiple -> periodic refit both sides
        ("normal", _blob([(c - 1, c - 1, 9.0)])),
        ("normal", _blob([(c + 1, c, 8.0)])),
    ]


def _frames_static(n, h=480, w=640):
    rng = np.random.default_rng(3)
    bg = rng.integers(30, 90, (h, w, 3)).astype(np.uint8)
    tex = rng.integers(140, 255, (40, 40, 3)).astype(np.uint8)
    ims = []
    for _ in range(n):
        im = bg.copy()
        im[220:260, 300:340] = tex
        ims.append(im)
    return ims, [300.0, 220.0, 40.0, 40.0]


def test_prdimp50_multi_frame_decision_and_memory_parity():
    import ltr.models.tracking.dimpnet as ref_dimpnet

    from pytracking_tpu.models.tracking.dimpnet import klcedimpnet50
    from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker

    torch.manual_seed(0)
    ref_net = ref_dimpnet.klcedimpnet50(
        backbone_pretrained=False, filter_size=4, optim_iter=3,
        clf_feat_norm=True, clf_feat_blocks=0, final_conv=True,
        out_feature_dim=512, optim_init_step=1.0, optim_init_reg=0.05,
        optim_min_reg=0.05, gauss_sigma=0.9, alpha_eps=0.05,
        normalize_label=True, init_initializer="zero")
    ref_net.eval()
    randomize_bn_stats(ref_net)
    with torch.no_grad():
        ref_net.classifier.filter_initializer.filter_conv.weight.normal_(0, 0.01)
    variables = pw.port_dimpnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()},
        layers=(3, 4, 6, 3), block="bottleneck")

    script = _scripted_maps_prdimp()
    frames, init_bbox = _frames_static(len(script) + 1)
    train_skipping = 3

    # ---- reference (prdimp50 parameter deltas; 22*16=352 sample -> score 23?
    # keep the dimp50 288 geometry so the scripted 19x19 maps fit both sides)
    ref = _build_reference_tracker(ref_net, not_found_threshold=0.04)
    for k, v in dict(score_preprocess="softmax", use_iou_net=False,
                     train_skipping=train_skipping,
                     box_refinement_space="relative").items():
        setattr(ref.params, k, v)
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})
    current = {"map": None}
    ref.classify_target = lambda test_x: torch.from_numpy(
        current["map"]).reshape(1, 1, SZ, SZ)

    # ---- ours
    mine = _build_my_tracker(variables, not_found_threshold=0.04)
    mine.params = replace(mine.params, score_preprocess="softmax",
                          softmax_reg=None, use_iou_net=False,
                          train_skipping=train_skipping,
                          box_refinement_space="relative")
    mine.net = klcedimpnet50(optim_iter=3)  # KL/Newton update optimizer
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

            np.testing.assert_allclose(
                np.asarray(my_out["target_bbox"], np.float64),
                np.asarray(ref_out["target_bbox"], np.float64), atol=2.5)

            assert int(mine.state.num_stored) == int(ref.num_stored_samples[0])
            np.testing.assert_allclose(np.asarray(mine.state.mem_weights),
                                       ref.sample_weights[0].numpy(), atol=1e-6)

    assert set(flags_seen) == {"normal", "hard_negative", "uncertain",
                               "not_found"}
