"""One-compile-per-program property across ALL tracker families (VERDICT r4
item 6).

The reference's eager torch trackers never recompile; under jit our claim is:
for a fixed frame shape, every jitted program a tracker owns compiles EXACTLY
once across initialize() + track() x N — no first-track extra compile (the r4
TaMOs init/output layout mismatch), no weak-type or layout churn re-tracing on
later frames. This pins that claim as a tested property for all nine families
instead of a commit-message claim: after the first track, the per-wrapper
executable counts (jax's PjitFunction._cache_size) must all be exactly 1 and
must not grow on subsequent tracks.
"""

import math

import numpy as np
import pytest

from tests.test_dimp_tracker import make_frame, tiny_dimpnet


def _jit_cache_sizes(tracker):
    """name -> compiled-executable count for every jit wrapper the tracker has
    instantiated (trackers create them lazily; only used ones appear). ECO and
    ATOM keep theirs in a _jit_cache dict keyed by (kind, sample_sz)."""
    out = {}
    for name, val in vars(tracker).items():
        if callable(getattr(val, "_cache_size", None)):
            out[name] = val._cache_size()
        elif isinstance(val, dict):
            for k, v in val.items():
                if callable(getattr(v, "_cache_size", None)):
                    out[f"{name}[{k}]"] = v._cache_size()
    return out


def _box_init(tracker, n=4):
    """initialize + track on fixed-shape frames for box trackers."""
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(n)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10,
                                      20, 20]})

    def step(t):
        tracker.track(make_frame(*centers[min(t, n - 1)]))
    return step


def _mask_frames(H=120, W=160):
    def frame_and_mask(cy, cx, sz=24):
        im = np.full((H, W, 3), 40, np.uint8)
        mask = np.zeros((H, W), np.float32)
        y0, y1 = int(cy - sz / 2), int(cy + sz / 2)
        x0, x1 = int(cx - sz / 2), int(cx + sz / 2)
        im[y0:y1, x0:x1] = [220, 60, 60]
        mask[y0:y1, x0:x1] = 1.0
        return im, mask
    return frame_and_mask


# ------------------------------------------------------------------ factories

def _make_dimp():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker

    net = tiny_dimpnet()
    params = DiMPParams(
        image_sample_size=96, kernel_size=4, sample_memory_size=8,
        net_opt_iter=2, net_opt_update_iter=1, net_opt_hn_iter=1,
        train_skipping=2, augmentation=(("fliplr", True),),
        num_init_random_boxes=2, box_refinement_iter=1, iounet_k=2)
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                         train=False)
    tracker = DiMPTracker(params, net, variables)
    return tracker, _box_init(tracker)


def _make_atom():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.atom import ATOMParams, ATOMTracker
    from tests.test_atom_tracker import tiny_atomnet

    net = tiny_atomnet()
    params = ATOMParams(max_image_sample_size=96 ** 2,
                        min_image_sample_size=96 ** 2, compressed_dim=16,
                        sample_memory_size=8,
                        init_CG_iter=6, init_GN_iter=2, CG_iter=3,
                        train_skipping=2, augmentation=(("fliplr", True),),
                        num_init_random_boxes=2, box_refinement_iter=1,
                        iounet_k=2)
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                         train=False)
    tracker = ATOMTracker(params, net, variables)
    return tracker, _box_init(tracker)


def _make_eco():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones import resnet as backbones
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.trackers.eco import ECOParams, ECOTracker

    class Wrapper(nn.Module):
        feature_extractor: nn.Module

        def extract_backbone(self, im, train: bool = False):
            x = backbones.normalize_image(im)
            return self.feature_extractor(x, train=train)

        def __call__(self, im, train: bool = False):
            return self.extract_backbone(im, train=train)

    net = Wrapper(ResNet(block="basic", layers=(1, 1, 1, 1),
                         output_layers=("conv1", "layer3"), base_width=8))
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = ECOParams(
        max_image_sample_size=96 ** 2, min_image_sample_size=96 ** 2,
        sample_memory_size=10, init_CG_iter=6, init_GN_iter=2, CG_iter=3,
        train_skipping=2, scale_factors=(1.0,),
        blocks=((4, 8, 1 / 16, 0.4, 10e-3), (16, 16, 1 / 4, 0.6, 50e-3)),
        feature_blocks=(("conv1", 2), ("layer3", 1)),
        augmentation=(("fliplr", True),))
    tracker = ECOTracker(params, net, variables)
    return tracker, _box_init(tracker)


def _make_kys():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
    from pytracking_tpu.models.classifier.features import ResidualBottleneck
    from pytracking_tpu.models.classifier.initializer import \
        FilterInitializerLinear
    from pytracking_tpu.models.classifier.linear_filter import LinearFilter
    from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
    from pytracking_tpu.models.kys.response_predictor import ResponsePredictor
    from pytracking_tpu.models.tracking.kysnet import KYSNet
    from pytracking_tpu.trackers.kys import KYSParams, KYSTracker

    d = 64
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=16)
    clf_fe = ResidualBottleneck(feature_dim=32, num_blocks=0, l2norm=True,
                                final_conv=True,
                                norm_scale=math.sqrt(1 / (d * 16)), out_dim=d)
    classifier = LinearFilter(
        filter_size=4,
        filter_initializer=FilterInitializerLinear(filter_size=4,
                                                   feature_dim=d),
        filter_optimizer=DiMPSteepestDescentGN(num_iter=2, feat_stride=16,
                                               num_dist_bins=10,
                                               bin_displacement=0.5),
        feature_extractor=clf_fe)
    net = KYSNet(feature_extractor=backbone, classifier=classifier,
                 bb_regressor=AtomIoUNet(input_dim=(128, 256),
                                         pred_input_dim=(32, 32),
                                         pred_inter_dim=(32, 32)),
                 classification_layer="layer3",
                 bb_regressor_layer=("layer2", "layer3"),
                 predictor=ResponsePredictor(state_dim=4,
                                             representation_predictor_dims=(8,),
                                             conf_measure="entropy",
                                             dimp_thresh=0.05),
                 max_displacement=3)
    params = KYSParams(image_sample_size=96, kernel_size=4,
                       sample_memory_size=6, net_opt_iter=2,
                       net_opt_update_iter=1, train_skipping=2,
                       augmentation=(("fliplr", True),),
                       num_init_random_boxes=2, box_refinement_iter=1,
                       iounet_k=2)
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    v_main = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                      train=False)
    mf = jnp.zeros((1, 6, 6, d))
    ds = jnp.zeros((1, 6, 6, 1))
    il = jnp.zeros((1, 6, 6, 1))
    v_pred = net.init(jax.random.PRNGKey(1), mf, mf, None, ds, il,
                      method=lambda m, a, b, c, e, f: m.predict_response(
                          a, b, c, e, init_label=f))
    variables = {"params": {**v_main["params"], **v_pred["params"]},
                 "batch_stats": {**v_main.get("batch_stats", {}),
                                 **v_pred.get("batch_stats", {})}}
    tracker = KYSTracker(params, net, variables)
    return tracker, _box_init(tracker)


def _make_keep_track():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.tcm.superglue import SuperGlueMatcher
    from pytracking_tpu.models.tcm.target_candidate_matching import (
        DescriptorExtractor, TargetCandidateMatchingNetwork)
    from pytracking_tpu.trackers.keep_track import (KeepTrackParams,
                                                    KeepTrackTracker)

    net = tiny_dimpnet()
    params = KeepTrackParams(
        image_sample_size=96, search_area_scale=5.0, border_mode="replicate",
        patch_max_scale_change=None, kernel_size=4, sample_memory_size=8,
        net_opt_iter=2, net_opt_update_iter=1, train_skipping=2,
        augmentation=(("fliplr", True),),
        num_init_random_boxes=2, box_refinement_iter=1, iounet_k=2,
        max_candidates=4)
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                         train=False)
    tcm_net = TargetCandidateMatchingNetwork(
        feature_extractor=ResNet(block="basic", layers=(1, 1, 1, 1),
                                 output_layers=("layer3",), base_width=8),
        descriptor_extractor=DescriptorExtractor(descriptor_dim=256,
                                                 kernel_size=4),
        matcher=SuperGlueMatcher(input_dim=256, descriptor_dim=256,
                                 num_gnn_layers=1, num_sinkhorn_iterations=5,
                                 image_shape=(96, 96)))
    K = params.max_candidates
    tcm_variables = tcm_net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 96, 96, 3)),
        jnp.zeros((1, 96, 96, 3)), jnp.zeros((1, K, 2), jnp.int32),
        jnp.zeros((1, K, 2), jnp.int32), jnp.zeros((1, K, 2)),
        jnp.zeros((1, K, 2)), jnp.zeros((1, K)), jnp.zeros((1, K)),
        train=False)
    tracker = KeepTrackTracker(params, net, variables, tcm_net=tcm_net,
                               tcm_variables=tcm_variables)
    return tracker, _box_init(tracker)


def _make_tomp():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.tomp import ToMPParams, ToMPTracker
    from tests.test_tomp_tracker import tiny_tompnet

    net = tiny_tompnet(feature_sz=6)
    params = ToMPParams(train_feature_size=6, feature_stride=16,
                        border_mode="replicate", patch_max_scale_change=None,
                        conf_ths=-1.0)
    s = params.image_sample_size
    dummy = jnp.zeros((1, 1, s, s, 3))
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy,
                         jnp.zeros((1, 1, 6, 6)), jnp.zeros((1, 1, 6, 6, 4)),
                         train=False)
    tracker = ToMPTracker(params, net, variables)
    return tracker, _box_init(tracker)


def _make_tamos():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.tamos import TaMOsParams, TaMOsTracker
    from tests.test_tamos import tiny_tamosnet

    K = 3
    params = TaMOsParams(train_feature_size=(4, 6), num_tokens=K,
                         sample_memory_size=2, conf_ths=-1.0)
    net = tiny_tamosnet(K=K, feature_sz=(4, 6))
    Hs, Ws = params.image_sample_size
    tr = jnp.zeros((1, 1, Hs, Ws, 3))
    lab = jnp.zeros((1, 1, K, 4, 6))
    variables = net.init(jax.random.PRNGKey(0), tr, tr, lab, train=False)
    tracker = TaMOsTracker(params, net, variables)

    H, W = 120, 160

    def frame(t):
        im = np.full((H, W, 3), 30, np.uint8)
        im[40 + 2 * t:60 + 2 * t, 40 + 2 * t:60 + 2 * t] = [220, 60, 60]
        im[80:100, 100 + 2 * t:120 + 2 * t] = [60, 220, 60]
        return im

    tracker.initialize(frame(0),
                       {"init_bbox": {"3": [40, 40, 20, 20],
                                      "7": [100, 80, 20, 20]},
                        "init_object_ids": ["3", "7"],
                        "object_ids": ["3", "7"]})

    def step(t):
        tracker.track(frame(t))
    return tracker, step


def _make_lwl():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.lwl import LWLParams, LWLTracker
    from tests.test_lwl import tiny_lwl_net

    net = tiny_lwl_net()
    params = LWLParams(image_sample_size=(64, 64), sample_memory_size=4,
                       net_opt_iter=2, net_opt_update_iter=1, train_skipping=2,
                       border_mode="replicate")
    train_imgs = jnp.zeros((1, 1, 64, 64, 3))
    train_masks = jnp.zeros((1, 1, 64, 64))
    variables = net.init(jax.random.PRNGKey(0), train_imgs, train_imgs,
                         train_masks, num_refinement_iter=0, train=False)
    tracker = LWLTracker(params, net, variables)
    return tracker, _mask_step(tracker)


def _make_rts():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.rts import RTSParams, RTSTracker
    from tests.test_rts import tiny_rts_net

    net = tiny_rts_net()
    params = RTSParams(image_sample_size=(64, 64), sample_memory_size=4,
                       clf_sample_memory_size=6, net_opt_iter=2,
                       net_opt_update_iter=1, clf_net_opt_iter=2,
                       clf_net_opt_update_iter=1, border_mode="replicate",
                       clf_target_not_found_threshold=-1e6)
    train_imgs = jnp.zeros((1, 1, 64, 64, 3))
    train_masks = jnp.zeros((1, 1, 64, 64))
    train_bb = jnp.array([[[20.0, 20.0, 24.0, 24.0]]])
    variables = net.init(jax.random.PRNGKey(0), train_imgs, train_imgs,
                         train_masks, train_bb, num_refinement_iter=0,
                         train=False)
    tracker = RTSTracker(params, net, variables)
    return tracker, _mask_step(tracker)


def _mask_step(tracker):
    frame_and_mask = _mask_frames()
    im0, m0 = frame_and_mask(60, 60)
    out0 = tracker.initialize(im0, {"init_bbox": [48, 48, 24, 24],
                                    "init_mask": m0, "object_ids": ["1"]})
    assert out0["segmentation"].shape == (120, 160)
    prev = {"t": {"segmentation_raw": {"1": m0}}}

    def step(t):
        im, _ = frame_and_mask(60 + 2 * t, 60 + 2 * t)
        out = tracker.track(im, {"previous_output": prev["t"]})
        prev["t"] = {"segmentation_raw":
                     {"1": 1 / (1 + np.exp(-out["segmentation_raw"]))}}
    return step


FAMILIES = {
    "dimp": _make_dimp,
    "atom": _make_atom,
    "eco": _make_eco,
    "kys": _make_kys,
    "keep_track": _make_keep_track,
    "tomp": _make_tomp,
    "tamos": _make_tamos,
    "lwl": _make_lwl,
    "rts": _make_rts,
}


@pytest.mark.filterwarnings("ignore")
@pytest.mark.parametrize("family", sorted(FAMILIES), ids=sorted(FAMILIES))
def test_one_compile_per_program(family):
    tracker, step = FAMILIES[family]()

    step(1)
    after_first = _jit_cache_sizes(tracker)
    # every program that has run compiled exactly once — in particular the
    # FIRST track() after initialize() added no second executable to any
    # wrapper (the r4 TaMOs layout-mismatch claim)
    multi = {k: v for k, v in after_first.items() if v > 1}
    assert not multi, (
        f"{family}: extra compiles after first track "
        f"(one program -> several executables): {multi}")

    step(2)
    step(3)
    after_third = _jit_cache_sizes(tracker)
    # a program may legitimately APPEAR later at exactly one executable (ECO's
    # periodic filter update first runs on its train_skipping frame); what may
    # never happen is any single program owning a second executable
    over = {k: (after_first.get(k, 0), v) for k, v in after_third.items()
            if v > 1}
    assert not over, (
        f"{family}: programs recompiled between track 1 and track 3 "
        f"(name: (after-first, after-third)): {over}")
    assert any(v == 1 for v in after_third.values()), \
        f"{family}: no jitted programs found on the tracker — test is vacuous"
