"""Round-2 depth items: KeepTrack certainty-weighted memory + search-area
rescaling (reference keep_track.py:628-733,228-236) and RTS STA box-init
(reference sta_helper.py:30-70)."""

import math

import numpy as np
import pytest


def _dummy_kt(M=4, K=2, **param_kw):
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.keep_track import (KeepTrackParams,
                                                    KeepTrackState,
                                                    KeepTrackTracker)

    tr = KeepTrackTracker.__new__(KeepTrackTracker)
    tr.params = KeepTrackParams(sample_memory_size=M, **param_kw)
    z2 = jnp.zeros(2)
    state = KeepTrackState(
        pos=z2, target_sz=z2, target_scale=jnp.asarray(1.0), base_target_sz=z2,
        image_sz=jnp.asarray([100.0, 100.0]), min_scale=jnp.asarray(0.1),
        max_scale=jnp.asarray(10.0), target_filter=jnp.zeros((1, 1, 1, 1, 1)),
        mem_samples=jnp.zeros((M, 2, 2, 1)), mem_boxes=jnp.zeros((M, 4)),
        mem_weights=jnp.full((M,), 1.0 / M),
        num_stored=jnp.asarray(M, jnp.int32), num_init=jnp.asarray(1, jnp.int32),
        prev_ind=jnp.asarray(-1, jnp.int32), iou_mod3=jnp.zeros((1, 4)),
        iou_mod4=jnp.zeros((1, 4)), frame_num=jnp.asarray(5, jnp.int32),
        key=jax.random.PRNGKey(0), flag=jnp.asarray(0, jnp.int32),
        max_score=jnp.asarray(0.0), prev_cand_desc=jnp.zeros((K, 8)),
        prev_cand_img_coords=jnp.zeros((K, 2)), prev_cand_scores=jnp.zeros((K,)),
        prev_cand_valid=jnp.zeros((K,), bool),
        prev_cand_frame=jnp.asarray(0, jnp.int32),
        mem_certainties=jnp.array([1.0, 0.2, 0.9, 0.8]),
        target_not_found_counter=jnp.asarray(0, jnp.int32),
        scale_history=jnp.zeros((60,)), scale_history_n=jnp.asarray(0, jnp.int32))
    return tr, state


def test_certainty_memory_replaces_least_certain_slot():
    """The replaced slot is argmin(certainty * weight) over non-init slots
    (reference keep_track.py:633-635,695-697), not argmin(weight)."""
    import jax.numpy as jnp

    tr, state = _dummy_kt(learning_rate=0.5, init_samples_minimum_weight=0.0)
    # equal weights; slot 1 has the lowest certainty -> replaced
    sample = jnp.ones((2, 2, 1))
    box = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    new = tr._update_memory_certainty(state, sample, box, jnp.asarray(0.5),
                                      jnp.asarray(True), jnp.asarray(0.66))
    assert int(new.prev_ind) == 1
    np.testing.assert_allclose(np.asarray(new.mem_certainties)[1], 0.66, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.mem_samples)[1], 1.0)
    # masked off -> state unchanged
    same = tr._update_memory_certainty(state, sample, box, jnp.asarray(0.5),
                                       jnp.asarray(False), jnp.asarray(0.66))
    np.testing.assert_allclose(np.asarray(same.mem_certainties),
                               np.asarray(state.mem_certainties))


def test_certainty_suppresses_low_slots_in_optimizer_weights():
    """Slots below the certainty threshold contribute zero weight to the filter
    optimizer (reference keep_track.py:890-897)."""
    import jax.numpy as jnp

    tr, state = _dummy_kt(learning_rate=0.5,
                          use_certainty_for_weight_computation=True,
                          certainty_for_weight_computation_ths=0.5)
    captured = {}

    def fake_optimizer(weights, feat, bb, sw, num_iter):
        captured["sw"] = sw
        return weights, None

    tr._run_optimizer = fake_optimizer
    # frame_num=5, train_skipping default -> force the periodic branch
    state = state.replace(frame_num=jnp.asarray(1 + tr.params.train_skipping,
                                                jnp.int32))
    tr._update_classifier_certainty(state, jnp.asarray(False), jnp.asarray(True),
                                    jnp.asarray(0.9))
    sw = np.asarray(captured["sw"])[:, 0]
    expect = np.asarray(state.mem_weights) * np.array([1.0, 0.0, 0.9, 0.8])
    np.testing.assert_allclose(sw, expect, atol=1e-6)


def test_search_area_rescaling_grows_scale():
    """After not-found, the scale becomes the mean of the most recent history
    entries that are >= the newest one (reference keep_track.py:228-236)."""
    import jax.numpy as jnp

    tr, state = _dummy_kt()
    # push scales 2.0, 3.0, 1.0 (newest last, as chronological found frames)
    for s in (2.0, 3.0, 1.0):
        state = state.replace(target_scale=jnp.asarray(s))
        state = tr._push_scale_history(state)
    state = state.replace(target_scale=jnp.asarray(0.5))
    new = tr._search_area_rescaling(state)
    # counter 1 -> num_scales=2; kept entries >= newest(1.0): [2.0, 3.0, 1.0],
    # last two = [3.0, 1.0] -> mean 2.0
    np.testing.assert_allclose(float(new.target_scale), 2.0, atol=1e-6)
    assert int(new.target_not_found_counter) == 1
    # found frame resets the counter
    reset = tr._push_scale_history(new)
    assert int(reset.target_not_found_counter) == 0


def _tiny_sta_net():
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.classifier.features import ResidualBasicBlock
    from pytracking_tpu.models.lwl.decoder import LWTLDecoder
    from pytracking_tpu.models.lwl.label_encoder import (ResidualDS16FeatSWBox,
                                                         ResidualDS16SW)
    from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter
    from pytracking_tpu.models.lwl.sta_net import STANet

    d = 32
    nf = 4
    backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                      output_layers=("layer1", "layer2", "layer3", "layer4"),
                      base_width=8)
    tm_feat = ResidualBasicBlock(feature_dim=32, num_blocks=1, l2norm=True,
                                 final_conv=False, norm_scale=math.sqrt(1 / (d * 9)),
                                 out_dim=d)

    def make_tm():
        return LWLLinearFilter(filter_size=3, num_filters=nf, feature_dim=d,
                               num_iter=2, feature_extractor=tm_feat)

    decoder = LWTLDecoder(in_channels=2 * nf, out_channels=8,
                          ft_layers=("layer4", "layer3", "layer2", "layer1"))
    return STANet(feature_extractor=backbone, target_model=make_tm(),
                  target_model_segm=make_tm(), decoder=decoder,
                  label_encoder=ResidualDS16FeatSWBox(layer_dims=(4, 8, 16, 8, nf)),
                  bbox_encoder=ResidualDS16FeatSWBox(layer_dims=(4, 8, 16, 8, nf)),
                  segm_encoder=ResidualDS16SW(layer_dims=(4, 8, 16, nf)))


@pytest.mark.filterwarnings("ignore")
def test_rts_sta_boxinit_mask_confined_to_box():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.rts import RTSParams, RTSTracker
    from tests.test_rts import tiny_rts_net

    net = tiny_rts_net()
    params = RTSParams(image_sample_size=(64, 64), search_area_scale=4.0,
                       sta_image_sample_size=(64, 64), sta_search_area_scale=4.0,
                       net_opt_iter=2, net_opt_update_iter=1,
                       clf_net_opt_iter=2, clf_net_opt_update_iter=1,
                       sample_memory_size=4, clf_sample_memory_size=4)
    dummy = jnp.zeros((1, 1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy,
                         jnp.zeros((1, 1, 64, 64)),
                         jnp.array([[[20.0, 20.0, 20.0, 20.0]]]), train=False)

    sta_net = _tiny_sta_net()
    sta_variables = sta_net.init(jax.random.PRNGKey(1), dummy,
                                 jnp.array([[[20.0, 20.0, 20.0, 20.0]]]),
                                 train=False)

    tracker = RTSTracker(params, net, variables, sta_net=sta_net,
                         sta_variables=sta_variables)
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)
    bbox = [30.0, 28.0, 24.0, 26.0]
    out = tracker.initialize(frame, {"init_bbox": bbox})
    seg = np.asarray(out["segmentation"])
    assert seg.shape == (96, 96)
    # reference clamps scores outside the box to -100 -> mask must be 0 there
    outside = seg.copy()
    outside[28:28 + 26, 30:30 + 24] = 0
    assert outside.sum() == 0
    # a tracking step still runs end-to-end with the STA-initialized mask
    out = tracker.track(rng.randint(0, 255, (96, 96, 3)).astype(np.uint8))
    assert np.all(np.isfinite(out["target_bbox"]))
