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


def test_device_association_matches_host_collection():
    """_associate_device (fixed K-slot array ops) must reproduce the host
    CandidateCollection's selection, flag, object-0 status, and certainty over
    random multi-frame scenarios, including create / steal / lost / reselect."""
    import jax.numpy as jnp

    from pytracking_tpu.trackers.dimp import FLAG_NORMAL, FLAG_NOT_FOUND
    from pytracking_tpu.trackers.keep_track import (CandidateCollection,
                                                    KeepTrackParams,
                                                    KeepTrackState,
                                                    KeepTrackTracker)

    K = 5
    tr = KeepTrackTracker.__new__(KeepTrackTracker)
    tr.params = KeepTrackParams(max_candidates=K,
                                local_max_candidate_score_th=0.05)

    rng = np.random.RandomState(0)
    for trial in range(20):
        # device state (only the fields association touches)
        dev = dict(assoc_object_ids=jnp.full((K,), -1, jnp.int32),
                   assoc_hist_scores=jnp.zeros((K,)),
                   assoc_selected_oid=jnp.asarray(0, jnp.int32),
                   assoc_certain=jnp.asarray(True),
                   assoc_flag=jnp.asarray(FLAG_NORMAL, jnp.int32),
                   assoc_id_cntr=jnp.asarray(0, jnp.int32),
                   assoc_active=jnp.asarray(False))
        state = KeepTrackState(
            **{f: None for f in KeepTrackState.__dataclass_fields__
               if f not in dev and f != "frame_num"},
            frame_num=jnp.asarray(1, jnp.int32), **dev)

        collection = None
        prev_n = 0
        for step in range(12):
            frame_num = step + 2
            n_valid = rng.randint(1, K + 1)
            scores = np.sort(rng.rand(n_valid))[::-1].astype(np.float32)
            # occasionally drop all candidates below threshold (no matching)
            if rng.rand() < 0.15:
                scores = scores * 0.03
            matches = np.full(K, -1, np.int64)
            mscores = np.zeros(K, np.float32)
            for i in range(n_valid):
                if prev_n > 0 and rng.rand() < 0.7:
                    matches[i] = rng.randint(0, prev_n)
                    mscores[i] = rng.rand()
            cand_scores = np.zeros(K, np.float32)
            cand_scores[:n_valid] = scores
            cand_valid = np.arange(K) < n_valid
            max_score = float(scores[0])

            p1 = {"cand_scores": jnp.asarray(cand_scores),
                  "cand_coords": jnp.stack([jnp.arange(K, dtype=jnp.float32)] * 2,
                                           axis=-1),
                  "cand_valid": jnp.asarray(cand_valid),
                  "matches": jnp.asarray(matches, jnp.int32),
                  "match_scores": jnp.asarray(mscores),
                  "max_score": jnp.asarray(max_score),
                  "prev_frame_gap": jnp.asarray(1, jnp.int32),
                  "default_disp": jnp.asarray([99.0, 99.0]),
                  "default_flag": jnp.asarray(FLAG_NORMAL, jnp.int32)}
            state = state.replace(frame_num=jnp.asarray(frame_num, jnp.int32))
            state, sel_coord, has_cand, flag, cand_score, is_obj0 = \
                tr._associate_device(state, p1)

            # host reference routing (mirrors KeepTrackTracker.track)
            use_matching = max_score >= 0.05 and n_valid > 0
            scores_l = cand_scores[:n_valid].tolist()
            coords_l = [np.array([i, i]) for i in range(n_valid)]
            if not use_matching or collection is None:
                host_cid, host_flag = None, None
                if use_matching:
                    collection = CandidateCollection(
                        scores_l, coords_l,
                        candidate_selection_is_certain=frame_num < 10)
                else:
                    collection = None
                assert not bool(has_cand), (trial, step)
            else:
                collection.update(scores_l, coords_l, matches[:n_valid].tolist(),
                                  mscores[:n_valid].tolist())
                host_cid = collection.candidate_id_of_selected_candidate
                if host_cid is None or host_cid >= n_valid:
                    assert not bool(has_cand) or int(flag) == FLAG_NOT_FOUND, \
                        (trial, step)
                else:
                    assert bool(has_cand), (trial, step)
                    assert int(np.asarray(sel_coord)[0]) == host_cid, \
                        (trial, step, host_cid, np.asarray(sel_coord))
                    host_flag = {"normal": FLAG_NORMAL,
                                 "not_found": FLAG_NOT_FOUND}[collection.flag]
                    assert int(flag) == host_flag, (trial, step)
                    assert abs(float(cand_score) - scores_l[host_cid]) < 1e-6

            host_obj0 = (collection is None
                         or collection.object_id_of_selected_candidate == 0)
            assert bool(is_obj0) == host_obj0, (trial, step)
            if collection is not None:
                assert bool(state.assoc_certain) == \
                    collection.candidate_selection_is_certain, (trial, step)
            prev_n = n_valid if use_matching else 0
            if not use_matching:
                # device keeps assoc_active=False; host dropped the collection
                assert not bool(state.assoc_active)


@pytest.mark.filterwarnings("ignore")
def test_keep_track_device_association_end_to_end():
    """device_association=True: ONE jitted dispatch per frame, scan-able."""
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.tcm.superglue import SuperGlueMatcher
    from pytracking_tpu.models.tcm.target_candidate_matching import (
        DescriptorExtractor, TargetCandidateMatchingNetwork)
    from pytracking_tpu.trackers.keep_track import (KeepTrackParams,
                                                    KeepTrackTracker)
    from tests.test_dimp_tracker import make_frame, tiny_dimpnet

    net = tiny_dimpnet()
    params = KeepTrackParams(
        image_sample_size=96, search_area_scale=5.0, border_mode="replicate",
        patch_max_scale_change=None, kernel_size=4, sample_memory_size=8,
        net_opt_iter=3, net_opt_update_iter=1, train_skipping=5,
        augmentation=(("fliplr", True),), num_init_random_boxes=3,
        box_refinement_iter=2, iounet_k=2, max_candidates=4)
    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                         train=False)
    tcm_backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                          output_layers=("layer3",), base_width=8)
    tcm_net = TargetCandidateMatchingNetwork(
        feature_extractor=tcm_backbone,
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
                               tcm_variables=tcm_variables,
                               device_association=True)
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(4)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10,
                                      20, 20]})
    for t in range(1, 3):
        out = tracker.track(make_frame(*centers[t]))
        assert all(np.isfinite(out["target_bbox"])), out
        assert np.isfinite(out["object_presence_score"])

    # the fused step is scan-able: one dispatch over the remaining frames
    frames = jnp.stack([jnp.asarray(make_frame(*centers[3]))])

    def scan_fn(variables, st, fs):
        prev = tracker.variables
        tracker.variables = variables
        try:
            return jax.lax.scan(tracker._track_impl, st, fs)
        finally:
            tracker.variables = prev

    st, outs = jax.jit(scan_fn)(tracker.variables, tracker.state, frames)
    assert np.all(np.isfinite(np.asarray(outs["target_bbox"])))
