"""KeepTrack matcher + tracker smoke tests (tiny nets, synthetic target)."""

import numpy as np
import pytest


def test_sinkhorn_assignment_rows_sum():
    import jax.numpy as jnp

    from pytracking_tpu.models.tcm.superglue import log_optimal_transport

    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(2, 4, 5), jnp.float32)
    Z = log_optimal_transport(scores, jnp.asarray(1.0), iters=30)
    P = np.exp(np.asarray(Z))
    # each row (incl. dustbin weighting) sums to ~(M+N)*mu = 1 for real rows
    np.testing.assert_allclose(P[:, :-1, :].sum(-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(P[:, :, :-1].sum(1), 1.0, atol=1e-3)


def test_candidate_collection_bookkeeping():
    from pytracking_tpu.trackers.keep_track import CandidateCollection

    cc = CandidateCollection([0.9, 0.3], [np.array([5, 5]), np.array([10, 10])])
    assert cc.candidate_id_of_selected_candidate == 0
    # next frame: both candidates matched to their predecessors
    cc.update([0.85, 0.35], [np.array([5, 6]), np.array([10, 11])],
              matches=[0, 1], match_scores=[0.95, 0.9])
    assert cc.flag == "normal"
    assert cc.candidate_id_of_selected_candidate == 0
    # target disappears: candidate 0 gone, only the distractor remains with low score
    cc.update([0.1], [np.array([10, 12])], matches=[1], match_scores=[0.9])
    assert cc.flag == "not_found"
    # distractor score rises -> reselect
    cc.update([0.4], [np.array([10, 13])], matches=[0], match_scores=[0.9])
    assert cc.flag == "normal"


@pytest.mark.filterwarnings("ignore")
def test_keep_track_tracker_end_to_end():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.tcm.superglue import SuperGlueMatcher
    from pytracking_tpu.models.tcm.target_candidate_matching import (
        DescriptorExtractor, TargetCandidateMatchingNetwork)
    from pytracking_tpu.trackers.keep_track import KeepTrackParams, KeepTrackTracker
    from tests.test_dimp_tracker import make_frame, tiny_dimpnet

    net = tiny_dimpnet()
    params = KeepTrackParams(
        image_sample_size=96, search_area_scale=5.0, border_mode="replicate",
        patch_max_scale_change=None, kernel_size=4, sample_memory_size=8,
        net_opt_iter=3, net_opt_update_iter=1, train_skipping=5,
        augmentation=(("fliplr", True), ("dropout", (1, 0.2))),
        num_init_random_boxes=3, box_refinement_iter=2, iounet_k=2,
        max_candidates=4)

    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop, train=False)

    tcm_backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                          output_layers=("layer3",), base_width=8)
    tcm_net = TargetCandidateMatchingNetwork(
        feature_extractor=tcm_backbone,
        descriptor_extractor=DescriptorExtractor(descriptor_dim=256, kernel_size=4),
        matcher=SuperGlueMatcher(input_dim=256, descriptor_dim=256, num_gnn_layers=1,
                                 num_sinkhorn_iterations=5, image_shape=(96, 96)))
    K = params.max_candidates
    tcm_variables = tcm_net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 96, 96, 3)), jnp.zeros((1, 96, 96, 3)),
        jnp.zeros((1, K, 2), jnp.int32), jnp.zeros((1, K, 2), jnp.int32),
        jnp.zeros((1, K, 2)), jnp.zeros((1, K, 2)), jnp.zeros((1, K)),
        jnp.zeros((1, K)), train=False)

    tracker = KeepTrackTracker(params, net, variables, tcm_net=tcm_net,
                               tcm_variables=tcm_variables)
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(4)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10, 20, 20]})
    for t in range(1, 4):
        out = tracker.track(make_frame(*centers[t]))
        bbx = out["target_bbox"]
        assert len(bbx) == 4 and all(np.isfinite(bbx)), bbx
    assert np.all(np.isfinite(np.asarray(tracker.state.prev_cand_scores)))
