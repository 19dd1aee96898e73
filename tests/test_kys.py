"""KYS cost volume / predictor / tracker smoke tests."""

import numpy as np
import pytest


def test_cost_volume_abs_matches_manual():
    import jax.numpy as jnp

    from pytracking_tpu.models.kys.cost_volume import cost_volume_abs

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, 4, 4, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(1, 4, 4, 3), jnp.float32)
    cv = cost_volume_abs(f1, f2, max_displacement=1)
    assert cv.shape == (1, 16, 4, 4)
    # kernel_size=1: entry [p*W+q, i, j] = <f1[i,j], f2[p,q]> inside the window
    manual = float(np.dot(np.asarray(f1[0, 1, 1]), np.asarray(f2[0, 2, 2])))
    assert abs(float(cv[0, 2 * 4 + 2, 1, 1]) - manual) < 1e-5
    # outside window -> 0
    assert float(cv[0, 3 * 4 + 3, 0, 0]) == 0.0

    # kernel_size=3: diagonal box-sum of the k=1 volume (sampler semantics)
    cv3 = cost_volume_abs(f1, f2, max_displacement=1, kernel_size=3)
    manual3 = sum(
        float(np.dot(np.asarray(f1[0, 1 + u, 1 + v]), np.asarray(f2[0, 2 + u, 2 + v])))
        for u in (-1, 0, 1) for v in (-1, 0, 1)
        if 0 <= 1 + u < 4 and 0 <= 1 + v < 4 and 0 <= 2 + u < 4 and 0 <= 2 + v < 4)
    assert abs(float(cv3[0, 2 * 4 + 2, 1, 1]) - manual3) < 1e-5


@pytest.mark.filterwarnings("ignore")
def test_kys_tracker_end_to_end():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
    from pytracking_tpu.models.classifier.features import ResidualBottleneck
    from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
    from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
    from pytracking_tpu.models.classifier.linear_filter import LinearFilter
    from pytracking_tpu.models.kys.response_predictor import ResponsePredictor
    from pytracking_tpu.models.tracking.kysnet import KYSNet
    from pytracking_tpu.trackers.kys import KYSParams, KYSTracker
    from tests.test_dimp_tracker import make_frame

    import math
    d = 64
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=16)
    clf_fe = ResidualBottleneck(feature_dim=32, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=math.sqrt(1 / (d * 16)),
                                out_dim=d)
    initializer = FilterInitializerLinear(filter_size=4, feature_dim=d)
    optimizer = DiMPSteepestDescentGN(num_iter=2, feat_stride=16, num_dist_bins=10,
                                      bin_displacement=0.5)
    classifier = LinearFilter(filter_size=4, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(128, 256), pred_input_dim=(32, 32),
                              pred_inter_dim=(32, 32))
    predictor = ResponsePredictor(state_dim=4, representation_predictor_dims=(8,),
                                  conf_measure="entropy", dimp_thresh=0.05)
    net = KYSNet(feature_extractor=backbone, classifier=classifier,
                 bb_regressor=bb_regressor, classification_layer="layer3",
                 bb_regressor_layer=("layer2", "layer3"), predictor=predictor,
                 max_displacement=3)

    params = KYSParams(image_sample_size=96, kernel_size=4, sample_memory_size=6,
                       net_opt_iter=2, net_opt_update_iter=1, train_skipping=4,
                       augmentation=(("fliplr", True), ("dropout", (1, 0.2))),
                       num_init_random_boxes=3, box_refinement_iter=2, iounet_k=2)

    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    # init variables: training forward of the DiMP part + a predictor call
    v_main = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop, train=False)
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
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(4)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10, 20, 20]})
    for t in range(1, 4):
        out = tracker.track(make_frame(*centers[t]))
        bbx = out["target_bbox"]
        assert len(bbx) == 4 and all(np.isfinite(bbx)), bbx
    assert np.all(np.isfinite(np.asarray(tracker.state.state_vector)))
