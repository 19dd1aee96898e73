"""End-to-end DiMP tracker smoke test on a synthetic moving-target sequence.

The net is untrained (random init except the meta-optimizer's structured init), so this
does not test accuracy parity — it tests that the jitted init/track steps run, keep all
state finite, and that online learning latches onto a high-contrast target."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytracking_tpu.models.backbones.resnet import ResNet
from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
from pytracking_tpu.models.classifier.features import ResidualBottleneck
from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
from pytracking_tpu.models.classifier.linear_filter import LinearFilter
from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
from pytracking_tpu.models.tracking.dimpnet import DiMPnet
from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker


def tiny_dimpnet():
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=16)
    # layer2 ch = 16*2*4 = 128?? base_width 16 -> planes (16,32,64,128), expansion 4
    out_dim = 64
    filter_size = 4
    norm_scale = math.sqrt(1.0 / (out_dim * filter_size * filter_size))
    clf_fe = ResidualBottleneck(feature_dim=32, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=norm_scale, out_dim=out_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size, feature_dim=out_dim)
    optimizer = DiMPSteepestDescentGN(num_iter=3, feat_stride=16, init_step_length=0.9,
                                      init_filter_reg=0.1, init_gauss_sigma=0.9,
                                      num_dist_bins=10, bin_displacement=0.5,
                                      mask_init_factor=3.0)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(128, 256), pred_input_dim=(32, 32),
                              pred_inter_dim=(32, 32))
    return DiMPnet(feature_extractor=backbone, classifier=classifier,
                   bb_regressor=bb_regressor, classification_layer="layer3",
                   bb_regressor_layer=("layer2", "layer3"))


def make_frame(cy, cx, sz=20, H=160, W=160):
    im = np.full((H, W, 3), 30.0, np.float32)
    y0, y1 = int(cy - sz / 2), int(cy + sz / 2)
    x0, x1 = int(cx - sz / 2), int(cx + sz / 2)
    im[max(y0, 0):y1, max(x0, 0):x1, 0] = 220.0
    im[max(y0, 0):y1, max(x0, 0):x1, 1] = 60.0
    return im


@pytest.mark.filterwarnings("ignore")
def test_dimp_tracker_end_to_end_synthetic():
    net = tiny_dimpnet()
    # init variables with a representative forward
    params = DiMPParams(
        image_sample_size=96, kernel_size=4, sample_memory_size=8,
        net_opt_iter=3, net_opt_update_iter=1, net_opt_hn_iter=1, train_skipping=5,
        augmentation=(("fliplr", True), ("rotate", (10,)), ("dropout", (1, 0.2))),
        num_init_random_boxes=3, box_refinement_iter=2, iounet_k=2)

    dummy_train = jnp.zeros((1, 1, 96, 96, 3))
    dummy_bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    dummy_prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy_train, dummy_train, dummy_bb,
                         dummy_prop, train=False)

    tracker = DiMPTracker(params, net, variables)

    # target moves diagonally
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(6)]
    frame0 = make_frame(*centers[0])
    tracker.initialize(frame0, {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10,
                                              20, 20]})
    assert tracker.state is not None
    chex_finite = lambda x: np.all(np.isfinite(np.asarray(x)))
    assert chex_finite(tracker.state.target_filter)

    ious = []
    for t in range(1, 6):
        frame = make_frame(*centers[t])
        out = tracker.track(frame)
        bb = out["target_bbox"]
        assert len(bb) == 4 and all(np.isfinite(bb))
        # IoU with ground truth
        gt = [centers[t][1] - 10, centers[t][0] - 10, 20, 20]
        x1, y1 = max(bb[0], gt[0]), max(bb[1], gt[1])
        x2 = min(bb[0] + bb[2], gt[0] + gt[2])
        y2 = min(bb[1] + bb[3], gt[1] + gt[3])
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        iou = inter / (bb[2] * bb[3] + gt[2] * gt[3] - inter + 1e-8)
        ious.append(iou)

    # state stays finite and the tracker doesn't diverge off the target entirely
    assert chex_finite(tracker.state.mem_weights)
    assert chex_finite(tracker.state.pos)
    assert np.mean(ious) > 0.1, f"mean IoU {np.mean(ious):.3f}, per-frame {ious}"
