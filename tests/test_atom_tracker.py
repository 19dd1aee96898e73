"""End-to-end ATOM tracker smoke test (tiny net, synthetic moving target)."""

import numpy as np
import pytest

from pytracking_tpu.models.backbones.resnet import ResNet
from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
from pytracking_tpu.models.tracking.atomnet import ATOMnet
from pytracking_tpu.trackers.atom import ATOMParams, ATOMTracker
from tests.test_dimp_tracker import make_frame


def tiny_atomnet():
    backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=16)
    bb_regressor = AtomIoUNet(input_dim=(32, 64), pred_input_dim=(32, 32),
                              pred_inter_dim=(32, 32))
    return ATOMnet(feature_extractor=backbone, bb_regressor=bb_regressor)


@pytest.mark.filterwarnings("ignore")
def test_atom_tracker_end_to_end_synthetic():
    import jax
    import jax.numpy as jnp

    net = tiny_atomnet()
    params = ATOMParams(
        max_image_sample_size=96 ** 2, min_image_sample_size=96 ** 2,
        compressed_dim=16, sample_memory_size=10,
        init_CG_iter=12, init_GN_iter=3, CG_iter=2, hard_negative_CG_iter=2,
        train_skipping=4,
        augmentation=(("fliplr", True), ("rotate", (10,)), ("dropout", (1, 0.2))),
        num_init_random_boxes=3, box_refinement_iter=2, iounet_k=2)

    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop, train=False)

    tracker = ATOMTracker(params, net, variables)
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(5)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10, 20, 20]})
    assert tracker.state is not None
    assert np.all(np.isfinite(np.asarray(tracker.state.filt)))
    assert np.all(np.isfinite(np.asarray(tracker.state.proj)))

    for t in range(1, 5):
        out = tracker.track(make_frame(*centers[t]))
        bbox = out["target_bbox"]
        assert len(bbox) == 4 and all(np.isfinite(bbox)), bbox
    assert np.all(np.isfinite(np.asarray(tracker.state.mem_weights)))
