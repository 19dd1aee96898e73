"""RTS net + tracker smoke tests (tiny nets, synthetic mask target)."""

import math

import numpy as np
import pytest


def tiny_rts_net():
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.classifier.features import (ResidualBasicBlock,
                                                           ResidualBottleneck)
    from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
    from pytracking_tpu.models.classifier.linear_filter import LinearFilter
    from pytracking_tpu.models.classifier.residual_modules import \
        GNSteepestDescentHinge
    from pytracking_tpu.models.lwl.decoder import LWTLDecoder
    from pytracking_tpu.models.lwl.label_encoder import ResidualDS16SW
    from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter
    from pytracking_tpu.models.rts.rts_net import (LearnersFusion, ResidualDS16SWClf,
                                                   RTSNet)

    d = 32
    backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                      output_layers=("layer1", "layer2", "layer3", "layer4"),
                      base_width=8)
    tm_feat = ResidualBasicBlock(feature_dim=32, num_blocks=1, l2norm=True,
                                 final_conv=False, norm_scale=math.sqrt(1 / (d * 9)),
                                 out_dim=d)
    target_model = LWLLinearFilter(filter_size=3, num_filters=4, feature_dim=d,
                                   num_iter=2, feature_extractor=tm_feat)
    label_encoder = ResidualDS16SW(layer_dims=(4, 8, 16, 4))
    decoder = LWTLDecoder(in_channels=4, out_channels=8,
                          ft_layers=("layer4", "layer3", "layer2", "layer1"))
    clf_fe = ResidualBasicBlock(feature_dim=32, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=math.sqrt(1 / (d * 16)),
                                out_dim=d)
    classifier = LinearFilter(
        filter_size=4, filter_initializer=FilterInitializerLinear(
            filter_size=4, filter_norm=False, feature_dim=d),
        filter_optimizer=GNSteepestDescentHinge(num_iter=2, feat_stride=16,
                                                hinge_threshold=0.05,
                                                activation_leak=0.1,
                                                score_act="relu",
                                                learn_filter_reg=False),
        feature_extractor=clf_fe)
    return RTSNet(feature_extractor=backbone, target_model=target_model,
                  decoder=decoder, label_encoder=label_encoder,
                  classifier=classifier,
                  clf_encoder=ResidualDS16SWClf(layer_dims=(4, 8, 16, 4)),
                  fusion_module=LearnersFusion(fusion_type="concat", out_channels=4))


@pytest.mark.filterwarnings("ignore")
def test_rts_tracker_end_to_end():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.rts import RTSParams, RTSTracker

    net = tiny_rts_net()
    params = RTSParams(image_sample_size=(64, 64), sample_memory_size=4,
                       clf_sample_memory_size=6, net_opt_iter=2,
                       net_opt_update_iter=1, clf_net_opt_iter=2,
                       clf_net_opt_update_iter=1, border_mode="replicate",
                       clf_target_not_found_threshold=-1e6)

    train_imgs = jnp.zeros((1, 1, 64, 64, 3))
    train_masks = jnp.zeros((1, 1, 64, 64))
    train_bb = jnp.array([[[20.0, 20.0, 24.0, 24.0]]])
    variables = net.init(jax.random.PRNGKey(0), train_imgs, train_imgs, train_masks,
                         train_bb, num_refinement_iter=0, train=False)
    tracker = RTSTracker(params, net, variables)

    H, W = 120, 160

    def frame_and_mask(cy, cx, sz=24):
        im = np.full((H, W, 3), 40, np.uint8)
        mask = np.zeros((H, W), np.float32)
        y0, y1 = int(cy - sz / 2), int(cy + sz / 2)
        x0, x1 = int(cx - sz / 2), int(cx + sz / 2)
        im[y0:y1, x0:x1] = [220, 60, 60]
        mask[y0:y1, x0:x1] = 1.0
        return im, mask

    im0, m0 = frame_and_mask(60, 60)
    out0 = tracker.initialize(im0, {"init_bbox": [48, 48, 24, 24], "init_mask": m0,
                                    "object_ids": ["1"]})
    assert out0["segmentation"].shape == (H, W)

    prev = {"segmentation_raw": {"1": m0}}
    for t in range(1, 4):
        im, _ = frame_and_mask(60 + 2 * t, 60 + 2 * t)
        out = tracker.track(im, {"previous_output": prev})
        assert out["segmentation"].shape == (H, W)
        assert len(out["target_bbox"]) == 4
        prev = {"segmentation_raw": {"1": 1 / (1 + np.exp(-out["segmentation_raw"]))}}
    assert np.all(np.isfinite(np.asarray(tracker.state.clf_mem_weights)))
