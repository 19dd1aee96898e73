"""ToMP model + tracker end-to-end smoke tests (tiny transformer, synthetic target)."""

import math

import numpy as np
import pytest

from tests.test_dimp_tracker import make_frame


def tiny_tompnet(feature_sz=6):
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.classifier.features import ResidualBottleneck
    from pytracking_tpu.models.tracking.tompnet import ToMPnet
    from pytracking_tpu.models.transformer.filter_predictor import FilterPredictor
    from pytracking_tpu.models.transformer.heads import (DenseBoxRegressor, Head,
                                                         LinearFilterClassifier)
    from pytracking_tpu.models.transformer.transformer import Transformer

    d = 64
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer3",), base_width=16)
    norm_scale = math.sqrt(1.0 / d)
    head_fe = ResidualBottleneck(feature_dim=32, num_blocks=0, l2norm=True,
                                 final_conv=True, norm_scale=norm_scale, out_dim=d)
    transformer = Transformer(d_model=d, nhead=4, num_encoder_layers=2,
                              num_decoder_layers=2, dim_feedforward=128)
    fp = FilterPredictor(transformer, feature_sz=feature_sz)
    head = Head(filter_predictor=fp, feature_extractor=head_fe,
                classifier=LinearFilterClassifier(num_channels=d),
                bb_regressor=DenseBoxRegressor(num_channels=d))
    return ToMPnet(feature_extractor=backbone, head=head, head_layer="layer3")


@pytest.mark.filterwarnings("ignore")
def test_tompnet_training_forward():
    import jax
    import jax.numpy as jnp

    net = tiny_tompnet()
    train_imgs = jnp.zeros((2, 2, 96, 96, 3))
    test_imgs = jnp.zeros((1, 2, 96, 96, 3))
    train_label = jnp.zeros((2, 2, 6, 6))
    train_ltrb = jnp.zeros((2, 2, 6, 6, 4))
    variables = net.init(jax.random.PRNGKey(0), train_imgs, test_imgs, train_label,
                         train_ltrb, train=False)
    scores, bbpred = net.apply(variables, train_imgs, test_imgs, train_label,
                               train_ltrb, train=False)
    assert scores.shape == (1, 2, 6, 6, 1)
    assert bbpred.shape == (1, 2, 6, 6, 4)
    assert np.all(np.isfinite(np.asarray(scores)))
    assert np.all(np.asarray(bbpred) > 0)  # exp() output


@pytest.mark.filterwarnings("ignore")
def test_tomp_tracker_end_to_end_synthetic():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.tomp import ToMPParams, ToMPTracker

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

    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(4)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10, 20, 20]})
    assert tracker.state is not None
    for t in range(1, 4):
        out = tracker.track(make_frame(*centers[t]))
        bb = out["target_bbox"]
        assert len(bb) == 4 and all(np.isfinite(bb)), bb
        assert "object_presence_score" in out
    assert np.all(np.isfinite(np.asarray(tracker.state.mem_weights)))
