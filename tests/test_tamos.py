"""TaMOs net + tracker smoke tests (tiny transformer, multi-object synthetic)."""

import math

import numpy as np
import pytest


def tiny_tamosnet(K=3, feature_sz=(4, 6)):
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.classifier.features import ResidualBottleneck
    from pytracking_tpu.models.tracking.tamosnet import FPN, TaMOsNet
    from pytracking_tpu.models.transformer.got_filter_predictor import \
        GOTFilterPredictor
    from pytracking_tpu.models.transformer.heads import (DenseBoxRegressor,
                                                         LinearFilterClassifier)
    from pytracking_tpu.models.transformer.transformer import Transformer

    d = 32
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=8)
    head_fe = ResidualBottleneck(feature_dim=16, num_blocks=0, l2norm=True,
                                 final_conv=True, norm_scale=math.sqrt(1 / d),
                                 out_dim=d)
    transformer = Transformer(d_model=d, nhead=4, num_encoder_layers=2,
                              num_decoder_layers=2, dim_feedforward=64)
    fp = GOTFilterPredictor(transformer, feature_sz=max(feature_sz), num_tokens=K)
    return TaMOsNet(feature_extractor=backbone, head_feature_extractor=head_fe,
                    filter_predictor=fp,
                    classifier=LinearFilterClassifier(num_channels=d),
                    bb_regressor=DenseBoxRegressor(num_channels=d),
                    fpn=FPN(output_dim=d))


@pytest.mark.filterwarnings("ignore")
def test_tamos_tracker_multi_object():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.tamos import TaMOsParams, TaMOsTracker

    K = 3
    params = TaMOsParams(train_feature_size=(4, 6), num_tokens=K, sample_memory_size=2,
                         conf_ths=-1.0)
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

    init_info = {"init_bbox": {"3": [40, 40, 20, 20], "7": [100, 80, 20, 20]},
                 "init_object_ids": ["3", "7"], "object_ids": ["3", "7"]}
    tracker.initialize(frame(0), init_info)
    assert tracker.id_map[0] == "3" and tracker.id_map[1] == "7"

    for t in range(1, 3):
        out = tracker.track(frame(t))
        assert set(out["target_bbox"].keys()) == {"3", "7"}
        for oid, bb in out["target_bbox"].items():
            assert len(bb) == 4 and all(np.isfinite(bb)), (oid, bb)
        assert set(out["object_presence_score"].keys()) == {"3", "7"}


@pytest.mark.filterwarnings("ignore")
def test_tamos_single_object_mode():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.tamos import TaMOsParams, TaMOsTracker

    K = 3
    params = TaMOsParams(train_feature_size=(4, 6), num_tokens=K, sample_memory_size=2)
    net = tiny_tamosnet(K=K)
    Hs, Ws = params.image_sample_size
    tr = jnp.zeros((1, 1, Hs, Ws, 3))
    lab = jnp.zeros((1, 1, K, 4, 6))
    variables = net.init(jax.random.PRNGKey(0), tr, tr, lab, train=False)
    tracker = TaMOsTracker(params, net, variables)

    im = np.full((96, 128, 3), 30, np.uint8)
    im[30:50, 40:60] = [220, 60, 60]
    tracker.initialize(im, {"init_bbox": [40, 30, 20, 20]})
    out = tracker.track(im)
    assert isinstance(out["target_bbox"], list) and len(out["target_bbox"]) == 4
