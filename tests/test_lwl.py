"""LWL net + tracker smoke tests (tiny nets, synthetic mask target)."""

import numpy as np
import pytest


def tiny_lwl_net():
    import math

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.classifier.features import ResidualBasicBlock
    from pytracking_tpu.models.lwl.decoder import LWTLDecoder
    from pytracking_tpu.models.lwl.label_encoder import ResidualDS16SW
    from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter
    from pytracking_tpu.models.lwl.lwl_net import LWTLNet

    d = 32
    backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                      output_layers=("layer1", "layer2", "layer3", "layer4"),
                      base_width=8)
    tm_feat = ResidualBasicBlock(feature_dim=32, num_blocks=1, l2norm=True,
                                 final_conv=False,
                                 norm_scale=math.sqrt(1 / (d * 9)), out_dim=d)
    label_encoder = ResidualDS16SW(layer_dims=(4, 8, 16, 4), use_bn=True)
    target_model = LWLLinearFilter(filter_size=3, num_filters=4, feature_dim=d,
                                   num_iter=2, init_filter_reg=0.01,
                                   feature_extractor=tm_feat)
    decoder = LWTLDecoder(in_channels=4, out_channels=8,
                          ft_layers=("layer4", "layer3", "layer2", "layer1"),
                          use_bn=True)
    return LWTLNet(feature_extractor=backbone, target_model=target_model,
                   decoder=decoder, label_encoder=label_encoder)


@pytest.mark.filterwarnings("ignore")
def test_lwl_net_training_forward():
    import jax
    import jax.numpy as jnp

    net = tiny_lwl_net()
    train_imgs = jnp.zeros((1, 1, 64, 64, 3))
    test_imgs = jnp.zeros((2, 1, 64, 64, 3))
    train_masks = jnp.zeros((1, 1, 64, 64)).at[0, 0, 20:40, 20:40].set(1.0)
    variables = net.init(jax.random.PRNGKey(0), train_imgs, test_imgs, train_masks,
                         num_refinement_iter=1, train=False)
    masks = net.apply(variables, train_imgs, test_imgs, train_masks,
                      num_refinement_iter=1, train=False)
    assert masks.shape == (2, 1, 64, 64)
    assert np.all(np.isfinite(np.asarray(masks)))


@pytest.mark.filterwarnings("ignore")
def test_lwl_tracker_end_to_end():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.trackers.lwl import LWLParams, LWLTracker

    net = tiny_lwl_net()
    params = LWLParams(image_sample_size=(64, 64), sample_memory_size=4,
                       net_opt_iter=2, net_opt_update_iter=1,
                       border_mode="replicate")

    train_imgs = jnp.zeros((1, 1, 64, 64, 3))
    train_masks = jnp.zeros((1, 1, 64, 64))
    variables = net.init(jax.random.PRNGKey(0), train_imgs, train_imgs, train_masks,
                         num_refinement_iter=0, train=False)
    tracker = LWLTracker(params, net, variables)

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
        assert np.all(np.isfinite(out["segmentation_raw"]))
        assert len(out["target_bbox"]) == 4
        prev = {"segmentation_raw": {"1": 1 / (1 + np.exp(-out["segmentation_raw"]))}}

    merged = tracker.merge_results({"1": out})
    assert merged["segmentation"].shape == (H, W)
    assert "1" in merged["segmentation_raw"]


def test_sta_net_forward():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.classifier.features import ResidualBasicBlock
    from pytracking_tpu.models.lwl.decoder import LWTLDecoder
    from pytracking_tpu.models.lwl.label_encoder import (ResidualDS16FeatSWBox,
                                                         ResidualDS16SW)
    from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter
    from pytracking_tpu.models.lwl.sta_net import STANet

    import math
    d, K = 32, 4
    backbone = ResNet(block="basic", layers=(1, 1, 1, 1),
                      output_layers=("layer1", "layer2", "layer3", "layer4"),
                      base_width=8)
    tm_feat = ResidualBasicBlock(feature_dim=32, num_blocks=1, l2norm=True,
                                 final_conv=False, norm_scale=math.sqrt(1 / (d * 9)),
                                 out_dim=d)

    def make_tm():
        return LWLLinearFilter(filter_size=3, num_filters=K, feature_dim=d,
                               num_iter=2, feature_extractor=tm_feat)

    net = STANet(
        feature_extractor=backbone, target_model=make_tm(),
        target_model_segm=make_tm(),
        decoder=LWTLDecoder(in_channels=2 * K, out_channels=8,
                            ft_layers=("layer4", "layer3", "layer2", "layer1")),
        label_encoder=ResidualDS16FeatSWBox(layer_dims=(4, 8, 16, 16, K)),
        bbox_encoder=ResidualDS16FeatSWBox(layer_dims=(4, 8, 16, 16, K)),
        segm_encoder=ResidualDS16SW(layer_dims=(4, 8, 16, K)))

    H = 64
    imgs = jnp.zeros((1, 1, H, H, 3))
    bb = jnp.array([[[16.0, 16.0, 24.0, 24.0]]])
    variables = net.init(jax.random.PRNGKey(0), imgs, bb, train=False)
    coarse, refined = net.apply(variables, imgs, bb, train=False)
    assert coarse.shape == (1, 1, H, H)
    assert refined.shape == (1, 1, H, H)
    assert bool(jnp.all(jnp.isfinite(coarse))) and bool(jnp.all(jnp.isfinite(refined)))


def test_lwl_vmapped_multiobject():
    import jax
    import numpy as np

    from pytracking_tpu.trackers.lwl import LWLMultiObjectTracker, LWLParams

    net = tiny_lwl_net()
    H = W = 96
    dummy = __import__("jax.numpy", fromlist=["zeros"]).zeros((1, 1, 64, 64, 3))
    import jax.numpy as jnp
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3)),
                         jnp.zeros((1, 1, 64, 64, 3)), jnp.zeros((1, 1, 64, 64)),
                         num_refinement_iter=0, train=False)
    params = LWLParams(image_sample_size=(64, 64), sample_memory_size=4,
                       net_opt_iter=2, net_opt_update_iter=1)
    tracker = LWLMultiObjectTracker(params, net, variables)

    frame = np.full((H, W, 3), 40, np.float32)
    frame[20:40, 20:40] = 220.0
    frame[60:80, 50:70] = 120.0
    masks = np.zeros((H, W), np.uint8)
    masks[20:40, 20:40] = 1
    masks[60:80, 50:70] = 2
    tracker.initialize(frame, {"init_mask": masks, "object_ids": ["1", "2"]})
    for _ in range(3):
        out = tracker.track(frame)
    assert out["segmentation"].shape == (H, W)
    assert set(out["target_bbox"].keys()) == {"1", "2"}
    assert set(out["segmentation_raw"].keys()) == {"1", "2"}
    # merged label map only contains known ids
    assert set(np.unique(out["segmentation"])) <= {0, 1, 2}
    for oid in ("1", "2"):
        bb = out["target_bbox"][oid]
        assert len(bb) == 4 and all(np.isfinite(bb))


def test_lwl_boxinit_tracker():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytracking_tpu.models.lwl.label_encoder import ResidualDS16FeatSWBox
    from pytracking_tpu.models.lwl.lwl_net import LWTLBoxNet
    from pytracking_tpu.trackers.lwl import LWLParams, LWLTracker

    base = tiny_lwl_net()
    net = LWTLBoxNet(feature_extractor=base.feature_extractor,
                     target_model=base.target_model, decoder=base.decoder,
                     label_encoder=base.label_encoder,
                     box_label_encoder=ResidualDS16FeatSWBox(
                         layer_dims=(4, 8, 16, 16, 4)),
                     target_model_input_layer=base.target_model_input_layer,
                     decoder_input_layers=base.decoder_input_layers)
    imgs = jnp.zeros((1, 1, 64, 64, 3))
    masks = jnp.zeros((1, 1, 64, 64))
    bb = jnp.array([[[20.0, 20.0, 20.0, 20.0]]])
    v_main = net.init(jax.random.PRNGKey(0), imgs, imgs, masks,
                      num_refinement_iter=0, train=False)
    v_box = net.init(jax.random.PRNGKey(1), imgs, bb, train=False,
                     method=net.box_forward)
    variables = {"params": {**v_main["params"], **v_box["params"]},
                 "batch_stats": {**v_main.get("batch_stats", {}),
                                 **v_box.get("batch_stats", {})}}
    params = LWLParams(image_sample_size=(64, 64), sample_memory_size=4,
                       net_opt_iter=2, net_opt_update_iter=1,
                       border_mode="replicate")
    tracker = LWLTracker(params, net, variables)

    frame = np.full((96, 96, 3), 40, np.float32)
    frame[30:60, 30:60] = 220.0
    # NO init_mask — the box encoder must bootstrap it
    tracker.initialize(frame, {"init_bbox": [30.0, 30.0, 30.0, 30.0]})
    out = tracker.track(frame)
    assert out["segmentation"].shape == (96, 96)
    assert all(np.isfinite(out["target_bbox"]))
