"""Smoke tests for the KYS / KeepTrack-TCM / TaMOs / RTS training actors and the
multi-epoch loader: each actor must produce a finite loss and finite gradients on a
tiny net (reference actors in ltr/actors/tracking.py:197,473,584 and
ltr/actors/segmentation.py:143)."""

import math

import numpy as np
import pytest


def _finite_tree(tree):
    import jax

    return all(bool(np.all(np.isfinite(x))) for x in jax.tree_util.tree_leaves(tree))


def test_kys_actor_loss_and_grads():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
    from pytracking_tpu.models.classifier.features import ResidualBottleneck
    from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
    from pytracking_tpu.models.classifier.linear_filter import LinearFilter
    from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
    from pytracking_tpu.models.kys.response_predictor import ResponsePredictor
    from pytracking_tpu.models.tracking.kysnet import KYSNet
    from pytracking_tpu.training.actors.tracking import make_kys_actor

    d = 32
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=8)
    clf_fe = ResidualBottleneck(feature_dim=16, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=math.sqrt(1 / (d * 16)),
                                out_dim=d)
    classifier = LinearFilter(
        filter_size=4,
        filter_initializer=FilterInitializerLinear(filter_size=4, feature_dim=d),
        filter_optimizer=DiMPSteepestDescentGN(num_iter=2, feat_stride=16,
                                               num_dist_bins=10,
                                               bin_displacement=0.5),
        feature_extractor=clf_fe)
    net = KYSNet(feature_extractor=backbone, classifier=classifier,
                 bb_regressor=AtomIoUNet(input_dim=(64, 128),
                                         pred_input_dim=(16, 16),
                                         pred_inter_dim=(16, 16)),
                 classification_layer="layer3", bb_regressor_layer=("layer2",
                                                                    "layer3"),
                 predictor=ResponsePredictor(state_dim=4,
                                             representation_predictor_dims=(8,),
                                             conf_measure="entropy",
                                             dimp_thresh=0.05),
                 max_displacement=2)

    S, T, H = 2, 4, 64
    h = H // 16
    rng = np.random.RandomState(0)
    dummy = jnp.zeros((1, S, H, H, 3))
    bb = jnp.tile(jnp.array([[[20.0, 20.0, 24.0, 24.0]]]), (1, S, 1))
    prop = bb[:, :, None]
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop, train=False)
    mf = jnp.zeros((S, h, h, d))
    ds = jnp.zeros((S, h, h, 1))
    v_pred = net.init(
        jax.random.PRNGKey(1), mf, mf, None, ds, ds,
        method=lambda m, a, b, c, e, f: m.predict_response(a, b, c, e, init_label=f))
    params = {**variables["params"], **v_pred["params"]}
    variables = {"params": params,
                 "batch_stats": {**variables.get("batch_stats", {}),
                                 **v_pred.get("batch_stats", {})}}

    batch = {
        "train_images": jnp.asarray(rng.rand(1, S, H, H, 3) * 255, jnp.float32),
        "train_anno": bb,
        "test_images": jnp.asarray(rng.rand(T, S, H, H, 3) * 255, jnp.float32),
        "test_label": jnp.asarray(
            np.exp(-0.5 * ((np.mgrid[0:h, 0:h] - h / 2) ** 2).sum(0))[None, None]
            * np.ones((T, S, 1, 1)), jnp.float32),
    }
    actor = make_kys_actor(net, train=False)
    loss_fn = lambda p: actor(p, variables.get("batch_stats"), batch)[0]
    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    assert _finite_tree(grads)


def test_tcm_actor_loss_and_grads():
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.tcm.superglue import SuperGlueMatcher
    from pytracking_tpu.models.tcm.target_candidate_matching import (
        DescriptorExtractor, TargetCandidateMatchingNetwork)
    from pytracking_tpu.training.actors.tracking import make_tcm_actor

    net = TargetCandidateMatchingNetwork(
        feature_extractor=ResNet(block="basic", layers=(1, 1, 1, 1),
                                 output_layers=("layer3",), base_width=8),
        descriptor_extractor=DescriptorExtractor(descriptor_dim=64, kernel_size=4),
        matcher=SuperGlueMatcher(input_dim=64, descriptor_dim=64, num_gnn_layers=1,
                                 num_sinkhorn_iterations=5, image_shape=(64, 64)))
    S, K = 2, 4
    rng = np.random.RandomState(0)
    batch = {
        "img0": jnp.asarray(rng.rand(S, 64, 64, 3) * 255, jnp.float32),
        "img1": jnp.asarray(rng.rand(S, 64, 64, 3) * 255, jnp.float32),
        "tsm_coords0": jnp.asarray(rng.randint(0, 4, (S, K, 2)), jnp.int32),
        "tsm_coords1": jnp.asarray(rng.randint(0, 4, (S, K, 2)), jnp.int32),
        "img_coords0": jnp.asarray(rng.rand(S, K, 2) * 64, jnp.float32),
        "img_coords1": jnp.asarray(rng.rand(S, K, 2) * 64, jnp.float32),
        "scores0": jnp.asarray(rng.rand(S, K), jnp.float32),
        "scores1": jnp.asarray(rng.rand(S, K), jnp.float32),
        "gt_assignment": jnp.eye(K)[None].repeat(S, 0),
        "gt_matches0": jnp.tile(jnp.arange(K)[None], (S, 1)),
        "gt_matches1": jnp.tile(jnp.arange(K)[None], (S, 1)),
    }
    variables = net.init(jax.random.PRNGKey(0), batch["img0"], batch["img1"],
                         batch["tsm_coords0"], batch["tsm_coords1"],
                         batch["img_coords0"], batch["img_coords1"],
                         batch["scores0"], batch["scores1"], train=False)
    actor = make_tcm_actor(net, train=False)
    loss_fn = lambda p: actor(p, variables.get("batch_stats"), batch)[0]
    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    assert _finite_tree(grads)
    _, (stats, _) = actor(variables["params"], variables.get("batch_stats"), batch)
    assert "match_recall" in stats and "Loss/nll_pos" in stats


def test_tamos_actor_loss():
    import jax
    import jax.numpy as jnp

    from test_tamos import tiny_tamosnet
    from pytracking_tpu.training.actors.tracking import make_tamos_actor

    K, fs = 2, (4, 4)
    net = tiny_tamosnet(K=K, feature_sz=fs)
    S, H = 1, 64
    h2 = H // 8  # high-res FPN level = stride 8
    rng = np.random.RandomState(0)
    train_images = jnp.asarray(rng.rand(1, S, H, H, 3) * 255, jnp.float32)
    test_images = jnp.asarray(rng.rand(1, S, H, H, 3) * 255, jnp.float32)
    train_label = jnp.asarray(rng.rand(1, S, K, H // 16, H // 16), jnp.float32)
    train_ltrb = jnp.asarray(rng.rand(1, S, K, 4, H // 16, H // 16), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), train_images, test_images,
                         train_label, train_ltrb, train=False)
    batch = {
        "train_images": train_images, "test_images": test_images,
        "train_label": train_label, "train_ltrb_target": train_ltrb,
        "test_label": jnp.asarray(rng.rand(1, S, h2, h2, K), jnp.float32),
        "test_ltrb_target": jnp.asarray(rng.rand(1, S, h2, h2, K, 4),
                                        jnp.float32),
        "test_sample_region": jnp.ones((1, S, h2, h2, K), jnp.float32),
    }
    actor = make_tamos_actor(net, train=False)
    loss, (stats, _) = actor(variables["params"], variables.get("batch_stats"),
                             batch)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["Loss/giou"]))


def test_rts_actor_loss():
    import jax
    import jax.numpy as jnp

    from test_rts import tiny_rts_net
    from pytracking_tpu.training.actors.tracking import make_rts_actor

    net = tiny_rts_net()
    S, H = 1, 64
    rng = np.random.RandomState(0)
    train_images = jnp.asarray(rng.rand(1, S, H, H, 3) * 255, jnp.float32)
    test_images = jnp.asarray(rng.rand(1, S, H, H, 3) * 255, jnp.float32)
    train_masks = jnp.zeros((1, S, H, H)).at[:, :, 20:40, 20:40].set(1.0)
    train_bb = jnp.array([[[20.0, 20.0, 20.0, 20.0]]])
    variables = net.init(jax.random.PRNGKey(0), train_images, test_images,
                         train_masks, train_bb, train=False)
    batch = {
        "train_images": train_images, "test_images": test_images,
        "train_masks": train_masks, "train_anno": train_bb,
        "test_masks": train_masks,
        "test_label": jnp.asarray(rng.rand(1, S, H // 16, H // 16), jnp.float32),
    }
    actor = make_rts_actor(net, train=False)
    loss, (stats, _) = actor(variables["params"], variables.get("batch_stats"),
                             batch)
    assert np.isfinite(float(loss))


def test_multi_epoch_loader_persists_across_epochs():
    from pytracking_tpu.training.loader import MultiEpochLTRLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.full((2, 3), i % 8, np.float32)}

    loader = MultiEpochLTRLoader("train", DS(), batch_size=4, num_workers=2,
                                 prefetch=1)
    e1 = list(loader)
    e2 = list(loader)
    assert len(e1) == 2 and len(e2) == 2
    assert e1[0]["x"].shape == (2, 4, 3) or e1[0]["x"].shape[1] == 4
