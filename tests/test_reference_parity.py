"""Full-network numerical parity vs the reference torch implementation.

For every model family: build the reference net from /root/reference with RANDOM
weights, port its state_dict through pytracking_tpu.utils.port_weights, and assert the
flax forward equals the torch forward on fixed inputs. This proves the porting maps are
correct and the architectures match — so published reference checkpoints load with
accuracy parity.

Tolerances: backbone stacks accumulate f32 rounding across ~50 convs, so low-1e-3
absolute on unit-scale features; heads get tighter bounds.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference checkout not available", allow_module_level=True)

import tests.refshim  # noqa: F401  (installs torchvision/timm/... shims + sys.path)

import jax
import jax.numpy as jnp

from pytracking_tpu.utils import port_weights as pw


def to_nhwc(t: "torch.Tensor") -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def from_torch(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy()


def randomize_bn_stats(module, seed=0):
    """Random running stats so eval-mode BN actually tests the ported stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def normalized(im_raw: "torch.Tensor") -> "torch.Tensor":
    """[0,255] NCHW -> imagenet-normalized (what the reference nets consume)."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return (im_raw / 255.0 - mean) / std


def rand_images(g, n, size=96):
    return torch.rand((n, 3, size, size), generator=g) * 255.0


def assert_close(mine, ref_nchw_tensor, atol, what, transpose=True):
    ref = from_torch(ref_nchw_tensor)
    if transpose and ref.ndim == 4:
        ref = ref.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(mine), ref.reshape(np.asarray(mine).shape),
                               atol=atol, rtol=1e-4, err_msg=what)


# ============================================================ DiMP family helper

def _dimp_family_parity(ref, net, variables, backbone_layers=("layer2", "layer3"),
                        with_iou=True, score_atol=2e-3, ref_classifier=None):
    """Common comparisons for DiMPnet-structured nets: backbone, clf feat, filter
    init + optimizer + classify, IoU-Net. Returns (my_feat, ref_feat) for extra
    family-specific checks."""
    if ref_classifier is None:
        ref_classifier = ref.classifier
    g = torch.Generator().manual_seed(1)
    im = rand_images(g, 2)

    with torch.no_grad():
        ref_feat = ref.extract_backbone_features(normalized(im))
    my_feat = net.apply(variables, jnp.asarray(from_torch(im).transpose(0, 2, 3, 1)),
                        method=lambda m, x: m.extract_backbone(x))
    for layer in backbone_layers:
        assert_close(my_feat[layer], ref_feat[layer], 1e-3, layer)

    with torch.no_grad():
        ref_clf = ref.extract_classification_feat(ref_feat)
    my_clf = net.apply(variables, my_feat,
                       method=lambda m, f: m.extract_classification_feat(f))
    assert_close(my_clf, ref_clf, 1e-3, "clf_feat")

    bb = torch.tensor([[20.0, 25.0, 40.0, 35.0], [30.0, 20.0, 30.0, 45.0]])
    train_feat_t = ref_clf.view(2, 1, *ref_clf.shape[-3:])
    bb_t = bb.view(2, 1, 4)
    with torch.no_grad():
        ref_w, _, _ = ref_classifier.get_filter(train_feat_t, bb_t)
        ref_scores = ref_classifier.classify(ref_w, train_feat_t)

    my_train_feat = my_clf.reshape(2, 1, *my_clf.shape[1:])
    my_w, _, _ = net.apply(
        variables, my_train_feat, jnp.asarray(bb.numpy()).reshape(2, 1, 4),
        method=lambda m, f, b: m.clf_get_filter(f, b))
    my_scores = net.apply(variables, my_w, my_train_feat,
                          method=lambda m, w, f: m.clf_classify(w, f))
    np.testing.assert_allclose(np.asarray(my_scores)[..., 0],
                               from_torch(ref_scores), atol=score_atol, rtol=1e-4,
                               err_msg="classifier scores after optimization")

    if with_iou:
        feats_nchw = [ref_feat[l] for l in backbone_layers]
        with torch.no_grad():
            ref_mod = ref.bb_regressor.get_modulation(feats_nchw, bb)
            ref_iou_feat = ref.bb_regressor.get_iou_feat(feats_nchw)
            props = torch.rand((2, 7, 4), generator=g) * 40 + 5
            ref_iou = ref.bb_regressor.predict_iou(ref_mod, ref_iou_feat, props)

        my_mod = net.apply(variables, my_feat, jnp.asarray(bb.numpy()),
                           method=lambda m, f, b: m.iou_get_modulation(f, b))
        my_iou_feat = net.apply(variables, my_feat,
                                method=lambda m, f: m.iou_get_iou_feat(f))
        for i, (a, b_) in enumerate(zip(my_mod, ref_mod)):
            assert_close(a, b_, 2e-3, f"iou modulation {i}", transpose=False)
        my_iou = net.apply(variables, my_mod, my_iou_feat,
                           jnp.asarray(props.numpy()),
                           method=lambda m, mo, f, p: m.iou_predict(mo, f, p))
        assert_close(my_iou, ref_iou, 2e-3, "iou prediction", transpose=False)

    return my_feat, ref_feat


# =================================================================== DiMP-50

def test_dimpnet50_full_parity():
    import ltr.models.tracking.dimpnet as ref_dimpnet

    from pytracking_tpu.models.tracking.dimpnet import dimpnet50

    torch.manual_seed(0)
    # dimp50 recipe args (reference train_settings/dimp/dimp50.py:91-95) — the
    # reference FACTORY defaults differ (filter_size=1, num_dist_bins=5)
    ref = ref_dimpnet.dimpnet50(
        backbone_pretrained=False, filter_size=4, optim_iter=3, clf_feat_norm=True,
        clf_feat_blocks=0, final_conv=True, out_feature_dim=512,
        optim_init_step=0.9, optim_init_reg=0.1, init_gauss_sigma=0.9,
        num_dist_bins=100, bin_displacement=0.1, mask_init_factor=3.0,
        target_mask_act="sigmoid", score_act="relu")
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_dimpnet(sd, layers=(3, 4, 6, 3), block="bottleneck")
    net = dimpnet50(optim_iter=3)
    _dimp_family_parity(ref, net, variables)


# =================================================================== DiMP-18

def test_dimpnet18_full_parity():
    import ltr.models.tracking.dimpnet as ref_dimpnet

    from pytracking_tpu.models.tracking.dimpnet import dimpnet18

    torch.manual_seed(0)
    # dimp18 recipe args (reference train_settings/dimp/dimp18.py:91-94)
    ref = ref_dimpnet.dimpnet18(
        backbone_pretrained=False, filter_size=4, optim_iter=3, clf_feat_norm=True,
        final_conv=True, optim_init_step=0.9, optim_init_reg=0.1,
        init_gauss_sigma=0.9, num_dist_bins=100, bin_displacement=0.1,
        mask_init_factor=3.0, target_mask_act="sigmoid", score_act="relu")
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_dimpnet(sd, layers=(2, 2, 2, 2), block="basic",
                                clf_feat_blocks=1)
    net = dimpnet18(optim_iter=3)
    _dimp_family_parity(ref, net, variables)


# =================================================================== ATOM

def test_atomnet_full_parity():
    import ltr.models.bbreg.atom as ref_atom

    from pytracking_tpu.models.tracking.atomnet import atom_resnet18

    torch.manual_seed(0)
    ref = ref_atom.atom_resnet18(backbone_pretrained=False)
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_atomnet(sd)
    net = atom_resnet18()

    g = torch.Generator().manual_seed(1)
    im = rand_images(g, 2)
    with torch.no_grad():
        ref_feat = ref.extract_backbone_features(normalized(im))
    my_feat = net.apply(variables, jnp.asarray(from_torch(im).transpose(0, 2, 3, 1)),
                        method=lambda m, x: m.extract_backbone(x))
    for layer in ("layer2", "layer3"):
        assert_close(my_feat[layer], ref_feat[layer], 1e-3, layer)

    bb = torch.tensor([[20.0, 25.0, 40.0, 35.0], [30.0, 20.0, 30.0, 45.0]])
    feats_nchw = [ref_feat["layer2"], ref_feat["layer3"]]
    with torch.no_grad():
        ref_mod = ref.bb_regressor.get_modulation(feats_nchw, bb)
        ref_iou_feat = ref.bb_regressor.get_iou_feat(feats_nchw)
        props = torch.rand((2, 7, 4), generator=g) * 40 + 5
        ref_iou = ref.bb_regressor.predict_iou(ref_mod, ref_iou_feat, props)
    my_mod = net.apply(variables, my_feat, jnp.asarray(bb.numpy()),
                       method=lambda m, f, b: m.iou_get_modulation(f, b))
    my_iou_feat = net.apply(variables, my_feat,
                            method=lambda m, f: m.iou_get_iou_feat(f))
    for i, (a, b_) in enumerate(zip(my_mod, ref_mod)):
        assert_close(a, b_, 2e-3, f"iou modulation {i}", transpose=False)
    my_iou = net.apply(variables, my_mod, my_iou_feat, jnp.asarray(props.numpy()),
                       method=lambda m, mo, f, p: m.iou_predict(mo, f, p))
    assert_close(my_iou, ref_iou, 2e-3, "iou prediction", transpose=False)


# =================================================================== KYS

def test_kysnet_full_parity():
    import ltr.models.tracking.kysnet as ref_kysnet

    from pytracking_tpu.models.kys.cost_volume import cost_volume_abs
    from pytracking_tpu.models.tracking.kysnet import kysnet_res50

    torch.manual_seed(0)
    # kys recipe args (reference train_settings/kys/kys.py:110-114)
    ref = ref_kysnet.kysnet_res50(
        backbone_pretrained=False, optim_iter=3, cv_kernel_size=3,
        cv_max_displacement=9, cv_stride=1, init_gauss_sigma=0.9,
        train_feature_extractor=False, train_iounet=False, detach_length=0,
        state_dim=8, representation_predictor_dims=(16,), conf_measure="entropy",
        dimp_thresh=0.05)
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_kysnet(sd)
    net = kysnet_res50(optim_iter=3, init_gauss_sigma=0.9, state_dim=8,
                       representation_predictor_dims=(16,), conf_measure="entropy",
                       dimp_thresh=0.05)
    _dimp_family_parity(ref, net, variables, ref_classifier=ref.dimp_classifier)

    # ---- motion branch: cost volume + response predictor, two steps
    g = torch.Generator().manual_seed(3)
    B, H, W, C, D = 2, 12, 12, 512, 8
    feat_prev = torch.randn(B, C, H, W, generator=g)
    feat_cur = torch.randn(B, C, H, W, generator=g)
    dimp_score = torch.rand(B, 1, H, W, generator=g)
    init_label = torch.rand(B, 1, H, W, generator=g)

    with torch.no_grad():
        ref_cv = ref.predictor.compute_cost_volume(feat_prev, feat_cur, True)
    my_cv = cost_volume_abs(to_nhwc(feat_cur), to_nhwc(feat_prev),
                            max_displacement=9, kernel_size=3)
    np.testing.assert_allclose(np.asarray(my_cv), from_torch(ref_cv), atol=1e-2,
                               rtol=1e-4, err_msg="cost volume")

    # compare through the reference WRAPPER (predictor_wrapper.predict_response)
    # so the fix_coordinate_shift quarter-cell shifts are covered (round-4 fix:
    # the earlier inner-predictor comparison missed them)
    with torch.no_grad():
        ref_out = ref.predictor.predict_response(
            {"feat1": feat_prev, "feat2": feat_cur, "label_prev": init_label,
             "dimp_score_cur": dimp_score, "state_prev": None})
        ref_fused, ref_state = ref_out["response"], ref_out["state_cur"]
    my_fused, my_state, _ = net.apply(
        variables, to_nhwc(feat_prev), to_nhwc(feat_cur), None,
        to_nhwc(dimp_score), to_nhwc(init_label),
        method=lambda m, fp, fc, s, d, i: m.predict_response(
            fp, fc, s, d, init_label=i))
    # interior only: torch grid_sample zero-pads the quarter-cell shift at the
    # borders while our bilinear sampler clamps — a one-row/col edge effect
    np.testing.assert_allclose(
        np.asarray(my_fused)[:, 1:-1, 1:-1, 0],
        from_torch(ref_fused)[:, 0, 1:-1, 1:-1], atol=1e-3, rtol=1e-3,
        err_msg="kys fused response (wrapper)")
    assert_close(my_state, ref_state, 1e-4, "kys state")

    # second step threads the recurrent state
    feat_next = torch.randn(B, C, H, W, generator=g)
    dimp_score2 = torch.rand(B, 1, H, W, generator=g)
    with torch.no_grad():
        ref_out2 = ref.predictor.predict_response(
            {"feat1": feat_cur, "feat2": feat_next, "label_prev": None,
             "dimp_score_cur": dimp_score2, "state_prev": ref_state})
        ref_fused2, ref_state2 = ref_out2["response"], ref_out2["state_cur"]
    my_fused2, my_state2, _ = net.apply(
        variables, to_nhwc(feat_cur), to_nhwc(feat_next), my_state,
        to_nhwc(dimp_score2), None,
        method=lambda m, fp, fc, s, d, i: m.predict_response(
            fp, fc, s, d, init_label=i))
    np.testing.assert_allclose(
        np.asarray(my_fused2)[:, 1:-1, 1:-1, 0],
        from_torch(ref_fused2)[:, 0, 1:-1, 1:-1], atol=1e-3, rtol=1e-3,
        err_msg="kys fused response step2 (wrapper)")
    assert_close(my_state2, ref_state2, 1e-4, "kys state step2")


# =================================================================== LWL

def bgr255(im_raw: "torch.Tensor") -> "torch.Tensor":
    """Caffe2 preprocessing for mrcnn backbones (reference net_wrappers.py with
    image_format='bgr255', parameter/lwl/lwl_ytvos.py:35-37)."""
    mean = torch.tensor([102.9801, 115.9465, 122.7717]).view(1, 3, 1, 1)
    return im_raw.flip(1) - mean


def test_lwlnet_full_parity():
    import ltr.models.lwl.lwl_net as ref_lwl

    from pytracking_tpu.models.lwl.lwl_net import steepest_descent_resnet50

    torch.manual_seed(0)
    # lwl_stage2 recipe args (reference train_settings/lwl/lwl_stage2.py:94-102)
    ref = ref_lwl.steepest_descent_resnet50(
        filter_size=3, num_filters=16, optim_iter=3, backbone_pretrained=False,
        out_feature_dim=512, label_encoder_dims=(16, 32, 64),
        use_bn_in_label_enc=False, clf_feat_blocks=0, final_conv=True,
        backbone_type="mrcnn")
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_lwlnet(sd)
    net = steepest_descent_resnet50(optim_iter=3)

    g = torch.Generator().manual_seed(1)
    size = 128
    im = torch.rand((2, 3, size, size), generator=g) * 255.0
    with torch.no_grad():
        ref_feat = ref.extract_backbone_features(bgr255(im))
    my_feat = net.apply(variables, jnp.asarray(from_torch(im).transpose(0, 2, 3, 1)),
                        method=lambda m, x: m.extract_backbone(x))
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        # bgr255 inputs make activations O(1e3); f32 accumulation noise scales
        # accordingly — 0.05 absolute is still ~1e-5 relative at that magnitude
        assert_close(my_feat[layer], ref_feat[layer], 5e-2, layer)

    with torch.no_grad():
        ref_tm = ref.extract_target_model_features(ref_feat)
    my_tm = net.apply(variables, my_feat,
                      method=lambda m, f: m.extract_target_model_features(f))
    assert_close(my_tm, ref_tm, 1e-3, "target model features")

    # label encoder on a synthetic mask
    mask = torch.zeros((2, 1, size, size))
    mask[0, 0, 30:70, 40:90] = 1.0
    mask[1, 0, 10:40, 10:50] = 1.0
    ref_tm_5d = ref_tm.view(2, 1, *ref_tm.shape[-3:])
    with torch.no_grad():
        ref_label, ref_sw = ref.label_encoder(mask, ref_tm_5d)
    my_tm_5d = my_tm.reshape(2, 1, *my_tm.shape[1:])
    my_label, my_sw = net.apply(variables, jnp.asarray(from_torch(mask)), my_tm_5d,
                                method=lambda m, ma, f: m.label_encode(ma, f))
    assert_close(my_label.reshape((-1,) + my_label.shape[2:]),
                 ref_label.reshape(-1, *ref_label.shape[-3:]), 1e-4, "label enc")
    assert_close(my_sw.reshape((-1,) + my_sw.shape[2:]),
                 ref_sw.reshape(-1, *ref_sw.shape[-3:]), 1e-4, "sample weights")

    # few-shot filter + segmentation decode for sequence 0
    with torch.no_grad():
        ref_filt, _, _ = ref.target_model.get_filter(ref_tm_5d, ref_label, ref_sw)
        ref_feat_seq0 = {k: v[:1] for k, v in ref_feat.items()}
        ref_mask_pred, _ = ref.segment_target(ref_filt[:1], ref_tm_5d[0, :1],
                                              ref_feat_seq0)
    my_filt, _, _ = net.apply(
        variables, my_tm_5d, my_label, my_sw,
        method=lambda m, f, l, w: m.tm_get_filter(f, l, w))
    my_feat_seq0 = {k: v[:1] for k, v in my_feat.items()}
    my_mask, _ = net.apply(
        variables, my_filt[:1], my_tm_5d[0:1, 0:1], my_feat_seq0, (size, size),
        method=lambda m, ft, tf, bf, s: m.segment_target(ft, tf, bf, s))
    np.testing.assert_allclose(
        np.asarray(my_mask), from_torch(ref_mask_pred).reshape(size, size),
        atol=5e-3, rtol=1e-4, err_msg="lwl segmentation logits")


# =================================================================== RTS

def test_rtsnet_full_parity():
    import ltr.models.rts.rts_net as ref_rts

    from pytracking_tpu.models.rts.rts_net import rts50

    torch.manual_seed(0)
    # rts50 recipe args (reference train_settings/rts/rts50.py:128-144)
    ref = ref_rts.steepest_descent_resnet50_with_clf_encoder(
        filter_size=3, num_filters=16, optim_iter=3, backbone_pretrained=False,
        out_feature_dim=512, label_encoder_dims=(16, 32, 64),
        use_bn_in_label_enc=False, clf_feat_blocks=0, final_conv=True,
        backbone_type="mrcnn", clf_filter_size=4, clf_score_act="relu",
        clf_hinge_threshold=0.05, clf_activation_leak=0.1, clf_with_extractor=True,
        clf_enc_input="sc")
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_rtsnet(sd)
    net = rts50(optim_iter=3)

    g = torch.Generator().manual_seed(1)
    size = 128
    im = torch.rand((2, 3, size, size), generator=g) * 255.0
    with torch.no_grad():
        ref_feat = ref.extract_backbone_features(bgr255(im))
    my_feat = net.apply(variables, jnp.asarray(from_torch(im).transpose(0, 2, 3, 1)),
                        method=lambda m, x: m.extract_backbone(x))

    # ---- classifier branch: features, filter with external hinge labels, scores
    with torch.no_grad():
        ref_clf = ref.extract_classification_feat(ref_feat)
    my_clf = net.apply(variables, my_feat,
                       method=lambda m, f: m.extract_classification_feat(f))
    assert_close(my_clf, ref_clf, 1e-3, "rts clf feat")

    h, w = ref_clf.shape[-2:]
    bb = torch.tensor([[20.0, 25.0, 40.0, 35.0], [30.0, 20.0, 30.0, 45.0]])
    labels = torch.rand((2, 1, h + 1, w + 1), generator=g)  # even filter: +1 grid
    ref_clf5 = ref_clf.view(2, 1, *ref_clf.shape[-3:])
    with torch.no_grad():
        ref_w, _, _ = ref.classifier.get_filter(ref_clf5, bb.view(2, 1, 4),
                                                train_label=labels)
        ref_scores = ref.classifier.classify(ref_w, ref_clf5)
    my_clf5 = my_clf.reshape(2, 1, *my_clf.shape[1:])
    my_w, _, _ = net.apply(
        variables, my_clf5, jnp.asarray(bb.numpy()).reshape(2, 1, 4),
        jnp.asarray(from_torch(labels)),
        method=lambda m, f, b, l: m.clf_get_filter(f, b, train_label=l))
    my_scores = net.apply(variables, my_w, my_clf5,
                          method=lambda m, wt, f: m.clf_classify(wt, f))
    np.testing.assert_allclose(np.asarray(my_scores)[..., 0],
                               from_torch(ref_scores), atol=2e-3, rtol=1e-4,
                               err_msg="rts clf scores")

    # ---- score encoder + fused segmentation for sequence 0
    with torch.no_grad():
        ref_tm = ref.extract_target_model_features(ref_feat)
        mask = torch.zeros((2, 1, size, size))
        mask[0, 0, 30:70, 40:90] = 1.0
        mask[1, 0, 10:40, 10:50] = 1.0
        ref_tm5 = ref_tm.view(2, 1, *ref_tm.shape[-3:])
        ref_label, ref_sw = ref.label_encoder(mask, ref_tm5)
        ref_filt, _, _ = ref.target_model.get_filter(ref_tm5, ref_label, ref_sw)
        ref_enc = ref.target_model.apply_target_model(
            ref_filt[:1], ref_tm5[0, :1].view(1, 1, *ref_tm.shape[-3:]))
        clf_score0 = ref_scores[0, :1].view(1, 1, h + 1, w + 1)
        ref_clf_enc, _ = ref.clf_encoder(clf_score0.view(1, 1, h + 1, w + 1))
        from ltr.models.lwl.utils import interpolate
        enc_r = interpolate(ref_clf_enc.view(1, -1, h + 1, w + 1),
                            ref_enc.shape[-2:]).unsqueeze(0)
        fused = ref.fusion_module(ref_enc, enc_r)
        ref_feat_seq0 = {k: v[:1] for k, v in ref_feat.items()}
        ref_mask_pred, _ = ref.decoder(fused, ref_feat_seq0, (size, size))

    my_tm = net.apply(variables, my_feat,
                      method=lambda m, f: m.extract_target_model_features(f))
    my_tm5 = my_tm.reshape(2, 1, *my_tm.shape[1:])
    my_label, my_sw = net.apply(variables, jnp.asarray(from_torch(mask)), my_tm5,
                                method=lambda m, ma, f: m.label_encode(ma, f))
    my_filt, _, _ = net.apply(variables, my_tm5, my_label, my_sw,
                              method=lambda m, f, l, sw_: m.tm_get_filter(f, l, sw_))
    my_feat_seq0 = {k: v[:1] for k, v in my_feat.items()}
    my_mask, _ = net.apply(
        variables, my_filt[:1], my_tm5[0:1, 0:1], my_feat_seq0,
        jnp.asarray(np.asarray(my_scores)[0:1, 0:1, :, :, 0]),
        (size, size),
        method=lambda m, ft, tf, bf, cs, s: m.segment_target_with_clf(
            ft, tf, bf, cs, s))
    np.testing.assert_allclose(
        np.asarray(my_mask), from_torch(ref_mask_pred).reshape(size, size),
        atol=5e-3, rtol=1e-4, err_msg="rts fused segmentation logits")


# =================================================================== ToMP-50

def test_tompnet50_full_parity():
    import ltr.models.tracking.tompnet as ref_tompnet

    from pytracking_tpu.models.tracking.tompnet import tompnet50

    torch.manual_seed(0)
    ref = ref_tompnet.tompnet50(backbone_pretrained=False, final_conv=True,
                                head_feat_norm=True, out_feature_dim=512,
                                feature_sz=18, frozen_backbone_layers=[])
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_tompnet(sd)
    net = tompnet50()

    g = torch.Generator().manual_seed(1)
    Ns, size = 2, 144
    h = w = size // 16
    train_imgs = torch.rand((1, Ns, 3, size, size), generator=g) * 255.0
    test_imgs = torch.rand((1, Ns, 3, size, size), generator=g) * 255.0
    train_bb = torch.rand((1, Ns, 4), generator=g) * 40 + 10
    train_label = torch.rand((1, Ns, h, w), generator=g)
    train_ltrb = torch.rand((1, Ns, 4, h, w), generator=g) * 2

    with torch.no_grad():
        ref_scores, ref_bbox = ref(normalized(train_imgs.reshape(-1, 3, size, size)
                                              ).reshape(train_imgs.shape),
                                   normalized(test_imgs.reshape(-1, 3, size, size)
                                              ).reshape(test_imgs.shape),
                                   train_bb, train_label, train_ltrb)

    def nhwc5(t):
        return jnp.asarray(from_torch(t).transpose(0, 1, 3, 4, 2))

    my_scores, my_bbox = net.apply(
        variables, nhwc5(train_imgs), nhwc5(test_imgs),
        jnp.asarray(from_torch(train_label)), nhwc5(train_ltrb), train=False)
    np.testing.assert_allclose(
        np.asarray(my_scores).reshape(from_torch(ref_scores).shape),
        from_torch(ref_scores), atol=2e-3, rtol=1e-4, err_msg="tomp scores")
    np.testing.assert_allclose(
        np.asarray(my_bbox).transpose(0, 1, 4, 2, 3).reshape(
            from_torch(ref_bbox).shape),
        from_torch(ref_bbox), atol=2e-3, rtol=1e-4, err_msg="tomp bbox preds")


# =================================================================== TaMOs-R50

def test_tamosnet_resnet50_full_parity():
    import ltr.models.tracking.tamosnet as ref_tamosnet

    from pytracking_tpu.models.tracking.tamosnet import tamosnet_resnet50

    torch.manual_seed(0)
    # tamos_resnet50 recipe args (reference train_settings/tamos/tamos_resnet50.py)
    ref = ref_tamosnet.tamosnet_resnet50(
        backbone_pretrained=False, filter_size=1, head_feat_blocks=0,
        head_feat_norm=True, final_conv=True, out_feature_dim=256,
        feature_sz=(36, 24), head_layer=["layer2", "layer3"], num_tokens=10,
        label_enc="gaussian", box_enc="ltrb_token",
        fpn_head_cls_output_mode=["high"], fpn_head_bbreg_output_mode=["high"],
        frozen_backbone_layers=[])
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_tamosnet(sd)
    net = tamosnet_resnet50()

    g = torch.Generator().manual_seed(1)
    Ns, K, size = 1, 10, 144
    h = w = size // 16
    train_imgs = torch.rand((1, Ns, 3, size, size), generator=g) * 255.0
    test_imgs = torch.rand((1, Ns, 3, size, size), generator=g) * 255.0
    train_bb = torch.rand((1, Ns, 4), generator=g) * 40 + 10
    train_label = torch.rand((1, Ns, K, h, w), generator=g)
    train_ltrb = torch.rand((1, Ns, K, 4, h, w), generator=g) * 2

    # snapshot inputs BEFORE the reference runs: its GOT predictor mutates its
    # inputs in place (train_feat_seq += ... on a flatten() view)
    my_args = (jnp.asarray(from_torch(train_imgs).transpose(0, 1, 3, 4, 2)),
               jnp.asarray(from_torch(test_imgs).transpose(0, 1, 3, 4, 2)),
               jnp.asarray(from_torch(train_label)),
               jnp.asarray(from_torch(train_ltrb).transpose(0, 1, 2, 4, 5, 3)))
    with torch.no_grad():
        ref_scores, ref_bbox = ref(
            normalized(train_imgs.reshape(-1, 3, size, size)).reshape(
                train_imgs.shape),
            normalized(test_imgs.reshape(-1, 3, size, size)).reshape(
                test_imgs.shape),
            train_bb, train_label, train_ltrb)
    ref_s = from_torch(ref_scores["highres"])
    ref_b = from_torch(ref_bbox["highres"])

    my_scores, my_ltrb = net.apply(variables, *my_args, train=False)
    # mine: scores (Nte, Ns, h2, w2, K); ref highres (Nte*Ns?, K, h2, w2)
    my_s = np.asarray(my_scores)
    my_s_nchw = my_s.transpose(0, 1, 4, 2, 3).reshape(ref_s.shape)
    np.testing.assert_allclose(my_s_nchw, ref_s, atol=2e-3, rtol=1e-4,
                               err_msg="tamos highres scores")
    my_b = np.asarray(my_ltrb)           # (Nte, Ns, h2, w2, K, 4)
    my_b_ref_layout = my_b.transpose(0, 1, 4, 5, 2, 3).reshape(ref_b.shape)
    np.testing.assert_allclose(my_b_ref_layout, ref_b, atol=2e-3, rtol=1e-4,
                               err_msg="tamos highres bbox preds")


# ================================================== Target candidate matching

def test_tcm_full_parity():
    import ltr.models.target_candidate_matching.target_candidate_matching as ref_tcm

    from pytracking_tpu.models.tcm.target_candidate_matching import \
        target_candidate_matching_net_resnet50

    torch.manual_seed(0)
    ref = ref_tcm.target_candidate_matching_net_resnet50(backbone_pretrained=False)
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_tcm(sd)
    net = target_candidate_matching_net_resnet50(image_shape=(128, 128))

    g = torch.Generator().manual_seed(1)
    size = 128
    im0 = torch.rand((1, 3, size, size), generator=g) * 255.0
    im1 = torch.rand((1, 3, size, size), generator=g) * 255.0
    K = 5
    fsz = size // 16 + 1   # descriptor map is H/16 + 1 (k=4, pad=2)
    tsm0 = torch.randint(0, fsz, (1, K, 2), generator=g)
    tsm1 = torch.randint(0, fsz, (1, K, 2), generator=g)
    imc0 = torch.rand((1, K, 2), generator=g) * size
    imc1 = torch.rand((1, K, 2), generator=g) * size
    s0 = torch.rand((1, K), generator=g)
    s1 = torch.rand((1, K), generator=g)

    with torch.no_grad():
        f0 = ref.extract_backbone_features(normalized(im0))
        f1 = ref.extract_backbone_features(normalized(im1))
        d0 = ref.descriptor_extractor(f0["layer3"], tsm0)
        d1 = ref.descriptor_extractor(f1["layer3"], tsm1)
        pred = ref.matcher({
            "descriptors0": d0, "descriptors1": d1,
            "img_coords0": imc0.flip(-1), "img_coords1": imc1.flip(-1),
            "scores0": s0, "scores1": s1,
            "image_size0": [size, size], "image_size1": [size, size]})

    my_f0 = net.apply(variables, jnp.asarray(from_torch(im0).transpose(0, 2, 3, 1)),
                      method=lambda m, x: m.extract_backbone(x))
    my_f1 = net.apply(variables, jnp.asarray(from_torch(im1).transpose(0, 2, 3, 1)),
                      method=lambda m, x: m.extract_backbone(x))
    my_d0 = net.apply(variables, my_f0, jnp.asarray(from_torch(tsm0)),
                      method=lambda m, f, c: m.get_descriptors(f, c))
    my_d1 = net.apply(variables, my_f1, jnp.asarray(from_torch(tsm1)),
                      method=lambda m, f, c: m.get_descriptors(f, c))
    # reference descriptors are channel-first (B, C, K)
    np.testing.assert_allclose(np.asarray(my_d0),
                               from_torch(d0).transpose(0, 2, 1), atol=2e-3,
                               rtol=1e-4, err_msg="tcm descriptors")

    my_pred = net.apply(
        variables, jnp.asarray(from_torch(imc0.flip(-1))),
        jnp.asarray(from_torch(imc1.flip(-1))), my_d0, my_d1,
        jnp.asarray(from_torch(s0)), jnp.asarray(from_torch(s1)),
        method=lambda m, c0, c1, dd0, dd1, ss0, ss1: m.match(c0, c1, dd0, dd1,
                                                             ss0, ss1))
    np.testing.assert_allclose(np.asarray(my_pred["log_assignment"]),
                               from_torch(pred["log_assignment"]), atol=2e-3,
                               rtol=1e-4, err_msg="tcm log assignment")


# ====================================================== ECO backbones

def test_resnet18_vggm_parity():
    import ltr.models.backbone.resnet18_vggm as ref_mod

    from pytracking_tpu.models.backbones.vggm_resnet import resnet18_vggmconv1

    torch.manual_seed(0)
    ref = ref_mod.resnet18_vggmconv1(None)   # random init, no checkpoint
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_resnet18_vggm(sd)
    net = resnet18_vggmconv1(output_layers=("vggconv1", "layer3"))

    g = torch.Generator().manual_seed(1)
    im = normalized(rand_images(g, 2))
    with torch.no_grad():
        ref_out = ref(im, output_layers=["vggconv1", "layer3"])
    my_out = net.apply(variables, to_nhwc(im))
    assert_close(my_out["vggconv1"], ref_out["vggconv1"], 1e-3, "vggconv1")
    assert_close(my_out["layer3"], ref_out["layer3"], 1e-3, "vggm layer3")


def test_mobilenetv3_parity():
    import ltr.models.backbone.mobilenetv3 as ref_mod

    from pytracking_tpu.models.backbones.mobilenetv3 import mobilenet3

    torch.manual_seed(0)
    ref = ref_mod.MobileNetV3(model_mode="LARGE",
                              output_layers=["init_conv", "layer5"])
    ref.eval()
    randomize_bn_stats(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_mobilenetv3(sd)
    net = mobilenet3(output_layers=("init_conv", "layer5"))

    g = torch.Generator().manual_seed(1)
    im = normalized(rand_images(g, 2))
    with torch.no_grad():
        ref_out = ref(im, output_layers=["init_conv", "layer5"])
    my_out = net.apply(variables, to_nhwc(im))
    assert_close(my_out["init_conv"], ref_out["init_conv"], 1e-3, "init_conv")
    assert_close(my_out["layer5"], ref_out["layer5"], 1e-3, "mbv3 layer5")


# =================================================================== PrDiMP-50

def test_prdimp50_full_parity():
    import ltr.models.tracking.dimpnet as ref_dimpnet

    from pytracking_tpu.models.tracking.dimpnet import klcedimpnet50

    torch.manual_seed(0)
    # prdimp50 recipe args (reference train_settings/dimp/prdimp50.py:95-98)
    ref = ref_dimpnet.klcedimpnet50(
        backbone_pretrained=False, filter_size=4, optim_iter=3, clf_feat_norm=True,
        clf_feat_blocks=0, final_conv=True, out_feature_dim=512,
        optim_init_step=1.0, optim_init_reg=0.05, optim_min_reg=0.05,
        gauss_sigma=0.9, alpha_eps=0.05, normalize_label=True,
        init_initializer="zero")
    ref.eval()
    randomize_bn_stats(ref)
    # zero-initialized filter_conv would make the parity trivial; randomize it
    with torch.no_grad():
        ref.classifier.filter_initializer.filter_conv.weight.normal_(0, 0.01)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = pw.port_dimpnet(sd, layers=(3, 4, 6, 3), block="bottleneck")
    net = klcedimpnet50(optim_iter=3)
    _dimp_family_parity(ref, net, variables)
