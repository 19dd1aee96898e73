"""RTS network: robust segmentation-centric tracking — LWL-style mask branch fused with
a DiMP-style instance-classifier branch.

Re-design of reference `ltr/models/rts/rts_net.py` (RTSNet:26, constructors :364-530),
`rts/label_encoder.py` (ResidualDS16SW_Clf:57 — encodes the classifier SCORE MAP into
the mask-encoding space at the same resolution) and `rts/learners_fusion.py`
(LearnersFusion:6 — concat + 3x3 conv back to the mask-encoding width).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.lwl.label_encoder import SegBasicBlock
from pytracking_tpu.models.classifier.features import ResidualBottleneck
from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
from pytracking_tpu.models.classifier.linear_filter import LinearFilter
from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
from pytracking_tpu.models.layers.blocks import ConvBlock
from pytracking_tpu.models.lwl.decoder import LWTLDecoder, _interp
from pytracking_tpu.models.lwl.label_encoder import ResidualDS16SW
from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter


class ResidualDS16SWClf(nn.Module):
    """Encode the classifier score map (already at /16) into the mask-encoding space
    (reference rts/label_encoder.py:57-104; stride-1 variant of ResidualDS16SW)."""
    layer_dims: tuple = (16, 32, 64, 16)
    use_bn: bool = True

    @nn.compact
    def __call__(self, score, train: bool = False):
        """score (Nf, Ns, h, w) -> (label_enc (Nf, Ns, h, w, K), sw (same))."""
        Nf, Ns = score.shape[0], score.shape[1]
        x = score.reshape((-1,) + score.shape[2:] + (1,))
        x = ConvBlock(self.layer_dims[0], 3, batch_norm=self.use_bn,
                      name="conv_block")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        x = SegBasicBlock(self.layer_dims[1], stride=1, use_bn=self.use_bn,
                          name="res1")(x, train=train)
        x = SegBasicBlock(self.layer_dims[2], stride=1, use_bn=self.use_bn,
                          name="res2")(x, train=train)
        label = ConvBlock(self.layer_dims[3], 3, batch_norm=self.use_bn,
                          name="label_pred")(x, train=train)
        sw = nn.Conv(self.layer_dims[3], (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.ones, name="samp_w_pred")(x)
        out_shape = (Nf, Ns) + label.shape[1:]
        return label.reshape(out_shape), sw.reshape(out_shape)


class LearnersFusion(nn.Module):
    """Concat mask encoding + clf-score encoding and project back
    (reference learners_fusion.py:6-40)."""
    fusion_type: str = "concat"
    out_channels: int = 16

    @nn.compact
    def __call__(self, seg_enc, clf_enc):
        if self.fusion_type == "add":
            return seg_enc + clf_enc
        x = jnp.concatenate([seg_enc, clf_enc], axis=-1)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       name="fusion_conv1")(x)


class RTSNet(nn.Module):
    feature_extractor: nn.Module
    target_model: LWLLinearFilter
    decoder: LWTLDecoder
    label_encoder: ResidualDS16SW
    classifier: LinearFilter
    clf_encoder: ResidualDS16SWClf
    fusion_module: LearnersFusion
    target_model_input_layer: str = "layer3"
    classification_layer: str = "layer3"
    decoder_input_layers: Tuple[str, ...] = ("layer4", "layer3", "layer2", "layer1")
    backbone_norm: str = "bgr255"   # mrcnn backbone (Caffe2 BGR-255), as LWL

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        if self.backbone_norm == "bgr255":
            x = backbones.normalize_image_bgr255(im)
        else:
            x = backbones.normalize_image(im)
        return self.feature_extractor(x, train=train)

    # ---- segmentation branch (same surface as LWTLNet) ----
    def extract_target_model_features(self, backbone_feat, train: bool = False):
        return self.target_model.extract_target_model_features(
            backbone_feat[self.target_model_input_layer], train=train)

    def label_encode(self, masks, feat=None, train: bool = False):
        return self.label_encoder(masks, feat, train=train)

    def tm_get_filter(self, feat, label, sample_weight=None, num_iter=None):
        return self.target_model.get_filter(feat, label, sample_weight, num_iter)

    def tm_update_filter(self, filt, feat, label, sample_weight=None, num_iter=2):
        w, _, _ = self.target_model.update_filter(filt, feat, label, sample_weight,
                                                  num_iter)
        return w

    # ---- classifier branch ----
    def extract_classification_feat(self, backbone_feat, train: bool = False):
        return self.classifier.extract_classification_feat(
            backbone_feat[self.classification_layer], train=train)

    def clf_get_filter(self, feat, bb, train_label=None, num_iter=None,
                       sample_weight=None):
        """The hinge optimizer takes EXTERNAL Gaussian labels (reference
        clf_branch.py:348-349)."""
        return self.classifier.get_filter(feat, bb, num_iter=num_iter,
                                          sample_weight=sample_weight,
                                          train_label=train_label)

    def clf_classify(self, weights, feat):
        return self.classifier.classify(weights, feat)

    # ---- fused segmentation ----
    def segment_target_with_clf(self, filt, test_feat_tm, backbone_feat, clf_score,
                                image_size: Tuple[int, int], train: bool = False):
        """Mask prediction with the classifier score fused into the mask encoding
        (reference rts_net.py:144-180 with clf_enc_input='sc').

        test_feat_tm (1, 1, h, w, C); clf_score (1, 1, hs, ws)."""
        enc = self.target_model.apply_target_model(filt, test_feat_tm)  # (1,1,h,w,K)
        clf_enc, _ = self.clf_encoder(clf_score[0][None])               # (1,1,h',w',K)
        clf_enc_r = _interp(clf_enc.reshape(clf_enc.shape[1:]),
                            enc.shape[2:4])[None]
        fused = self.fusion_module(enc, clf_enc_r)
        feats = {k: backbone_feat[k] for k in self.decoder_input_layers}
        mask, _ = self.decoder(fused.reshape((-1,) + fused.shape[2:]), feats,
                               image_size, train=train)
        return mask[0, :, :, 0], fused

    def __call__(self, train_imgs, test_imgs, train_masks, train_bb,
                 train_label=None, num_refinement_iter: int = 2,
                 train: bool = True):
        """Training forward (condensed reference rts_net.py:114-220): learns both
        branches and predicts masks for the test frames with score fusion.
        train_label (Ntr, Ns, h, w): external Gaussian labels for the hinge
        classifier (reference passes them from RTSProcessing)."""
        Ntr, Ns = train_imgs.shape[0], train_imgs.shape[1]
        Nte = test_imgs.shape[0]
        H, W = train_imgs.shape[2], train_imgs.shape[3]

        tr_bb_feat = self.extract_backbone(
            train_imgs.reshape((-1,) + train_imgs.shape[2:]), train=train)
        te_bb_feat = self.extract_backbone(
            test_imgs.reshape((-1,) + test_imgs.shape[2:]), train=train)

        def to_ns(f, n):
            return f.reshape((n, Ns) + f.shape[1:])

        tr_tm = to_ns(self.target_model.extract_target_model_features(
            tr_bb_feat[self.target_model_input_layer], train=train), Ntr)
        te_tm = to_ns(self.target_model.extract_target_model_features(
            te_bb_feat[self.target_model_input_layer], train=train), Nte)
        tr_clf = to_ns(self.classifier.extract_classification_feat(
            tr_bb_feat[self.classification_layer], train=train), Ntr)
        te_clf = to_ns(self.classifier.extract_classification_feat(
            te_bb_feat[self.classification_layer], train=train), Nte)

        # classifier branch
        if train_label is None:
            # fallback labels: Gaussians at the train boxes on the score grid
            # (end-padded for the even filter size, like the data pipeline)
            from pytracking_tpu.ops.dcf import gauss_2d
            h, w = tr_clf.shape[2], tr_clf.shape[3]
            ep = (self.classifier.filter_size + 1) % 2
            ctr = (train_bb[..., :2] + train_bb[..., 2:] / 2).reshape(-1, 2)
            ctr = ctr[:, ::-1] / 16.0 - jnp.array([h / 2, w / 2])
            sig = 0.25 * jnp.sqrt(jnp.asarray(float(h * w)))
            train_label = jax.vmap(
                lambda c: gauss_2d((h, w), (sig, sig), c, (ep, ep)))(ctr)
            train_label = train_label.reshape(Ntr, Ns, h + ep, w + ep)
        clf_filter, _, _ = self.classifier.get_filter(tr_clf, train_bb,
                                                      train_label=train_label)
        clf_scores = self.classifier.classify(clf_filter, te_clf)    # (Nte,Ns,h,w,1)

        # segmentation branch
        label, sw = self.label_encoder(train_masks, tr_tm, train=train)
        filt, _, _ = self.target_model.get_filter(tr_tm, label, sw)

        te_bb_ns = {k: to_ns(v, Nte) for k, v in te_bb_feat.items()}
        masks_out = []
        for i in range(Nte):
            feat_i = te_tm[i:i + 1]
            bb_i = {k: v[i] for k, v in te_bb_ns.items()}
            score_i = clf_scores[i][None, :, :, :, 0]               # (1, Ns, h, w)
            mask, _ = self.segment_target_with_clf(filt, feat_i, bb_i, score_i,
                                                   (H, W), train=train)
            masks_out.append(mask.reshape(1, Ns, H, W) if mask.ndim == 2 else
                             mask[None])
        return jnp.concatenate(masks_out, axis=0), clf_scores


def rts50(filter_size: int = 3, num_filters: int = 16, optim_iter: int = 5,
          optim_init_reg: float = 0.01, out_feature_dim: int = 512,
          clf_filter_size: int = 4, label_encoder_dims=(16, 32, 64),
          decoder_mdim: int = 64, clf_hinge_threshold: float = 0.05,
          clf_activation_leak: float = 0.1, clf_score_act: str = "relu",
          use_bn_in_label_enc: bool = False, fusion_type: str = "add",
          backbone_type: str = "mrcnn") -> RTSNet:
    """RTS net with the rts50 recipe defaults (reference rts_net.py:417
    steepest_descent_resnet50_with_clf_encoder, train_settings/rts/rts50.py:128-144):
    maskrcnn backbone, clf_feat_blocks=0 + final_conv target-model features, and a
    DiMP-style classifier driven by the HINGE residual + generic GN steepest descent
    (NOT DiMPSteepestDescentGN — labels come from the tracker)."""
    from pytracking_tpu.models.classifier.features import ResidualBasicBlock
    from pytracking_tpu.models.classifier.residual_modules import \
        GNSteepestDescentHinge

    if backbone_type == "mrcnn":
        backbone = backbones.resnet50_mrcnn(output_layers=("layer1", "layer2",
                                                           "layer3", "layer4"))
        norm = "bgr255"
    else:
        backbone = backbones.resnet50(output_layers=("layer1", "layer2", "layer3",
                                                     "layer4"))
        norm = "imagenet"
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))

    tm_feat = ResidualBasicBlock(feature_dim=1024, num_blocks=0, l2norm=True,
                                 final_conv=True, norm_scale=norm_scale,
                                 out_dim=out_feature_dim)
    target_model = LWLLinearFilter(filter_size=filter_size, num_filters=num_filters,
                                   feature_dim=out_feature_dim, num_iter=optim_iter,
                                   init_filter_reg=optim_init_reg,
                                   feature_extractor=tm_feat)
    label_encoder = ResidualDS16SW(layer_dims=tuple(label_encoder_dims) +
                                   (num_filters,), use_bn=use_bn_in_label_enc)
    decoder = LWTLDecoder(in_channels=num_filters, out_channels=decoder_mdim,
                          ft_layers=("layer4", "layer3", "layer2", "layer1"),
                          use_bn=True)

    # classifier branch (reference build_base_components rts_net.py:322-356):
    # residual_bottleneck features + linear initializer + hinge GN optimizer
    clf_fe = ResidualBottleneck(feature_dim=256, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=norm_scale,
                                out_dim=out_feature_dim, final_stride=2)
    clf_initializer = FilterInitializerLinear(filter_size=clf_filter_size,
                                              filter_norm=False,
                                              feature_dim=out_feature_dim)
    clf_optimizer = GNSteepestDescentHinge(
        num_iter=optim_iter, feat_stride=16, init_filter_reg=optim_init_reg,
        hinge_threshold=clf_hinge_threshold, activation_leak=clf_activation_leak,
        score_act=clf_score_act, learn_filter_reg=False)
    classifier = LinearFilter(filter_size=clf_filter_size,
                              filter_initializer=clf_initializer,
                              filter_optimizer=clf_optimizer,
                              feature_extractor=clf_fe)
    clf_encoder = ResidualDS16SWClf(layer_dims=tuple(label_encoder_dims) +
                                    (num_filters,), use_bn=use_bn_in_label_enc)
    fusion = LearnersFusion(fusion_type=fusion_type)
    return RTSNet(feature_extractor=backbone, target_model=target_model,
                  decoder=decoder, label_encoder=label_encoder, classifier=classifier,
                  clf_encoder=clf_encoder, fusion_module=fusion, backbone_norm=norm)
