"""The DiMP network: backbone + meta-learned discriminative classifier + IoU-Net.

Re-design of reference `ltr/models/tracking/dimpnet.py` (DiMPnet:16, dimpnet18:101,
dimpnet50:147, klcedimpnet50:349 for PrDiMP). Tracking-time use calls the sub-module
methods (`extract_backbone`, `extract_classification_feat`, `get_filter`, `classify`,
IoU-net methods) from inside the tracker's jitted step via `nn.apply`; the `__call__`
forward is the training path.

Image input: (.., H, W, 3) float32 RGB in [0, 255]; normalization happens inside
`extract_backbone` (reference features/net_wrappers.py:55-68 does the same on the
wrapper level).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
from pytracking_tpu.models.classifier.features import ResidualBasicBlock, ResidualBottleneck
from pytracking_tpu.models.classifier.initializer import (FilterInitializerLinear,
                                                          FilterInitializerZero)
from pytracking_tpu.models.classifier.linear_filter import LinearFilter
from pytracking_tpu.models.classifier.optimizer import (DiMPSteepestDescentGN,
                                                        PrDiMPSteepestDescentNewton)


class DiMPnet(nn.Module):
    feature_extractor: nn.Module
    classifier: LinearFilter
    bb_regressor: AtomIoUNet
    classification_layer: str = "layer3"
    bb_regressor_layer: Tuple[str, ...] = ("layer2", "layer3")

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        """im (B, H, W, 3) in [0,255] -> dict of backbone features."""
        x = backbones.normalize_image(im)
        return self.feature_extractor(x, train=train)

    def extract_classification_feat(self, backbone_feat, train: bool = False):
        return self.classifier.extract_classification_feat(
            backbone_feat[self.classification_layer], train=train)

    def get_backbone_bbreg_feat(self, backbone_feat):
        return [backbone_feat[l] for l in self.bb_regressor_layer]

    # ---- classifier passthroughs (used by trackers via nn.apply(method=...)) ----
    def clf_get_filter(self, feat, bb, num_iter=None, sample_weight=None):
        return self.classifier.get_filter(feat, bb, num_iter=num_iter,
                                          sample_weight=sample_weight)

    def clf_classify(self, weights, feat):
        return self.classifier.classify(weights, feat)

    # ---- IoU-net passthroughs ----
    def iou_get_modulation(self, backbone_feat, bb):
        return self.bb_regressor.get_modulation(
            self.get_backbone_bbreg_feat(backbone_feat), bb)

    def iou_get_iou_feat(self, backbone_feat):
        return self.bb_regressor.get_iou_feat(self.get_backbone_bbreg_feat(backbone_feat))

    def iou_predict(self, modulation, iou_feat, proposals):
        return self.bb_regressor.predict_iou(modulation, iou_feat, proposals)

    def __call__(self, train_imgs, test_imgs, train_bb, test_proposals,
                 train: bool = True):
        """Training forward (reference dimpnet.py:36-69).

        train_imgs/test_imgs: (N, S, H, W, 3); train_bb: (N, S, 4);
        test_proposals: (Ntest, S, P, 4).
        Returns (target_scores (iters, Ntest, S, h, w, 1), iou_pred (Ntest, S, P)).
        """
        N_tr, S = train_imgs.shape[0], train_imgs.shape[1]
        N_te = test_imgs.shape[0]

        tr_feat = self.extract_backbone(train_imgs.reshape((-1,) + train_imgs.shape[2:]),
                                        train=train)
        te_feat = self.extract_backbone(test_imgs.reshape((-1,) + test_imgs.shape[2:]),
                                        train=train)

        def to_ns(f, n):
            return f.reshape((n, S) + f.shape[1:])

        tr_clf = to_ns(tr_feat[self.classification_layer], N_tr)
        te_clf = to_ns(te_feat[self.classification_layer], N_te)
        target_scores, clf_losses = self.classifier(tr_clf, te_clf, train_bb, train=train)

        tr_iou = [to_ns(tr_feat[l], N_tr) for l in self.bb_regressor_layer]
        te_iou = [to_ns(te_feat[l], N_te) for l in self.bb_regressor_layer]
        iou_pred = self.bb_regressor(tr_iou, te_iou, train_bb, test_proposals, train=train)
        return target_scores, iou_pred


def dimpnet50(filter_size: int = 4, optim_iter: int = 5, optim_init_step: float = 0.9,
              optim_init_reg: float = 0.1, classification_layer: str = "layer3",
              feat_stride: int = 16, clf_feat_blocks: int = 0, clf_feat_norm: bool = True,
              init_filter_norm: bool = False, final_conv: bool = True,
              out_feature_dim: int = 512, init_gauss_sigma: float = 0.9,
              num_dist_bins: int = 100, bin_displacement: float = 0.1,
              mask_init_factor: float = 3.0, iou_input_dim=(256, 256),
              iou_inter_dim=(256, 256), score_act: str = "relu", act_param=None,
              target_mask_act: str = "sigmoid", backbone_dtype=None) -> DiMPnet:
    """DiMP-50 (reference dimpnet.py:147-199 with the dimp50 recipe defaults,
    train_settings/dimp/dimp50.py:91-95). backbone_dtype=jnp.bfloat16 runs the
    backbone convs in bf16 (params stay f32) — ~2x on TPU."""
    backbone = backbones.resnet50(output_layers=("layer2", "layer3"),
                                  dtype=backbone_dtype)
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    clf_fe = ResidualBottleneck(feature_dim=256, num_blocks=clf_feat_blocks,
                                l2norm=clf_feat_norm, final_conv=final_conv,
                                norm_scale=norm_scale, out_dim=out_feature_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size,
                                          filter_norm=init_filter_norm,
                                          feature_dim=out_feature_dim)
    optimizer = DiMPSteepestDescentGN(
        num_iter=optim_iter, feat_stride=feat_stride, init_step_length=optim_init_step,
        init_filter_reg=optim_init_reg, init_gauss_sigma=init_gauss_sigma,
        num_dist_bins=num_dist_bins, bin_displacement=bin_displacement,
        mask_init_factor=mask_init_factor, score_act=score_act, act_param=act_param,
        mask_act=target_mask_act)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(512, 1024), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return DiMPnet(feature_extractor=backbone, classifier=classifier,
                   bb_regressor=bb_regressor, classification_layer=classification_layer,
                   bb_regressor_layer=("layer2", "layer3"))


def dimpnet18(filter_size: int = 4, optim_iter: int = 5, optim_init_step: float = 0.9,
              optim_init_reg: float = 0.1, classification_layer: str = "layer3",
              feat_stride: int = 16, clf_feat_blocks: int = 1, clf_feat_norm: bool = True,
              init_filter_norm: bool = False, final_conv: bool = True,
              out_feature_dim: int = 256, init_gauss_sigma: float = 0.9,
              num_dist_bins: int = 100, bin_displacement: float = 0.1,
              mask_init_factor: float = 3.0, iou_input_dim=(256, 256),
              iou_inter_dim=(256, 256), score_act: str = "relu", act_param=None,
              target_mask_act: str = "sigmoid") -> DiMPnet:
    """DiMP-18 (reference dimpnet.py:101-143)."""
    backbone = backbones.resnet18(output_layers=("layer2", "layer3"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    clf_fe = ResidualBasicBlock(feature_dim=256, num_blocks=clf_feat_blocks,
                                l2norm=clf_feat_norm, final_conv=final_conv,
                                norm_scale=norm_scale, out_dim=out_feature_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size,
                                          filter_norm=init_filter_norm,
                                          feature_dim=out_feature_dim)
    optimizer = DiMPSteepestDescentGN(
        num_iter=optim_iter, feat_stride=feat_stride, init_step_length=optim_init_step,
        init_filter_reg=optim_init_reg, init_gauss_sigma=init_gauss_sigma,
        num_dist_bins=num_dist_bins, bin_displacement=bin_displacement,
        mask_init_factor=mask_init_factor, score_act=score_act, act_param=act_param,
        mask_act=target_mask_act)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(128, 256), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return DiMPnet(feature_extractor=backbone, classifier=classifier,
                   bb_regressor=bb_regressor, classification_layer=classification_layer,
                   bb_regressor_layer=("layer2", "layer3"))


def klcedimpnet50(filter_size: int = 4, optim_iter: int = 5, optim_init_step: float = 1.0,
                  optim_init_reg: float = 0.05, optim_min_reg: float = 0.05,
                  gauss_sigma: float = 0.9, alpha_eps: float = 0.05,
                  normalize_label: bool = True, classification_layer: str = "layer3",
                  feat_stride: int = 16, clf_feat_blocks: int = 0,
                  clf_feat_norm: bool = True, final_conv: bool = True,
                  out_feature_dim: int = 512, iou_input_dim=(256, 256),
                  iou_inter_dim=(256, 256), label_shrink: float = 0.0,
                  softmax_reg=None, label_threshold: float = 0.0,
                  init_uni_weight=None) -> DiMPnet:
    """PrDiMP-50: KL-divergence Newton optimizer + zero-INITIALIZED (but trained)
    linear filter initializer (reference dimpnet.py:349-396 passes
    init_initializer='zero' to FilterInitializerLinear — a real conv, non-zero in
    trained checkpoints; train_settings/dimp/prdimp50.py:95-98)."""
    backbone = backbones.resnet50(output_layers=("layer2", "layer3"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    clf_fe = ResidualBottleneck(feature_dim=256, num_blocks=clf_feat_blocks,
                                l2norm=clf_feat_norm, final_conv=final_conv,
                                norm_scale=norm_scale, out_dim=out_feature_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size,
                                          filter_norm=False,
                                          feature_dim=out_feature_dim)
    optimizer = PrDiMPSteepestDescentNewton(
        num_iter=optim_iter, feat_stride=feat_stride, init_step_length=optim_init_step,
        init_filter_reg=optim_init_reg, min_filter_reg=optim_min_reg,
        gauss_sigma=gauss_sigma, alpha_eps=alpha_eps, normalize_label=normalize_label,
        label_shrink=label_shrink, softmax_reg=softmax_reg,
        label_threshold=label_threshold, init_uni_weight=init_uni_weight)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(512, 1024), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return DiMPnet(feature_extractor=backbone, classifier=classifier,
                   bb_regressor=bb_regressor, classification_layer=classification_layer,
                   bb_regressor_layer=("layer2", "layer3"))


def dimpnet50_simple(filter_size: int = 4, optim_iter: int = 5,
                     optim_init_reg: float = 0.05, classification_layer: str = "layer3",
                     feat_stride: int = 16, clf_feat_blocks: int = 0,
                     clf_feat_norm: bool = True, final_conv: bool = True,
                     out_feature_dim: int = 512, init_gauss_sigma: float = 0.9,
                     num_dist_bins: int = 100, bin_displacement: float = 0.1,
                     mask_init_factor: float = 3.0, iou_input_dim=(256, 256),
                     iou_inter_dim=(256, 256), score_act: str = "bentpar",
                     act_param: float = 0.05) -> DiMPnet:
    """DiMP-50-simple: the generic residual-module-driven Gauss-Newton steepest descent
    replaces the hand-unrolled optimizer (reference dimpnet.py:202-253,
    train_settings/dimp/super_dimp_simple.py)."""
    from pytracking_tpu.models.classifier.residual_modules import GNSteepestDescentDiMP

    backbone = backbones.resnet50(output_layers=("layer2", "layer3"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    clf_fe = ResidualBottleneck(feature_dim=256, num_blocks=clf_feat_blocks,
                                l2norm=clf_feat_norm, final_conv=final_conv,
                                norm_scale=norm_scale, out_dim=out_feature_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size,
                                          filter_norm=False,
                                          feature_dim=out_feature_dim)
    optimizer = GNSteepestDescentDiMP(
        num_iter=optim_iter, feat_stride=feat_stride,
        init_filter_reg=optim_init_reg, init_gauss_sigma=init_gauss_sigma,
        num_dist_bins=num_dist_bins, bin_displacement=bin_displacement,
        mask_init_factor=mask_init_factor, score_act=score_act, act_param=act_param)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(512, 1024), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return DiMPnet(feature_extractor=backbone, classifier=classifier,
                   bb_regressor=bb_regressor, classification_layer=classification_layer,
                   bb_regressor_layer=("layer2", "layer3"))


def klcedimpnet18(filter_size: int = 4, optim_iter: int = 5,
                  optim_init_step: float = 1.0, optim_init_reg: float = 0.05,
                  optim_min_reg: float = 0.05, gauss_sigma: float = 0.9,
                  alpha_eps: float = 0.05, normalize_label: bool = True,
                  classification_layer: str = "layer3", feat_stride: int = 16,
                  clf_feat_blocks: int = 1, clf_feat_norm: bool = True,
                  final_conv: bool = True, out_feature_dim: int = 256,
                  iou_input_dim=(256, 256), iou_inter_dim=(256, 256),
                  label_shrink: float = 0.0, softmax_reg=None,
                  label_threshold: float = 0.0, init_uni_weight=None) -> DiMPnet:
    """PrDiMP-18 (reference dimpnet.py:257-345 klcedimpnet18; the initializer is
    FilterInitializerLinear with zero init, as in klcedimpnet50)."""
    backbone = backbones.resnet18(output_layers=("layer2", "layer3"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    clf_fe = ResidualBasicBlock(feature_dim=256, num_blocks=clf_feat_blocks,
                                l2norm=clf_feat_norm, final_conv=final_conv,
                                norm_scale=norm_scale, out_dim=out_feature_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size,
                                          filter_norm=False,
                                          feature_dim=out_feature_dim)
    optimizer = PrDiMPSteepestDescentNewton(
        num_iter=optim_iter, feat_stride=feat_stride,
        init_step_length=optim_init_step, init_filter_reg=optim_init_reg,
        min_filter_reg=optim_min_reg, gauss_sigma=gauss_sigma, alpha_eps=alpha_eps,
        normalize_label=normalize_label, label_shrink=label_shrink,
        softmax_reg=softmax_reg, label_threshold=label_threshold,
        init_uni_weight=init_uni_weight)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(128, 256), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return DiMPnet(feature_extractor=backbone, classifier=classifier,
                   bb_regressor=bb_regressor, classification_layer=classification_layer,
                   bb_regressor_layer=("layer2", "layer3"))
