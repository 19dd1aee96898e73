"""KYS network: DiMP appearance model + scene-propagation motion module.

Re-design of reference `ltr/models/tracking/kysnet.py` (KYSNet:17, kysnet_res50:114):
backbone + DiMP classifier + IoU-Net (shared with dimpnet) plus the
CostVolume/ResponsePredictor motion branch. The motion features are the classifier
features (reference predictor_wrapper.extract_motion_feat passes the classification
layer through).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
from pytracking_tpu.models.classifier.features import ResidualBottleneck
from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
from pytracking_tpu.models.classifier.linear_filter import LinearFilter
from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
from pytracking_tpu.models.kys.cost_volume import cost_volume_abs
from pytracking_tpu.models.kys.response_predictor import ResponsePredictor
from pytracking_tpu.models.tracking.dimpnet import DiMPnet


class KYSNet(DiMPnet):
    """Extends DiMPnet with the motion/propagation branch."""
    predictor: Optional[ResponsePredictor] = None
    max_displacement: int = 9
    cv_kernel_size: int = 3

    def get_motion_feat(self, backbone_feat):
        """Motion features = the RAW classification-layer backbone map (layer3,
        1024-dim) — reference kysnet.py:90-95 with motion_feat_extractor=None
        routes to predictor_wrapper.extract_motion_feat (:82-86), which is the
        identity on backbone_feat[classification_layer], NOT the projected
        512-dim classifier feature."""
        return backbone_feat["layer3"]

    def predict_response(self, motion_feat_prev, motion_feat_cur, state_prev,
                         dimp_score_cur, init_label=None, dimp_thresh=None,
                         output_window=None, state_valid=None):
        """(reference predictor_wrapper.predict_response :92-152). All inputs
        (B, H, W, C)-shaped; returns (fused (B,H,W,1), state (B,H,W,D), aux).

        Implements the wrapper's `fix_coordinate_shift` (predictor_wrapper.py:
        12,113-151): the dimp score and label are shifted by a quarter cell
        (+0.5/size in the torch affine-grid's [-1,1] units = +0.25 px of
        content) before the predictor, and the response shifted back after."""
        from pytracking_tpu.models.kys.response_predictor import shift_features

        cv = cost_volume_abs(motion_feat_cur, motion_feat_prev, self.max_displacement,
                             kernel_size=self.cv_kernel_size)
        B, H, W = dimp_score_cur.shape[0], dimp_score_cur.shape[1], \
            dimp_score_cur.shape[2]
        # our shift_features moves content by +s*size px: +0.25 px -> 0.25/size
        s_pre = jnp.broadcast_to(jnp.asarray([0.25 / H, 0.25 / W]), (B, 2))
        dimp_in = shift_features(dimp_score_cur, s_pre)
        label_in = shift_features(init_label, s_pre) \
            if init_label is not None else None
        fused, state_new, aux = self.predictor(
            cv, state_prev, dimp_in, init_label=label_in,
            dimp_thresh=dimp_thresh, output_window=output_window,
            state_valid=state_valid)
        fused = shift_features(fused, -s_pre)
        return fused, state_new, aux


def kysnet_res50(filter_size: int = 4, optim_iter: int = 5,
                 optim_init_step: float = 0.9, optim_init_reg: float = 0.1,
                 out_feature_dim: int = 512, init_gauss_sigma: float = 0.9,
                 num_dist_bins: int = 100, bin_displacement: float = 0.1,
                 mask_init_factor: float = 3.0, state_dim: int = 8,
                 representation_predictor_dims=(64, 32),
                 conf_measure: str = "entropy", dimp_thresh: float = 0.05,
                 max_displacement: int = 9) -> KYSNet:
    """(reference kysnet.py:114-210)"""
    backbone = backbones.resnet50(output_layers=("layer2", "layer3"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    clf_fe = ResidualBottleneck(feature_dim=256, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=norm_scale,
                                out_dim=out_feature_dim)
    initializer = FilterInitializerLinear(filter_size=filter_size,
                                          filter_norm=False,
                                          feature_dim=out_feature_dim)
    optimizer = DiMPSteepestDescentGN(
        num_iter=optim_iter, feat_stride=16, init_step_length=optim_init_step,
        init_filter_reg=optim_init_reg, init_gauss_sigma=init_gauss_sigma,
        num_dist_bins=num_dist_bins, bin_displacement=bin_displacement,
        mask_init_factor=mask_init_factor)
    classifier = LinearFilter(filter_size=filter_size, filter_initializer=initializer,
                              filter_optimizer=optimizer, feature_extractor=clf_fe)
    bb_regressor = AtomIoUNet(input_dim=(512, 1024))
    predictor = ResponsePredictor(state_dim=state_dim,
                                  representation_predictor_dims=tuple(
                                      representation_predictor_dims),
                                  conf_measure=conf_measure, dimp_thresh=dimp_thresh)
    return KYSNet(feature_extractor=backbone, classifier=classifier,
                  bb_regressor=bb_regressor, classification_layer="layer3",
                  bb_regressor_layer=("layer2", "layer3"), predictor=predictor,
                  max_displacement=max_displacement)
