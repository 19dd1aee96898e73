"""ToMP network: backbone + transformer head.

Re-design of reference `ltr/models/tracking/tompnet.py` (ToMPnet:13, tompnet50:82,
tompnet101:124). The training forward takes Gaussian train labels and dense LTRB maps
(produced by the data pipeline) and returns test scores + dense box predictions.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.classifier.features import ResidualBottleneck
from pytracking_tpu.models.transformer.filter_predictor import FilterPredictor
from pytracking_tpu.models.transformer.heads import (DenseBoxRegressor, Head,
                                                     LinearFilterClassifier)
from pytracking_tpu.models.transformer.transformer import Transformer


class ToMPnet(nn.Module):
    feature_extractor: nn.Module
    head: Head
    head_layer: str = "layer3"
    # reference trainer's freeze_backbone_bn_layers (tomp50.py:146-147): backbone
    # BatchNorm stays in eval mode (running stats) even during training
    freeze_backbone_bn: bool = False

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        x = backbones.normalize_image(im)
        return self.feature_extractor(x,
                                      train=train and not self.freeze_backbone_bn)

    def get_backbone_head_feat(self, backbone_feat):
        return backbone_feat[self.head_layer]

    def extract_head_feat(self, backbone_feat, train: bool = False):
        """(B, H, W, C) backbone -> (B, h, w, C') head feature (4-dim path)."""
        f = self.get_backbone_head_feat(backbone_feat)
        out = self.head.extract_head_feat(f[None], train=train)
        return out[0]

    def head_get_filters_parallel(self, train_feat, test_feat, train_label, train_ltrb,
                                  cls_frame_mask=None, bbreg_frame_mask=None):
        return self.head.get_filter_and_features_in_parallel(
            train_feat, test_feat, train_label, train_ltrb,
            cls_frame_mask=cls_frame_mask, bbreg_frame_mask=bbreg_frame_mask)

    def head_classify(self, feat, filt):
        return self.head.run_classifier(feat, filt)

    def head_bbreg(self, feat, filt):
        return self.head.run_bbreg(feat, filt)

    def __call__(self, train_imgs, test_imgs, train_label, train_ltrb,
                 train: bool = True):
        """Training forward (reference tompnet.py:34-66).

        train_imgs (Ntr, Ns, H, W, 3), test_imgs (Nte, Ns, H, W, 3),
        train_label (Ntr, Ns, h, w), train_ltrb (Ntr, Ns, h, w, 4).
        Returns (test scores (Nte, Ns, h, w, 1), bbox preds (Nte, Ns, h, w, 4))."""
        Ntr, Ns = train_imgs.shape[0], train_imgs.shape[1]
        Nte = test_imgs.shape[0]
        tr = self.extract_backbone(train_imgs.reshape((-1,) + train_imgs.shape[2:]),
                                   train=train)
        te = self.extract_backbone(test_imgs.reshape((-1,) + test_imgs.shape[2:]),
                                   train=train)
        tr_f = self.get_backbone_head_feat(tr)
        te_f = self.get_backbone_head_feat(te)
        tr_f = tr_f.reshape((Ntr, Ns) + tr_f.shape[1:])
        te_f = te_f.reshape((Nte, Ns) + te_f.shape[1:])
        return self.head(tr_f, te_f, train_label, train_ltrb, train=train)


def tompnet50(filter_size: int = 4, head_layer: str = "layer3",
              head_feat_blocks: int = 0, head_feat_norm: bool = True,
              final_conv: bool = True, out_feature_dim: int = 512, nhead: int = 8,
              num_encoder_layers: int = 6, num_decoder_layers: int = 6,
              dim_feedforward: int = 2048, feature_sz: int = 18,
              use_test_frame_encoding: bool = True,
              backbone_dtype=None, transformer_dtype=None,
              freeze_backbone_bn: bool = False) -> ToMPnet:
    """ToMP-50 (reference tompnet.py:82-121). backbone_dtype=jnp.bfloat16 runs the
    backbone convs/BN in bf16 (params stay f32); transformer_dtype=jnp.bfloat16 runs
    the filter-predictor transformer's matmuls in bf16 (f32 softmax/LayerNorm)."""
    backbone = backbones.resnet50(output_layers=(head_layer,), dtype=backbone_dtype)
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    head_fe = ResidualBottleneck(feature_dim=256, num_blocks=head_feat_blocks,
                                 l2norm=head_feat_norm, final_conv=final_conv,
                                 norm_scale=norm_scale, out_dim=out_feature_dim)
    transformer = Transformer(d_model=out_feature_dim, nhead=nhead,
                              num_encoder_layers=num_encoder_layers,
                              num_decoder_layers=num_decoder_layers,
                              dim_feedforward=dim_feedforward,
                              dtype=transformer_dtype)
    fp = FilterPredictor(transformer, feature_sz=feature_sz,
                         use_test_frame_encoding=use_test_frame_encoding)
    classifier = LinearFilterClassifier(num_channels=out_feature_dim)
    bb_regressor = DenseBoxRegressor(num_channels=out_feature_dim)
    head = Head(filter_predictor=fp, feature_extractor=head_fe, classifier=classifier,
                bb_regressor=bb_regressor)
    return ToMPnet(feature_extractor=backbone, head=head, head_layer=head_layer,
                   freeze_backbone_bn=freeze_backbone_bn)


def tompnet101(filter_size: int = 4, head_layer: str = "layer3",
               out_feature_dim: int = 512, feature_sz: int = 18,
               backbone_dtype=None, transformer_dtype=None,
               freeze_backbone_bn: bool = False, **kwargs) -> ToMPnet:
    """ToMP-101 (reference tompnet.py:124-163)."""
    backbone = backbones.resnet101(output_layers=(head_layer,),
                                   dtype=backbone_dtype)
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    head_fe = ResidualBottleneck(feature_dim=256, num_blocks=0, l2norm=True,
                                 final_conv=True, norm_scale=norm_scale,
                                 out_dim=out_feature_dim)
    transformer = Transformer(d_model=out_feature_dim, nhead=kwargs.get("nhead", 8),
                              num_encoder_layers=kwargs.get("num_encoder_layers", 6),
                              num_decoder_layers=kwargs.get("num_decoder_layers", 6),
                              dim_feedforward=kwargs.get("dim_feedforward", 2048),
                              dtype=transformer_dtype)
    fp = FilterPredictor(transformer, feature_sz=feature_sz)
    head = Head(filter_predictor=fp, feature_extractor=head_fe,
                classifier=LinearFilterClassifier(num_channels=out_feature_dim),
                bb_regressor=DenseBoxRegressor(num_channels=out_feature_dim))
    return ToMPnet(feature_extractor=backbone, head=head, head_layer=head_layer,
                   freeze_backbone_bn=freeze_backbone_bn)
