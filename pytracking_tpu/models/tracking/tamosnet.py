"""TaMOs network: multi-object transformer tracking with an FPN for high-res outputs.

Re-design of reference `ltr/models/tracking/tamosnet.py` (TaMOsNet:13,
tamosnet_resnet50:82) and the FPN/FPNHead from `ltr/models/transformer/heads.py`
(FPN:144, FPNHead:165): one shared model predictor emits one target model per object in
a single forward; the FPN fuses the transformer-enhanced stride-16 features with the
stride-8 backbone layer for higher-resolution classification/regression.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.classifier.features import ResidualBottleneck
from pytracking_tpu.models.transformer.got_filter_predictor import GOTFilterPredictor
from pytracking_tpu.models.transformer.heads import (DenseBoxRegressor,
                                                     LinearFilterClassifier,
                                                     _apply_filter_ns)
from pytracking_tpu.models.transformer.transformer import Transformer


class FPN(nn.Module):
    """Two-level feature pyramid (reference heads.py:144-162): the transformer-enhanced
    stride-16 map is upsampled and fused with the lateral stride-8 backbone layer."""
    output_dim: int = 256

    @nn.compact
    def __call__(self, feat_enc, feat_high):
        """feat_enc (B, h, w, C); feat_high (B, 2h, 2w, C2) -> dict with 'feat2'
        (high-res) and 'feat3' (low-res), both output_dim channels."""
        lat3 = nn.Conv(self.output_dim, (1, 1), name="lateral3")(feat_enc)
        lat2 = nn.Conv(self.output_dim, (1, 1), name="lateral2")(feat_high)
        up3 = jax.image.resize(lat3, lat2.shape[:1] + lat2.shape[1:3] +
                               (self.output_dim,), "nearest")
        feat2 = lat2 + up3
        feat2 = nn.Conv(self.output_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        name="smooth2")(feat2)
        feat3 = nn.Conv(self.output_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        name="smooth3")(lat3)
        return {"feat2": feat2, "feat3": feat3}


class TaMOsNet(nn.Module):
    feature_extractor: nn.Module
    head_feature_extractor: nn.Module
    filter_predictor: GOTFilterPredictor
    classifier: LinearFilterClassifier
    bb_regressor: DenseBoxRegressor
    fpn: FPN
    head_layer: str = "layer3"
    high_res_layer: str = "layer2"
    # reference trainer's freeze_backbone_bn_layers (tamos_resnet50.py:186-187)
    freeze_backbone_bn: bool = False

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        x = backbones.normalize_image(im)
        return self.feature_extractor(x,
                                      train=train and not self.freeze_backbone_bn)

    def extract_head_feat(self, backbone_feat, train: bool = False):
        """(B, H, W, C) head-layer backbone feature -> head feature."""
        return self.head_feature_extractor(backbone_feat[self.head_layer],
                                           train=train)

    def predict_filters(self, train_feat, test_feat, train_label,
                        train_frame_mask=None):
        return self.filter_predictor.predict_filter(
            train_feat, test_feat, train_label, train_frame_mask=train_frame_mask)

    def predict_filters_parallel(self, train_feat, test_feat, train_label,
                                 train_ltrb, train_frame_mask, gth_frame_mask):
        """Parallel cls/bbreg filters (reference heads.py:75-81 ->
        filter_predictor.py:235): cls from all valid memory frames, bbreg from
        the ground-truth (init) frame only."""
        return self.filter_predictor.predict_cls_bbreg_filters_parallel(
            train_feat, test_feat, train_label, train_ltrb,
            train_frame_mask, gth_frame_mask)

    def classify_trafo(self, test_feat_enc, filters, out_hw):
        """Inference-time classification on the TRANSFORMER stride-16 feature,
        bicubically upsampled to the FPN high-res grid (reference
        tamos.py:313-321, cls_feature_type default 'trafo'; jax's cubic kernel
        uses a=-0.5 vs torch bicubic a=-0.75 — a sub-percent smoothing
        difference on these low-frequency maps)."""
        scores = self.classify(test_feat_enc, filters)     # (Nf, Ns, H, W, K)
        Nf, Ns, H, W, K = scores.shape
        return jax.image.resize(scores, (Nf, Ns, out_hw[0], out_hw[1], K),
                                "cubic")

    def run_fpn(self, test_feat_enc, backbone_feat):
        """test_feat_enc (Nf, Ns, h, w, C) -> dict of (Nf, Ns, ...) pyramid feats."""
        Nf, Ns = test_feat_enc.shape[:2]
        enc = test_feat_enc.reshape((-1,) + test_feat_enc.shape[2:])
        high = backbone_feat[self.high_res_layer]
        out = self.fpn(enc, high)
        return {k: v.reshape((Nf, Ns) + v.shape[1:]) for k, v in out.items()}

    def classify(self, feat, filters):
        """feat (Nf, Ns, h, w, C); filters (Ns, K, 1, 1, C, 1) -> scores
        (Nf, Ns, h, w, K)."""
        Ns, K = filters.shape[0], filters.shape[1]
        f = filters.transpose(0, 2, 3, 4, 1, 5).reshape(Ns, 1, 1, -1, K)
        return self.classifier(feat, f)

    def bbreg(self, feat, filters):
        """Per-object dense LTRB: vmap the regressor over the object axis ->
        (Nf, Ns, h, w, K, 4)."""
        def one(fk):
            return self.bb_regressor(feat, fk)

        K = filters.shape[1]
        outs = [one(filters[:, k]) for k in range(K)]
        return jnp.stack(outs, axis=-2)

    def __call__(self, train_imgs, test_imgs, train_label, train_ltrb=None,
                 train: bool = True):
        """Training forward (reference tamosnet.py:34-79). train_label
        (Ntr, Ns, K, h, w). Returns (scores (Nte, Ns, h2, w2, K), ltrb preds
        (Nte, Ns, h2, w2, K, 4)) on the high-res FPN level."""
        Ntr, Ns = train_imgs.shape[0], train_imgs.shape[1]
        Nte = test_imgs.shape[0]
        tr = self.extract_backbone(train_imgs.reshape((-1,) + train_imgs.shape[2:]),
                                   train=train)
        te = self.extract_backbone(test_imgs.reshape((-1,) + test_imgs.shape[2:]),
                                   train=train)

        def to_ns(f, n):
            return f.reshape((n, Ns) + f.shape[1:])

        tr_f = to_ns(self.extract_head_feat(tr, train=train), Ntr)
        te_f = to_ns(self.extract_head_feat(te, train=train), Nte)

        filters, te_enc = self.filter_predictor.predict_filter(tr_f, te_f, train_label,
                                                               train_ltrb, train=train)
        pyr = self.run_fpn(te_enc, te)
        scores = self.classify(pyr["feat2"], filters)
        ltrb = self.bbreg(pyr["feat2"], filters)
        return scores, ltrb


def tamosnet_resnet50(filter_size: int = 1, head_layer: str = "layer3",
                      out_feature_dim: int = 256, nhead: int = 8,
                      num_encoder_layers: int = 6, num_decoder_layers: int = 6,
                      dim_feedforward: int = 2048, feature_sz: int = 36,
                      num_tokens: int = 10, box_enc: str = "ltrb_token",
                      backbone_dtype=None, transformer_dtype=None,
                      freeze_backbone_bn: bool = False) -> TaMOsNet:
    # feature_sz: max spatial resolution for the anti-aliased positional encoding —
    # the recipe trains at (36, 24), reference PositionEmbeddingSine takes max(...)
    """(reference tamosnet.py:82-131)"""
    backbone = backbones.resnet50(output_layers=("layer2", "layer3"),
                                  dtype=backbone_dtype)
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    head_fe = ResidualBottleneck(feature_dim=256, num_blocks=0, l2norm=True,
                                 final_conv=True, norm_scale=norm_scale,
                                 out_dim=out_feature_dim)
    transformer = Transformer(d_model=out_feature_dim, nhead=nhead,
                              num_encoder_layers=num_encoder_layers,
                              num_decoder_layers=num_decoder_layers,
                              dim_feedforward=dim_feedforward,
                              dtype=transformer_dtype)
    fp = GOTFilterPredictor(transformer, feature_sz=feature_sz,
                            num_tokens=num_tokens, box_enc=box_enc)
    return TaMOsNet(feature_extractor=backbone, head_feature_extractor=head_fe,
                    filter_predictor=fp,
                    classifier=LinearFilterClassifier(num_channels=out_feature_dim),
                    bb_regressor=DenseBoxRegressor(num_channels=out_feature_dim),
                    fpn=FPN(output_dim=out_feature_dim), head_layer=head_layer,
                    freeze_backbone_bn=freeze_backbone_bn)


def tamosnet_swin_base(filter_size: int = 1, out_feature_dim: int = 256,
                       feature_sz: int = 36, num_tokens: int = 10,
                       box_enc: str = "ltrb_token", transformer_dtype=None,
                       **kwargs) -> TaMOsNet:
    """TaMOs with a Swin-Base backbone (reference tamosnet.py:134-180)."""
    from pytracking_tpu.models.backbones.swin import swin_base

    backbone = swin_base(output_layers=("stage2", "stage3"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    head_fe = ResidualBottleneck(feature_dim=128, num_blocks=0, l2norm=True,
                                 final_conv=True, norm_scale=norm_scale,
                                 out_dim=out_feature_dim, )
    transformer = Transformer(d_model=out_feature_dim,
                              nhead=kwargs.get("nhead", 8),
                              num_encoder_layers=kwargs.get("num_encoder_layers", 6),
                              num_decoder_layers=kwargs.get("num_decoder_layers", 6),
                              dim_feedforward=kwargs.get("dim_feedforward", 2048),
                              dtype=transformer_dtype)
    fp = GOTFilterPredictor(transformer, feature_sz=feature_sz, num_tokens=num_tokens,
                            box_enc=box_enc)
    return TaMOsNet(feature_extractor=backbone, head_feature_extractor=head_fe,
                    filter_predictor=fp,
                    classifier=LinearFilterClassifier(num_channels=out_feature_dim),
                    bb_regressor=DenseBoxRegressor(num_channels=out_feature_dim),
                    fpn=FPN(output_dim=out_feature_dim), head_layer="stage3",
                    high_res_layer="stage2")
