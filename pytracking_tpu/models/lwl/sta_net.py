"""STA (Segment-To-Track Adaptation) network: box-initialized segmentation used by
RTS to bootstrap a mask from a first-frame bounding box.

Re-design of reference `ltr/models/lwl/sta_net.py` (STANet:17,
steepest_descent_resnet50:99): two few-shot target models — one learned from the
box-encoded labels (coarse), one re-learned from the coarse mask prediction
(refined) — share one decoder whose input is the concatenation of the box label
encoding and the target-model scores.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.classifier.features import ResidualBasicBlock
from pytracking_tpu.models.lwl.decoder import LWTLDecoder
from pytracking_tpu.models.lwl.label_encoder import (ResidualDS16FeatSWBox,
                                                     ResidualDS16SW)
from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter


class STANet(nn.Module):
    feature_extractor: nn.Module
    target_model: LWLLinearFilter
    target_model_segm: LWLLinearFilter
    decoder: LWTLDecoder
    label_encoder: ResidualDS16FeatSWBox    # box -> decoder label channels
    bbox_encoder: ResidualDS16FeatSWBox     # box -> target-model labels + weights
    segm_encoder: ResidualDS16SW            # coarse mask -> refined labels + weights
    target_model_input_layer: str = "layer3"
    decoder_input_layers: Tuple[str, ...] = ("layer4", "layer3", "layer2", "layer1")

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        x = backbones.normalize_image(im)
        return self.feature_extractor(x, train=train)

    def extract_target_model_features(self, backbone_feat, train: bool = False):
        return self.target_model.extract_target_model_features(
            backbone_feat[self.target_model_input_layer], train=train)

    def _decode(self, bbox_enc, scores, backbone_feat, im_sz, train: bool = False):
        """Decoder input = concat(box encoding, target scores) along channels
        (reference sta_net.py:55,62)."""
        coarse = jnp.concatenate([bbox_enc, scores], axis=-1)
        feats = {k: backbone_feat[k] for k in self.decoder_input_layers}
        mask, _ = self.decoder(coarse.reshape((-1,) + coarse.shape[2:]), feats,
                               im_sz, train=train)
        return mask

    def __call__(self, train_imgs, train_bbox, train: bool = True):
        """Training forward (reference sta_net.py:36-66): box -> coarse mask ->
        segm-encoded refinement. train_imgs (Nf, Ns, H, W, 3);
        train_bbox (Nf, Ns, 4). Returns (coarse logits, refined logits), each
        (Nf, Ns, H, W)."""
        Nf, Ns = train_imgs.shape[0], train_imgs.shape[1]
        H, W = train_imgs.shape[2], train_imgs.shape[3]

        bb_feat = self.extract_backbone(
            train_imgs.reshape((-1,) + train_imgs.shape[2:]), train=train)
        feat_tm = self.extract_target_model_features(bb_feat, train=train)
        feat_tm = feat_tm.reshape((Nf, Ns) + feat_tm.shape[1:])

        bbox_label, _ = self.label_encoder(train_bbox, feat_tm, (H, W), train=train)
        tm_label, tm_sw = self.bbox_encoder(train_bbox, feat_tm, (H, W), train=train)

        filt, _, _ = self.target_model.get_filter(feat_tm, tm_label, tm_sw)
        scores = self.target_model.apply_target_model(filt, feat_tm)
        coarse = self._decode(bbox_label, scores, bb_feat, (H, W), train=train)
        coarse = coarse.reshape(Nf, Ns, H, W)

        prob = jax.nn.sigmoid(jax.lax.stop_gradient(coarse))
        segm_label, segm_sw = self.segm_encoder(prob, feat_tm, train=train)
        filt_segm, _, _ = self.target_model_segm.get_filter(feat_tm, segm_label,
                                                            segm_sw)
        scores_segm = self.target_model_segm.apply_target_model(filt_segm, feat_tm)
        refined = self._decode(bbox_label, scores_segm, bb_feat, (H, W),
                               train=train)
        return coarse, refined.reshape(Nf, Ns, H, W)

    def segment_target_add_bbox_encoder(self, bbox_label, filt, test_feat_tm,
                                        backbone_feat, segm: bool = False,
                                        train: bool = False):
        """Tracker-side single-frame decode (reference sta_net.py:68-81)."""
        tm = self.target_model_segm if segm else self.target_model
        scores = tm.apply_target_model(filt, test_feat_tm)
        H = test_feat_tm.shape[-3] * 16
        W = test_feat_tm.shape[-2] * 16
        mask = self._decode(bbox_label, scores, backbone_feat, (H, W), train=train)
        return mask[0, :, :, 0]


def sta_resnet50(filter_size: int = 3, num_filters: int = 16, optim_iter: int = 5,
                 optim_init_reg: float = 0.01, out_feature_dim: int = 512,
                 label_encoder_dims=(16, 32, 64), box_label_encoder_dims=(16, 32, 64),
                 decoder_mdim: int = 64, clf_feat_blocks: int = 1,
                 clf_final_conv: bool = False) -> STANet:
    """(reference sta_net.py:99-198 steepest_descent_resnet50).

    clf_feat_blocks/clf_final_conv select the target-model feature extractor
    layout: (1, False) is the reference constructor's default; (0, True) is the
    LWL-style layout (single 3x3 conv) — pass the latter when loading an
    sta.pth.tar trained with LWL-style settings (port_weights.port_stanet
    handles both)."""
    backbone = backbones.resnet50(output_layers=("layer1", "layer2", "layer3",
                                                 "layer4"))
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    tm_feat = ResidualBasicBlock(feature_dim=1024, num_blocks=clf_feat_blocks,
                                 l2norm=True,
                                 final_conv=clf_final_conv, norm_scale=norm_scale,
                                 out_dim=out_feature_dim)

    def make_tm():
        return LWLLinearFilter(filter_size=filter_size, num_filters=num_filters,
                               feature_dim=out_feature_dim, num_iter=optim_iter,
                               init_filter_reg=optim_init_reg,
                               feature_extractor=tm_feat)

    # decoder consumes bbox encoding + target scores -> 2*num_filters channels
    decoder = LWTLDecoder(in_channels=2 * num_filters, out_channels=decoder_mdim,
                          ft_layers=("layer4", "layer3", "layer2", "layer1"),
                          use_bn=True)
    return STANet(
        feature_extractor=backbone, target_model=make_tm(),
        target_model_segm=make_tm(), decoder=decoder,
        label_encoder=ResidualDS16FeatSWBox(
            layer_dims=tuple(box_label_encoder_dims) + (64, num_filters)),
        bbox_encoder=ResidualDS16FeatSWBox(
            layer_dims=tuple(box_label_encoder_dims) + (64, num_filters)),
        segm_encoder=ResidualDS16SW(
            layer_dims=tuple(label_encoder_dims) + (num_filters,)))
