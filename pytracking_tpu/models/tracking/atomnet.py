"""ATOM network: ResNet backbone + IoU-Net (the classifier is purely online).

Re-design of reference `ltr/models/bbreg/atom.py` (ATOMnet:7, atom_resnet18:60,
atom_resnet50:74). At tracking time the backbone provides layer2/layer3 features: the
online discriminative classifier consumes layer3; the IoU-Net consumes both.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet


class ATOMnet(nn.Module):
    feature_extractor: nn.Module
    bb_regressor: AtomIoUNet
    bb_regressor_layer: Tuple[str, ...] = ("layer2", "layer3")

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        x = backbones.normalize_image(im)
        return self.feature_extractor(x, train=train)

    def get_backbone_bbreg_feat(self, backbone_feat):
        return [backbone_feat[l] for l in self.bb_regressor_layer]

    def iou_get_modulation(self, backbone_feat, bb):
        return self.bb_regressor.get_modulation(
            self.get_backbone_bbreg_feat(backbone_feat), bb)

    def iou_get_iou_feat(self, backbone_feat):
        return self.bb_regressor.get_iou_feat(self.get_backbone_bbreg_feat(backbone_feat))

    def iou_predict(self, modulation, iou_feat, proposals):
        return self.bb_regressor.predict_iou(modulation, iou_feat, proposals)

    def __call__(self, train_imgs, test_imgs, train_bb, test_proposals,
                 train: bool = True):
        """Training forward (reference bbreg/atom.py:20-57): IoU prediction only."""
        N_tr, S = train_imgs.shape[0], train_imgs.shape[1]
        N_te = test_imgs.shape[0]
        tr_feat = self.extract_backbone(train_imgs.reshape((-1,) + train_imgs.shape[2:]),
                                        train=train)
        te_feat = self.extract_backbone(test_imgs.reshape((-1,) + test_imgs.shape[2:]),
                                        train=train)

        def to_ns(f, n):
            return f.reshape((n, S) + f.shape[1:])

        tr_iou = [to_ns(tr_feat[l], N_tr) for l in self.bb_regressor_layer]
        te_iou = [to_ns(te_feat[l], N_te) for l in self.bb_regressor_layer]
        return self.bb_regressor(tr_iou, te_iou, train_bb, test_proposals, train=train)


def atom_resnet18(iou_input_dim=(256, 256), iou_inter_dim=(256, 256)) -> ATOMnet:
    backbone = backbones.resnet18(output_layers=("layer2", "layer3"))
    bb_regressor = AtomIoUNet(input_dim=(128, 256), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return ATOMnet(feature_extractor=backbone, bb_regressor=bb_regressor)


def atom_resnet50(iou_input_dim=(256, 256), iou_inter_dim=(256, 256)) -> ATOMnet:
    backbone = backbones.resnet50(output_layers=("layer2", "layer3"))
    bb_regressor = AtomIoUNet(input_dim=(512, 1024), pred_input_dim=tuple(iou_input_dim),
                              pred_inter_dim=tuple(iou_inter_dim))
    return ATOMnet(feature_extractor=backbone, bb_regressor=bb_regressor)
