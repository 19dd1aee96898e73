"""LWL network: backbone + few-shot-learned target model + segmentation decoder.

Re-design of reference `ltr/models/lwl/lwl_net.py` (LWTLNet:18,
steepest_descent_resnet50:147). Tracking-time usage exposes `extract_backbone`,
`extract_target_model_features`, `label_encode`, `tm_get_filter`, `segment_target`;
the `__call__` forward is the stage-2-style training path (sequential test frames with
causal model updates as a lax.scan).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.classifier.features import ResidualBasicBlock
from pytracking_tpu.models.lwl.decoder import LWTLDecoder
from pytracking_tpu.models.lwl.label_encoder import ResidualDS16SW
from pytracking_tpu.models.lwl.linear_filter import LWLLinearFilter


class LWTLNet(nn.Module):
    feature_extractor: nn.Module
    target_model: LWLLinearFilter
    decoder: LWTLDecoder
    label_encoder: ResidualDS16SW
    target_model_input_layer: str = "layer3"
    decoder_input_layers: Tuple[str, ...] = ("layer4", "layer3", "layer2", "layer1")
    backbone_norm: str = "bgr255"   # mrcnn backbones are Caffe2 BGR-255 models

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        if self.backbone_norm == "bgr255":
            x = backbones.normalize_image_bgr255(im)
        else:
            x = backbones.normalize_image(im)
        return self.feature_extractor(x, train=train)

    def extract_target_model_features(self, backbone_feat, train: bool = False):
        return self.target_model.extract_target_model_features(
            backbone_feat[self.target_model_input_layer], train=train)

    def label_encode(self, masks, feat=None, train: bool = False):
        """masks (Nf, Ns, H, W) -> (label (Nf, Ns, h, w, K), sw (same))."""
        return self.label_encoder(masks, feat, train=train)

    def tm_get_filter(self, feat, label, sample_weight=None, num_iter=None):
        return self.target_model.get_filter(feat, label, sample_weight, num_iter)

    def tm_update_filter(self, filt, feat, label, sample_weight=None, num_iter=2):
        """Continue optimizing an existing filter on extended data."""
        w, _, _ = self.target_model.update_filter(filt, feat, label, sample_weight,
                                                  num_iter)
        return w

    def segment_target(self, filt, test_feat_tm, backbone_feat,
                       image_size: Tuple[int, int], train: bool = False):
        """(reference lwl_net.py:118-128). test_feat_tm (1, 1, h, w, C);
        backbone_feat: layer -> (1, H_l, W_l, C_l). Returns (mask logits (H, W),
        mask encoding)."""
        enc = self.target_model.apply_target_model(filt, test_feat_tm)  # (1,1,h,w,K)
        feats = {k: backbone_feat[k] for k in self.decoder_input_layers}
        mask, _ = self.decoder(enc.reshape((-1,) + enc.shape[2:]), feats, image_size,
                               train=train)
        return mask[0, :, :, 0], enc

    def __call__(self, train_imgs, test_imgs, train_masks, test_masks=None,
                 num_refinement_iter: int = 2, train: bool = True):
        """Training forward (reference lwl_net.py:34-116): learn the target model on
        the train frames, then scan over test frames — predict the mask, re-encode the
        prediction, and refine the model causally.

        train_imgs (Ntr, Ns, H, W, 3); train_masks (Ntr, Ns, H, W).
        Returns mask logits (Nte, Ns, H, W)."""
        Ntr, Ns = train_imgs.shape[0], train_imgs.shape[1]
        Nte = test_imgs.shape[0]
        H, W = train_imgs.shape[2], train_imgs.shape[3]

        tr_bb = self.extract_backbone(train_imgs.reshape((-1,) + train_imgs.shape[2:]),
                                      train=train)
        te_bb = self.extract_backbone(test_imgs.reshape((-1,) + test_imgs.shape[2:]),
                                      train=train)

        def to_ns(f, n):
            return f.reshape((n, Ns) + f.shape[1:])

        tr_tm = to_ns(self.target_model.extract_target_model_features(
            tr_bb[self.target_model_input_layer], train=train), Ntr)
        te_tm = to_ns(self.target_model.extract_target_model_features(
            te_bb[self.target_model_input_layer], train=train), Nte)

        label, sw = self.label_encoder(train_masks, tr_tm, train=train)
        filt, _, _ = self.target_model.get_filter(tr_tm, label, sw)

        te_bb_ns = {k: to_ns(v, Nte) for k, v in te_bb.items()}

        # causal scan over test frames with a fixed-size (Ntr + Nte)-slot training set:
        # slots beyond the current frame count carry zero sample weight.
        M = Ntr + Nte
        feat_mem = jnp.zeros((M,) + tr_tm.shape[1:]).at[:Ntr].set(tr_tm)
        label_mem = jnp.zeros((M,) + label.shape[1:]).at[:Ntr].set(label)
        sw_mem = jnp.zeros((M,) + sw.shape[1:]).at[:Ntr].set(sw)

        masks_out = []
        for i in range(Nte):
            feat_i = te_tm[i:i + 1]
            bb_i = {k: v[i] for k, v in te_bb_ns.items()}
            enc = self.target_model.apply_target_model(filt, feat_i)
            feats = {k: bb_i[k] for k in self.decoder_input_layers}
            mask, _ = self.decoder(enc.reshape((-1,) + enc.shape[2:]), feats, (H, W),
                                   train=train)
            mask = mask.reshape(1, Ns, H, W)
            masks_out.append(mask)

            if i < Nte - 1 and num_refinement_iter > 0:
                prob = jax.nn.sigmoid(jax.lax.stop_gradient(mask))
                new_label, new_sw = self.label_encoder(prob, feat_i, train=train)
                feat_mem = feat_mem.at[Ntr + i].set(feat_i[0])
                label_mem = label_mem.at[Ntr + i].set(new_label[0])
                sw_mem = sw_mem.at[Ntr + i].set(new_sw[0])
                filt = self.tm_update_filter(filt, feat_mem, label_mem, sw_mem,
                                             num_iter=num_refinement_iter)

        return jnp.concatenate(masks_out, axis=0)


def steepest_descent_resnet50(filter_size: int = 3, num_filters: int = 16,
                              optim_iter: int = 5, optim_init_reg: float = 0.01,
                              clf_feat_blocks: int = 0, clf_feat_norm: bool = True,
                              final_conv: bool = True, out_feature_dim: int = 512,
                              target_model_input_layer: str = "layer3",
                              decoder_input_layers=("layer4", "layer3", "layer2",
                                                    "layer1"),
                              label_encoder_dims=(16, 32, 64),
                              decoder_mdim: int = 64,
                              use_bn_in_label_enc: bool = False,
                              backbone_type: str = "mrcnn") -> LWTLNet:
    """LWL net. Defaults are the lwl_stage2 recipe values (reference
    lwl_net.py:147-209, train_settings/lwl/lwl_stage2.py:94-102): maskrcnn
    backbone (BGR-255), clf_feat_blocks=0 + final_conv, no BN in the label
    encoder."""
    if backbone_type == "mrcnn":
        backbone = backbones.resnet50_mrcnn(output_layers=("layer1", "layer2",
                                                           "layer3", "layer4"))
        norm = "bgr255"
    else:
        backbone = backbones.resnet50(output_layers=("layer1", "layer2", "layer3",
                                                     "layer4"))
        norm = "imagenet"
    norm_scale = math.sqrt(1.0 / (out_feature_dim * filter_size * filter_size))
    tm_feat = ResidualBasicBlock(feature_dim=1024, num_blocks=clf_feat_blocks,
                                 l2norm=clf_feat_norm, final_conv=final_conv,
                                 norm_scale=norm_scale, out_dim=out_feature_dim)
    label_encoder = ResidualDS16SW(layer_dims=tuple(label_encoder_dims) + (num_filters,),
                                   use_bn=use_bn_in_label_enc)
    target_model = LWLLinearFilter(filter_size=filter_size, num_filters=num_filters,
                                   feature_dim=out_feature_dim, num_iter=optim_iter,
                                   init_filter_reg=optim_init_reg,
                                   feature_extractor=tm_feat)
    decoder = LWTLDecoder(in_channels=num_filters, out_channels=decoder_mdim,
                          ft_layers=tuple(decoder_input_layers), use_bn=True)
    return LWTLNet(feature_extractor=backbone, target_model=target_model,
                   decoder=decoder, label_encoder=label_encoder,
                   target_model_input_layer=target_model_input_layer,
                   decoder_input_layers=tuple(decoder_input_layers),
                   backbone_norm=norm)


class LWTLBoxNet(LWTLNet):
    """LWL with a box-initialized label encoder (reference lwl_box_net.py:17
    LWTLBoxNet): a second encoder renders the first-frame bounding box as a Gaussian
    prior and predicts the few-shot label from it, so the tracker can start from a box
    instead of a mask. Only the box encoder (+decoder head) is trained in the boxinit
    stage (reference train_settings/lwl/lwl_boxinit.py)."""
    box_label_encoder: Optional[nn.Module] = None

    def encode_box(self, bb, feat_tm, im_sz, train: bool = False):
        """bb (Nf, Ns, 4); feat_tm (Nf, Ns, h, w, C) -> (label, sample_w)."""
        return self.box_label_encoder(bb, feat_tm, im_sz, train=train)

    def box_forward(self, train_imgs, train_bb, train: bool = True):
        """Box-init training forward (reference LWLBoxActor, actors/segmentation.py:
        90-140): encode the boxes, decode masks for the SAME frames; the loss
        supervises them with the ground-truth masks."""
        Ntr, Ns = train_imgs.shape[0], train_imgs.shape[1]
        H, W = train_imgs.shape[2], train_imgs.shape[3]
        bb_feat = self.extract_backbone(
            train_imgs.reshape((-1,) + train_imgs.shape[2:]), train=train)
        feat_tm = self.target_model.extract_target_model_features(
            bb_feat[self.target_model_input_layer], train=train)
        feat_tm = feat_tm.reshape((Ntr, Ns) + feat_tm.shape[1:])
        label, _ = self.encode_box(train_bb, feat_tm, (H, W), train=train)
        feats = {k: bb_feat[k] for k in self.decoder_input_layers}
        mask, _ = self.decoder(label.reshape((-1,) + label.shape[2:]), feats, (H, W),
                               train=train)
        return mask.reshape(Ntr, Ns, H, W)

    def segment_target_from_box(self, bb, feat_tm, backbone_feat,
                                image_size, train: bool = False):
        """Tracker-side box initialization: box -> label -> filter-free decode, used
        to bootstrap the first-frame mask (reference lwl_box_net.py:126-136)."""
        label, _ = self.encode_box(bb, feat_tm, image_size, train=train)
        feats = {k: backbone_feat[k] for k in self.decoder_input_layers}
        mask, _ = self.decoder(label.reshape((-1,) + label.shape[2:]), feats,
                               image_size, train=train)
        return mask[0, :, :, 0], label


def steepest_descent_resnet50_boxinit(filter_size: int = 3, num_filters: int = 16,
                                      optim_iter: int = 5,
                                      optim_init_reg: float = 0.01,
                                      out_feature_dim: int = 512,
                                      label_encoder_dims=(16, 32, 64),
                                      box_label_encoder_dims=(16, 32, 64, 64),
                                      decoder_mdim: int = 64) -> LWTLBoxNet:
    """LWL box-init net (reference lwl_box_net.py:155-240)."""
    from pytracking_tpu.models.lwl.label_encoder import ResidualDS16FeatSWBox

    base = steepest_descent_resnet50(filter_size=filter_size,
                                     num_filters=num_filters, optim_iter=optim_iter,
                                     optim_init_reg=optim_init_reg,
                                     out_feature_dim=out_feature_dim,
                                     label_encoder_dims=label_encoder_dims,
                                     decoder_mdim=decoder_mdim)
    box_enc = ResidualDS16FeatSWBox(layer_dims=tuple(box_label_encoder_dims) +
                                    (num_filters,), use_bn=True)
    return LWTLBoxNet(feature_extractor=base.feature_extractor,
                      target_model=base.target_model, decoder=base.decoder,
                      label_encoder=base.label_encoder,
                      box_label_encoder=box_enc,
                      target_model_input_layer=base.target_model_input_layer,
                      decoder_input_layers=base.decoder_input_layers,
                      backbone_norm=base.backbone_norm)
