"""ATOM IoU-Net: modulation-based IoU predictor for bounding-box refinement.

Re-design of reference `ltr/models/bbreg/atom_iou_net.py` (AtomIoUNet:15). Two backbone
layers (layer2 stride 8, layer3 stride 16) feed reference-branch modulation vectors and
test-branch IoU features; `predict_iou` pools proposal boxes with precise RoI pooling at
two scales and regresses the IoU. `predict_iou` is differentiable w.r.t. the proposal
boxes (through prroi_pool2d), which is what the tracker's gradient-ascent box refinement
uses (`pytracking/tracker/dimp/dimp.py:725-751`) — in JAX that is just `jax.grad` of this
function inside the jitted track step.

Layout NHWC; boxes are xywh in image(-patch) coordinates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.layers.blocks import ConvBlock, LinearBlock
from pytracking_tpu.ops.prroi_pool import prroi_pool2d


def _xywh_to_xyxy(bb: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([bb[..., :2], bb[..., :2] + bb[..., 2:4]], axis=-1)


class AtomIoUNet(nn.Module):
    input_dim: Tuple[int, int] = (512, 1024)   # ResNet-50 layer2/layer3 channels
    pred_input_dim: Tuple[int, int] = (256, 256)
    pred_inter_dim: Tuple[int, int] = (256, 256)

    def setup(self):
        self.conv3_1r = ConvBlock(128, 3, 1)
        self.conv3_1t = ConvBlock(256, 3, 1)
        self.conv3_2t = ConvBlock(self.pred_input_dim[0], 3, 1)
        self.fc3_1r = ConvBlock(256, 3, 1, padding=0)
        self.conv4_1r = ConvBlock(256, 3, 1)
        self.conv4_1t = ConvBlock(256, 3, 1)
        self.conv4_2t = ConvBlock(self.pred_input_dim[1], 3, 1)
        self.fc34_3r = ConvBlock(self.pred_input_dim[0], 1, 1, padding=0)
        self.fc34_4r = ConvBlock(self.pred_input_dim[1], 1, 1, padding=0)
        self.fc3_rt = LinearBlock(self.pred_inter_dim[0])
        self.fc4_rt = LinearBlock(self.pred_inter_dim[1])
        self.iou_predictor = nn.Dense(1, kernel_init=nn.initializers.he_normal())

    def get_modulation(self, feat: Sequence[jnp.ndarray], bb: jnp.ndarray,
                       train: bool = False):
        """Reference-branch modulation vectors from first-frame features + target box
        (reference atom_iou_net.py:138-170). feat: [layer2 (B,H,W,C2), layer3 (B,h,w,C3)];
        bb (B, 4) xywh. Returns two (B, D) vectors."""
        feat3_r, feat4_r = feat
        B = bb.shape[0]
        rois = _xywh_to_xyxy(bb.reshape(-1, 4).astype(jnp.float32))
        bidx = jnp.arange(B, dtype=jnp.int32)

        c3_r = self.conv3_1r(feat3_r, train=train)
        roi3r = prroi_pool2d(c3_r, rois, bidx, (3, 3), 1 / 8)
        c4_r = self.conv4_1r(feat4_r, train=train)
        roi4r = prroi_pool2d(c4_r, rois, bidx, (1, 1), 1 / 16)

        fc3_r = self.fc3_1r(roi3r, train=train)   # 3x3 conv, pad 0 -> (B,1,1,256)
        fc34_r = jnp.concatenate([fc3_r, roi4r], axis=-1)
        fc34_3_r = self.fc34_3r(fc34_r, train=train).reshape(B, -1)
        fc34_4_r = self.fc34_4r(fc34_r, train=train).reshape(B, -1)
        return fc34_3_r, fc34_4_r

    def get_iou_feat(self, feat2: Sequence[jnp.ndarray], train: bool = False):
        """Test-branch IoU features (reference atom_iou_net.py:172-179)."""
        feat3_t, feat4_t = [f.reshape((-1,) + f.shape[-3:]) for f in feat2]
        c3_t = self.conv3_2t(self.conv3_1t(feat3_t, train=train), train=train)
        c4_t = self.conv4_2t(self.conv4_1t(feat4_t, train=train), train=train)
        return c3_t, c4_t

    def predict_iou(self, modulation, feat, proposals: jnp.ndarray,
                    train: bool = False) -> jnp.ndarray:
        """IoU of each proposal (reference atom_iou_net.py:96-136).

        modulation: two (B, D) vectors; feat: two (B, H, W, D) maps;
        proposals: (B, P, 4) xywh. Returns (B, P). Differentiable w.r.t. proposals.
        """
        fc34_3_r, fc34_4_r = modulation
        c3_t, c4_t = feat
        B, P = proposals.shape[0], proposals.shape[1]

        c3_t_att = c3_t * fc34_3_r[:, None, None, :]
        c4_t_att = c4_t * fc34_4_r[:, None, None, :]

        rois = _xywh_to_xyxy(proposals.reshape(-1, 4).astype(jnp.float32))
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
        roi3t = prroi_pool2d(c3_t_att, rois, bidx, (5, 5), 1 / 8)
        roi4t = prroi_pool2d(c4_t_att, rois, bidx, (3, 3), 1 / 16)

        fc3_rt = self.fc3_rt(roi3t, train=train)
        fc4_rt = self.fc4_rt(roi4t, train=train)
        fc34_rt = jnp.concatenate([fc3_rt, fc4_rt], axis=-1)
        return self.iou_predictor(fc34_rt).reshape(B, P)

    def __call__(self, feat1, feat2, bb1, proposals2, train: bool = False):
        """Training forward (reference atom_iou_net.py:66-94): feat1/feat2 are lists of
        (N, S, H, W, C) features; bb1 (N, S, 4); proposals2 (N, S, P, 4).
        Returns (N, S, P) IoU predictions."""
        N, S, P = proposals2.shape[0], proposals2.shape[1], proposals2.shape[2]
        # first train frame defines the modulation
        feat1_first = [f[0] for f in feat1]
        modulation = self.get_modulation(feat1_first, bb1[0], train=train)
        iou_feat = self.get_iou_feat([f.reshape((-1,) + f.shape[-3:]) for f in feat2],
                                     train=train)
        modulation = [jnp.tile(m[None], (N, 1, 1)).reshape(N * S, -1) for m in modulation]
        pred = self.predict_iou(modulation, iou_feat, proposals2.reshape(N * S, P, 4),
                                train=train)
        return pred.reshape(N, S, P)
