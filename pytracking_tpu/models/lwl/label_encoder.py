"""Few-shot label encoders for LWL: encode a segmentation mask into the target-model
label space + spatial importance weights.

Re-design of reference `ltr/models/lwl/label_encoder.py` (ResidualDS16SW:9): mask at
image resolution → /16 features via strided conv + pool + two strided residual blocks;
two heads predict the few-shot label encoding and the sample weights (weight head
initialized to constant 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pytracking_tpu.models.layers.blocks import ConvBlock


class SegBasicBlock(nn.Module):
    """Reference ltr BasicBlock as instantiated by the label encoders
    (label_encoder.py:16-20): bias-free 3x3 convs with OPTIONAL BatchNorm
    (use_bn_in_label_enc=False in the lwl/rts recipes) and a 3x3 downsample conv
    WITH bias and no norm."""
    planes: int
    stride: int = 1
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (self.stride, self.stride)
        pad = [(1, 1), (1, 1)]
        out = nn.Conv(self.planes, (3, 3), strides=s, padding=pad, use_bias=False,
                      name="conv1")(x)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=pad, use_bias=False,
                      name="conv2")(out)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               name="bn2")(out)
        identity = nn.Conv(self.planes, (3, 3), strides=s, padding=pad,
                           use_bias=True, name="downsample")(x)
        return nn.relu(out + identity)


class ResidualDS16SW(nn.Module):
    """layer_dims e.g. (16, 32, 64) + num_filters output channels."""
    layer_dims: tuple = (16, 32, 64, 16)
    use_bn: bool = True

    @nn.compact
    def __call__(self, mask, feature=None, train: bool = False):
        """mask (Nf, Ns, H, W) in [0,1] -> (label_enc (Nf, Ns, H/16, W/16, K),
        sample_w (Nf, Ns, H/16, W/16, K))."""
        Nf, Ns = mask.shape[0], mask.shape[1]
        x = mask.reshape((-1,) + mask.shape[2:] + (1,))           # (B, H, W, 1)
        x = ConvBlock(self.layer_dims[0], 3, stride=2, batch_norm=self.use_bn,
                      name="conv_block")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = SegBasicBlock(self.layer_dims[1], stride=2, use_bn=self.use_bn,
                          name="res1")(x, train=train)
        x = SegBasicBlock(self.layer_dims[2], stride=2, use_bn=self.use_bn,
                          name="res2")(x, train=train)
        label = ConvBlock(self.layer_dims[3], 3, batch_norm=self.use_bn,
                          name="label_pred")(x, train=train)
        sw = nn.Conv(self.layer_dims[3], (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.ones, name="samp_w_pred")(x)
        out_shape = (Nf, Ns) + label.shape[1:]
        return label.reshape(out_shape), sw.reshape(out_shape)


def bbox_to_gauss(bb: jnp.ndarray, sz) -> jnp.ndarray:
    """Soft Gaussian box prior (reference label_encoder.py:175-187 bbox_to_gauss),
    vectorized: bb (B, 4) xywh in image coords -> (B, H, W, 1)."""
    H, W = sz
    cx = bb[:, 0] + bb[:, 2] / 2
    cy = bb[:, 1] + bb[:, 3] / 2
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    dx2 = (xs - cx[:, None, None]) ** 2 / jnp.maximum(0.25 * bb[:, 2], 1.0)[:, None, None] ** 2
    dy2 = (ys - cy[:, None, None]) ** 2 / jnp.maximum(0.25 * bb[:, 3], 1.0)[:, None, None] ** 2
    return jnp.exp(-0.5 * (dx2 + dy2))[..., None]


class ResidualDS16FeatSWBox(nn.Module):
    """Box-initialized label encoder (reference label_encoder.py:128-207): render the
    box as a Gaussian prior map, downsample it /16, concatenate target-model features,
    and predict the few-shot label + sample weights. Used by LWTLBoxNet for
    box-initialized VOS (reference lwl_box_net.py:17) and STANet.

    Matching the reference defaults (label_encoder.py:129,146): the conv_block
    and residual blocks default to NO BatchNorm (use_bn=False), but label_pred
    is a conv_block with the default batch_norm=True — controlled separately
    via final_bn."""
    layer_dims: tuple = (16, 32, 64, 64, 16)
    use_bn: bool = False
    use_gauss: bool = True
    final_bn: bool = True

    @nn.compact
    def __call__(self, bb, feat, im_sz, train: bool = False):
        """bb (Nf, Ns, 4) xywh in image coords; feat (Nf, Ns, H/16, W/16, C);
        im_sz (H, W). Returns (label_enc, sample_w), both (Nf, Ns, H/16, W/16, K)."""
        Nf, Ns = bb.shape[0], bb.shape[1]
        prior = bbox_to_gauss(bb.reshape(-1, 4), im_sz)            # (B, H, W, 1)
        x = ConvBlock(self.layer_dims[0], 3, stride=2, batch_norm=self.use_bn,
                      name="conv_block")(prior, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = SegBasicBlock(self.layer_dims[1], stride=2, use_bn=self.use_bn,
                          name="res1")(x, train=train)
        x = SegBasicBlock(self.layer_dims[2], stride=2, use_bn=self.use_bn,
                          name="res2")(x, train=train)
        f = feat.reshape((-1,) + feat.shape[2:])
        x = jnp.concatenate([x, f], axis=-1)
        x = SegBasicBlock(self.layer_dims[3], stride=1, use_bn=self.use_bn,
                          name="res3")(x, train=train)
        label = ConvBlock(self.layer_dims[4], 3, batch_norm=self.final_bn,
                          name="label_pred")(x, train=train)
        sw = nn.Conv(self.layer_dims[4], (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.ones, name="samp_w_pred")(x)
        out_shape = (Nf, Ns) + label.shape[1:]
        return label.reshape(out_shape), sw.reshape(out_shape)
