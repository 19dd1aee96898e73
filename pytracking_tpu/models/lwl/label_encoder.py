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

from pytracking_tpu.models.backbones.resnet import BasicBlock
from pytracking_tpu.models.layers.blocks import ConvBlock


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
        x = BasicBlock(self.layer_dims[1], stride=2, downsample=True,
                       name="res1")(x, train=train)
        x = BasicBlock(self.layer_dims[2], stride=2, downsample=True,
                       name="res2")(x, train=train)
        label = ConvBlock(self.layer_dims[3], 3, batch_norm=self.use_bn,
                          name="label_pred")(x, train=train)
        sw = nn.Conv(self.layer_dims[3], (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.ones, name="samp_w_pred")(x)
        out_shape = (Nf, Ns) + label.shape[1:]
        return label.reshape(out_shape), sw.reshape(out_shape)
