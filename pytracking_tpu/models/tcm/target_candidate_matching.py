"""Target candidate matching network (KeepTrack).

Re-design of reference `ltr/models/target_candidate_matching/target_candidate_matching.py`
(DescriptorExtractor:13, TargetCandidateMatchingNetwork:36,
target_candidate_matching_net_resnet50:90).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones import resnet as backbones
from pytracking_tpu.models.tcm.superglue import SuperGlueMatcher


class DescriptorExtractor(nn.Module):
    """Conv over classification features + gather at candidate coords
    (reference :13-33)."""
    descriptor_dim: int = 256
    kernel_size: int = 4

    @nn.compact
    def __call__(self, feat, coords):
        """feat (B, H, W, C); coords (B, K, 2) integer (row, col) on the feature grid.
        Returns (B, K, descriptor_dim)."""
        k = self.kernel_size
        f = nn.Conv(self.descriptor_dim, (k, k), padding=[(k // 2, k // 2)] * 2,
                    name="conv")(feat)
        coords = jnp.clip(coords.astype(jnp.int32), 0,
                          jnp.array([f.shape[1] - 1, f.shape[2] - 1]))

        def gather(fb, cb):
            return fb[cb[:, 0], cb[:, 1]]

        return jax.vmap(gather)(f, coords)


class TargetCandidateMatchingNetwork(nn.Module):
    feature_extractor: nn.Module
    descriptor_extractor: DescriptorExtractor
    matcher: SuperGlueMatcher
    classification_layer: str = "layer3"

    def extract_backbone(self, im: jnp.ndarray, train: bool = False):
        x = backbones.normalize_image(im)
        return self.feature_extractor(x, train=train)

    def get_descriptors(self, backbone_feat, coords):
        return self.descriptor_extractor(backbone_feat[self.classification_layer],
                                         coords)

    def match(self, img_coords0, img_coords1, desc0, desc1, scores0, scores1,
              valid0=None, valid1=None):
        return self.matcher(img_coords0, img_coords1, desc0, desc1, scores0, scores1,
                            valid0=valid0, valid1=valid1)

    def __call__(self, img0, img1, tsm_coords0, tsm_coords1, img_coords0, img_coords1,
                 scores0, scores1, train: bool = False):
        """Training forward (reference :47-75)."""
        f0 = self.extract_backbone(img0.reshape((-1,) + img0.shape[-3:]), train=train)
        f1 = self.extract_backbone(img1.reshape((-1,) + img1.shape[-3:]), train=train)
        d0 = self.get_descriptors(f0, tsm_coords0)
        d1 = self.get_descriptors(f1, tsm_coords1)
        return self.matcher(img_coords0, img_coords1, d0, d1, scores0, scores1,
                            train=train)


def target_candidate_matching_net_resnet50(num_gnn_layers: int = 2,
                                           num_sinkhorn_iterations: int = 10,
                                           image_shape=(352, 352)
                                           ) -> TargetCandidateMatchingNetwork:
    """(reference :90-117; KeepTrack uses GNN_layers=['self','cross']*2)."""
    backbone = backbones.resnet50(output_layers=("layer3",))
    descriptor_extractor = DescriptorExtractor(descriptor_dim=256, kernel_size=4)
    matcher = SuperGlueMatcher(input_dim=256, descriptor_dim=256,
                               num_gnn_layers=num_gnn_layers,
                               num_sinkhorn_iterations=num_sinkhorn_iterations,
                               image_shape=tuple(image_shape))
    return TargetCandidateMatchingNetwork(feature_extractor=backbone,
                                          descriptor_extractor=descriptor_extractor,
                                          matcher=matcher)
