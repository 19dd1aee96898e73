"""ECO tracker end-to-end smoke test (tiny backbone, synthetic target)."""

import numpy as np
import pytest


@pytest.mark.filterwarnings("ignore")
def test_eco_tracker_end_to_end():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.backbones import resnet as backbones
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.trackers.eco import ECOParams, ECOTracker
    from tests.test_dimp_tracker import make_frame

    class Wrapper(nn.Module):
        feature_extractor: nn.Module

        def extract_backbone(self, im, train: bool = False):
            x = backbones.normalize_image(im)
            return self.feature_extractor(x, train=train)

        def __call__(self, im, train: bool = False):
            return self.extract_backbone(im, train=train)

    net = Wrapper(ResNet(block="basic", layers=(1, 1, 1, 1),
                         output_layers=("conv1", "layer3"), base_width=8))
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    params = ECOParams(
        max_image_sample_size=96 ** 2, min_image_sample_size=96 ** 2,
        sample_memory_size=10, init_CG_iter=10, init_GN_iter=2, CG_iter=3,
        train_skipping=3, scale_factors=(1.0,),
        blocks=((4, 8, 1 / 16, 0.4, 10e-3), (16, 16, 1 / 4, 0.6, 50e-3)),
        feature_blocks=(("conv1", 2), ("layer3", 1)),
        augmentation=(("fliplr", True), ("shift", ((4, 4), (-4, -4))),
                      ("dropout", (1, 0.2))))

    tracker = ECOTracker(params, net, variables)
    centers = [(60 + 2 * t, 60 + 2 * t) for t in range(5)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10, 20, 20]})
    assert tracker.state is not None
    for f in tracker.state.filters:
        assert np.all(np.isfinite(np.asarray(f)))

    for t in range(1, 5):
        out = tracker.track(make_frame(*centers[t]))
        bb = out["target_bbox"]
        assert len(bb) == 4 and all(np.isfinite(bb)), bb
    assert np.all(np.isfinite(np.asarray(tracker.state.sample_weights)))
