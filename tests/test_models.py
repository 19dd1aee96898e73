import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytracking_tpu.models.backbones import resnet
from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear, filter_pool
from pytracking_tpu.models.classifier.optimizer import (DiMPSteepestDescentGN,
                                                        PrDiMPSteepestDescentNewton)
from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
from pytracking_tpu.models.tracking import dimpnet


def test_resnet18_output_shapes():
    net = resnet.resnet18(output_layers=("layer1", "layer2", "layer3", "layer4"))
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out["layer1"].shape == (1, 16, 16, 64)
    assert out["layer2"].shape == (1, 8, 8, 128)
    assert out["layer3"].shape == (1, 4, 4, 256)
    assert out["layer4"].shape == (1, 2, 2, 512)


def test_resnet50_dilation_keeps_resolution():
    net = resnet.ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                        output_layers=("layer3", "layer4"), dilation_factor=2)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    # layer4 keeps layer3's stride (16) due to dilation
    assert out["layer4"].shape[1:3] == out["layer3"].shape[1:3]


def test_filter_pool_centered_box():
    feat = jnp.zeros((1, 8, 8, 2)).at[0, 3:5, 3:5, :].set(1.0)
    # box centered on the hot region, stride 2 -> feature coords [2.5, 2.5, 5.5, 5.5]
    bb = jnp.array([[5.0, 5.0, 6.0, 6.0]])
    pooled = filter_pool(feat, bb, filter_size=2, feature_stride=2)
    assert pooled.shape == (1, 2, 2, 2)
    assert float(pooled.mean()) > 0.2


def test_dimp_steepest_descent_reduces_loss():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 1, 12, 12, 8), jnp.float32)  # (N, S, H, W, C)
    bb = jnp.array([[[60.0, 60.0, 50.0, 50.0]], [[55.0, 58.0, 50.0, 50.0]]])  # img 192
    w0 = jnp.asarray(rng.randn(1, 4, 4, 8, 1) * 0.01, jnp.float32)
    mod = DiMPSteepestDescentGN(num_iter=5, feat_stride=16, num_dist_bins=10,
                                bin_displacement=0.5)
    params = mod.init(jax.random.PRNGKey(0), w0, feat, bb, compute_losses=True)
    w, w_iters, losses = mod.apply(params, w0, feat, bb, compute_losses=True)
    assert w.shape == w0.shape
    assert w_iters.shape == (5,) + w0.shape
    assert losses.shape == (6,)
    assert float(losses[-1]) < float(losses[0])


def test_prdimp_newton_reduces_loss():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(2, 1, 12, 12, 8), jnp.float32)
    bb = jnp.array([[[60.0, 60.0, 50.0, 50.0]], [[55.0, 58.0, 50.0, 50.0]]])
    w0 = jnp.zeros((1, 4, 4, 8, 1), jnp.float32)
    mod = PrDiMPSteepestDescentNewton(num_iter=5, feat_stride=16, gauss_sigma=1.0,
                                      normalize_label=True, alpha_eps=0.05)
    params = mod.init(jax.random.PRNGKey(0), w0, feat, bb, compute_losses=True)
    w, w_iters, losses = mod.apply(params, w0, feat, bb, compute_losses=True)
    assert float(losses[-1]) < float(losses[0])


def test_iou_net_shapes_and_box_gradient():
    net = AtomIoUNet(input_dim=(8, 16), pred_input_dim=(16, 16), pred_inter_dim=(16, 16))
    rng = jax.random.PRNGKey(0)
    feat2 = jnp.ones((1, 16, 16, 8))   # stride 8 -> image 128
    feat3 = jnp.ones((1, 8, 8, 16))    # stride 16
    bb = jnp.array([[40.0, 40.0, 30.0, 30.0]])
    variables = net.init(rng, [feat2], [feat3], None, None,
                         method=lambda m, f2, f3, a, b: (
                             m.predict_iou(m.get_modulation([f2[0], f3[0]], bb),
                                           m.get_iou_feat([f2[0], f3[0]]),
                                           jnp.array([[[35.0, 35.0, 35.0, 35.0]]]))))
    def iou_of(proposals):
        return net.apply(variables, [feat2], [feat3], None, None,
                         method=lambda m, f2, f3, a, b: (
                             m.predict_iou(m.get_modulation([f2[0], f3[0]], bb),
                                           m.get_iou_feat([f2[0], f3[0]]),
                                           proposals))).sum()

    p = jnp.array([[[35.0, 35.0, 35.0, 35.0]]])
    g = jax.grad(iou_of)(p)
    assert g.shape == p.shape
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.filterwarnings("ignore")
def test_dimpnet50_training_forward_tiny():
    net = dimpnet.dimpnet50(filter_size=2, optim_iter=2, num_dist_bins=10,
                            bin_displacement=0.5)
    train_imgs = jnp.zeros((2, 1, 64, 64, 3))
    test_imgs = jnp.zeros((1, 1, 64, 64, 3))
    train_bb = jnp.array([[[20.0, 20.0, 24.0, 24.0]], [[22.0, 20.0, 24.0, 24.0]]])
    proposals = jnp.tile(jnp.array([[[[20.0, 20.0, 24.0, 24.0]]]]), (1, 1, 4, 1))
    variables = net.init(jax.random.PRNGKey(0), train_imgs, test_imgs, train_bb,
                         proposals, train=False)
    scores, iou = net.apply(variables, train_imgs, test_imgs, train_bb, proposals,
                            train=False)
    assert scores.shape[0] == 2  # iterates
    assert iou.shape == (1, 1, 4)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_swin_tiny_output_shapes():
    from pytracking_tpu.models.backbones.swin import swin_tiny
    net = swin_tiny(output_layers=("stage1", "stage2", "stage3", "stage4"))
    x = jnp.zeros((1, 64, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out["stage1"].shape == (1, 16, 24, 96)
    assert out["stage2"].shape == (1, 8, 12, 192)
    assert out["stage3"].shape == (1, 4, 6, 384)
    assert out["stage4"].shape == (1, 2, 3, 768)


def test_transformer_bf16_compute_matches_f32():
    """The bf16 compute knob (transformer_dtype=bfloat16) must keep the same
    parameter tree (checkpoints load unchanged) and produce near-identical
    outputs: matmuls run bf16 on the MXU, softmax/LayerNorm stay f32. This is
    what PYTRACKING_TPU_BF16=1 enables for ToMP/TaMOs (measured +49% serving
    aggregate at B=16)."""
    from pytracking_tpu.models.transformer.transformer import Transformer

    kw = dict(d_model=128, nhead=4, num_encoder_layers=2, num_decoder_layers=2,
              dim_feedforward=256)
    tr32 = Transformer(**kw)
    tr16 = Transformer(**kw, dtype=jnp.bfloat16)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 50, 128))
    q = jax.random.normal(jax.random.PRNGKey(2), (1, 128))
    pos = jax.random.normal(jax.random.PRNGKey(3), (2, 50, 128))
    v = tr32.init(jax.random.PRNGKey(0), src, q, pos, train=False)
    v16 = tr16.init(jax.random.PRNGKey(0), src, q, pos, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v16)

    d32, m32 = tr32.apply(v, src, q, pos, train=False)
    d16, m16 = tr16.apply(v, src, q, pos, train=False)
    assert d16.dtype == jnp.float32 and m16.dtype == jnp.float32
    c = np.corrcoef(np.asarray(d32).ravel(),
                    np.asarray(d16, np.float32).ravel())[0, 1]
    cm = np.corrcoef(np.asarray(m32).ravel(),
                     np.asarray(m16, np.float32).ravel())[0, 1]
    assert c > 0.999 and cm > 0.999
