"""Torch→flax weight-porting parity: build small torch modules, port their weights,
and check our flax modules produce numerically identical outputs (NCHW vs NHWC)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pytracking_tpu.models.backbones.resnet import ResNet
from pytracking_tpu.models.layers.blocks import ConvBlock, LinearBlock
from pytracking_tpu.utils import port_weights as pw


def _to_nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def test_conv_block_parity():
    tm = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1, bias=True),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU())
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    # port_conv_block expects prefix.0 style keys; build them
    sd2 = {f"b.{k}": v for k, v in sd.items()}
    params, batch_stats = {}, {}
    pw.port_conv_block(sd2, "b", params, batch_stats, "blk")

    fm = ConvBlock(8, 3, 1)
    x = torch.randn(2, 3, 6, 6)
    with torch.no_grad():
        ref = tm(x)
    variables = {"params": params["blk"], "batch_stats": batch_stats["blk"]}
    out = fm.apply(variables, _to_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_linear_block_parity_nchw_flattening():
    class TLB(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear = torch.nn.Linear(4 * 5 * 5, 7)
            self.bn = torch.nn.BatchNorm2d(7)

        def forward(self, x):
            x = self.linear(x.reshape(x.shape[0], -1))
            x = self.bn(x.reshape(x.shape[0], 7, 1, 1))
            return torch.relu(x.reshape(x.shape[0], -1))

    tm = TLB().eval()
    sd = {f"fc.{k}": v.numpy() for k, v in tm.state_dict().items()}

    params, batch_stats = {}, {}
    pw.set_in(params, "fc/Dense_0/kernel",
              pw.linear_kernel(sd["fc.linear.weight"], (5, 5, 4)))
    pw.set_in(params, "fc/Dense_0/bias", sd["fc.linear.bias"])
    pw.port_bn(sd, "fc.bn", params, batch_stats, "fc/BatchNorm_0")

    fm = LinearBlock(7)
    x = torch.randn(3, 4, 5, 5)
    with torch.no_grad():
        ref = tm(x)
    variables = {"params": params["fc"], "batch_stats": batch_stats["fc"]}
    out = fm.apply(variables, _to_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_resnet_stem_parity():
    """Port a tiny torchvision-style resnet stem + one basic block and compare."""
    class TorchBasic(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.relu = torch.nn.ReLU()
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            blk = torch.nn.Module()
            blk.conv1 = torch.nn.Conv2d(64, 64, 3, 1, 1, bias=False)
            blk.bn1 = torch.nn.BatchNorm2d(64)
            blk.conv2 = torch.nn.Conv2d(64, 64, 3, 1, 1, bias=False)
            blk.bn2 = torch.nn.BatchNorm2d(64)
            self.layer1 = torch.nn.ModuleList([blk])

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            b = self.layer1[0]
            out = torch.relu(b.bn1(b.conv1(x)))
            out = b.bn2(b.conv2(out))
            return torch.relu(out + x)

    tm = TorchBasic().eval()
    # randomize BN stats so the test is meaningful
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {f"feature_extractor.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = {}, {}
    pw.port_resnet(sd, params, batch_stats, "feature_extractor", "net",
                   layers=(1, 0, 0, 0), block="basic")

    fnet = ResNet(block="basic", layers=(1, 1, 1, 1), output_layers=("layer1",))
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x)
    # build full variable tree for the flax net, then overlay ported stem+layer1
    init_vars = fnet.init(jax.random.PRNGKey(0), _to_nhwc(x))
    pv = jax.tree_util.tree_map(lambda a: np.asarray(a), init_vars)
    pv = {"params": dict(pv["params"]), "batch_stats": dict(pv["batch_stats"])}
    for k, v in params["net"].items():
        pv["params"][k] = v
    for k, v in batch_stats["net"].items():
        pv["batch_stats"][k] = v
    out = fnet.apply(pv, _to_nhwc(x))["layer1"]
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)
