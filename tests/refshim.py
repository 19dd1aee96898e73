"""Test-support shim: make `/root/reference` (the upstream torch implementation)
importable in this environment so parity tests can compare our flax nets against
the reference nets built with RANDOM weights.

The environment lacks torchvision/jpeg4py/cv2/visdom. This module installs:
  * functional substitutes for the torchvision pieces the reference nets actually
    execute (BasicBlock/Bottleneck, FeaturePyramidNetwork, minimal transforms) —
    implemented from the public torchvision specification so that state_dict key
    layout matches torchvision<=0.11 (the version pytracking targets);
  * inert stubs for IO/plot-only imports (jpeg4py, cv2, visdom, tensorboardX).

Usage:  from tests.refshim import reference_root   # installs stubs on import
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__path__ = []  # mark as package so `import name.sub` doesn't explode
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch
    import torch.nn.functional as F
    from torch import nn

    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                         padding=dilation, groups=groups, bias=False,
                         dilation=dilation)

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                         bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                     base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                     base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class FeaturePyramidNetwork(nn.Module):
        """torchvision<=0.11 FPN: plain Conv2d lateral (1x1) + output (3x3) blocks,
        nearest top-down upsampling; returns an OrderedDict with the input keys."""

        def __init__(self, in_channels_list, out_channels, extra_blocks=None):
            super().__init__()
            self.inner_blocks = nn.ModuleList(
                [nn.Conv2d(c, out_channels, 1) for c in in_channels_list])
            self.layer_blocks = nn.ModuleList(
                [nn.Conv2d(out_channels, out_channels, 3, padding=1)
                 for _ in in_channels_list])
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_uniform_(m.weight, a=1)
                    nn.init.constant_(m.bias, 0)

        def forward(self, x):
            from collections import OrderedDict
            names = list(x.keys())
            feats = list(x.values())
            last_inner = self.inner_blocks[-1](feats[-1])
            results = [self.layer_blocks[-1](last_inner)]
            for idx in range(len(feats) - 2, -1, -1):
                inner_lateral = self.inner_blocks[idx](feats[idx])
                top_down = F.interpolate(last_inner,
                                         size=inner_lateral.shape[-2:],
                                         mode="nearest")
                last_inner = inner_lateral + top_down
                results.insert(0, self.layer_blocks[idx](last_inner))
            return OrderedDict(zip(names, results))

    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    models = types.ModuleType("torchvision.models")
    models.__path__ = []
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.model_urls = {}
    models.resnet = resnet_mod

    ops_mod = types.ModuleType("torchvision.ops")
    ops_mod.FeaturePyramidNetwork = FeaturePyramidNetwork

    class ToTensor:
        def __call__(self, pic):
            import numpy as np
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy()).contiguous()
            return t.float().div(255) if t.dtype == torch.uint8 else t.float()

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, t):
            return normalize_fn(t, self.mean, self.std)

    def normalize_fn(tensor, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
        std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
        if not inplace:
            tensor = tensor.clone()
        return tensor.sub_(mean).div_(std)

    transforms_mod = types.ModuleType("torchvision.transforms")
    transforms_mod.__path__ = []
    transforms_mod.ToTensor = ToTensor
    transforms_mod.Normalize = Normalize
    tfunc = types.ModuleType("torchvision.transforms.functional")
    tfunc.normalize = normalize_fn
    transforms_mod.functional = tfunc

    tv.models = models
    tv.ops = ops_mod
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet_mod
    sys.modules["torchvision.ops"] = ops_mod
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.transforms.functional"] = tfunc


def _install_correlation_sampler():
    """CPU substitute for the `spatial_correlation_sampler` CUDA package used by the
    reference KYS cost volume: raw (unnormalized) sum of products over channels and
    the kernel window; output (B, patch, patch, oH, oW)."""
    if "spatial_correlation_sampler" in sys.modules:
        return
    import torch
    import torch.nn.functional as F
    from torch import nn

    class SpatialCorrelationSampler(nn.Module):
        def __init__(self, kernel_size=1, patch_size=1, stride=1, padding=0,
                     dilation=1, dilation_patch=1):
            super().__init__()
            assert dilation == 1, "shim supports dilation=1 only"
            self.k, self.p = int(kernel_size), int(patch_size)
            self.stride, self.pad = int(stride), int(padding)
            self.dp = int(dilation_patch)

        def forward(self, input1, input2):
            B, C, H, W = input1.shape
            k, p, s, pad, dp = self.k, self.p, self.stride, self.pad, self.dp
            md = (p - 1) // 2
            oH = (H + 2 * pad - k) // s + 1
            oW = (W + 2 * pad - k) // s + 1
            f1 = F.pad(input1, [pad] * 4)
            big = F.pad(input2, [pad + md * dp] * 4)
            out = input1.new_zeros(B, p, p, oH, oW)
            for pi in range(p):
                for pj in range(p):
                    di, dj = (pi - md) * dp, (pj - md) * dp
                    f2s = big[:, :, md * dp + di:md * dp + di + H + 2 * pad,
                              md * dp + dj:md * dp + dj + W + 2 * pad]
                    prod = (f1 * f2s).sum(1, keepdim=True)
                    out[:, pi, pj] = F.avg_pool2d(
                        prod, k, stride=s, padding=0,
                        divisor_override=1)[:, 0]
            return out

    m = types.ModuleType("spatial_correlation_sampler")
    m.SpatialCorrelationSampler = SpatialCorrelationSampler
    sys.modules["spatial_correlation_sampler"] = m


def _install_timm():
    """timm.models.layers: the three small utilities the reference's swin backbone
    uses (DropPath / to_2tuple / trunc_normal_)."""
    if "timm" in sys.modules:
        return
    import collections.abc
    import torch
    from torch import nn

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    timm = _stub_module("timm")
    timm_models = _stub_module("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    sys.modules["timm.models.layers"] = layers
    timm_models.layers = layers


def _install_prroi():
    """The reference's PrRoIPool is a CUDA extension (unavailable here). Install a
    CPU torch implementation of the exact same integral (mirrors the closed-form
    separable formulation in pytracking_tpu/ops/prroi_pool.py) under the module
    path the reference imports."""
    name = "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"
    if name in sys.modules:
        return
    import torch
    from torch import nn

    def _tri_cdf(x):
        x = torch.clamp(x, -1.0, 1.0)
        return torch.where(x < 0.0, 0.5 * (x + 1.0) ** 2, 0.5 + x * (1.0 - 0.5 * x))

    def _axis_weights(lo, hi, n_bins, size):
        edges = lo + (hi - lo) * torch.arange(n_bins + 1, dtype=torch.float32) / n_bins
        grid = torch.arange(size, dtype=torch.float32)
        cdf = _tri_cdf(edges[:, None] - grid[None, :])
        return cdf[1:] - cdf[:-1]

    class PrRoIPool2D(nn.Module):
        def __init__(self, pooled_height, pooled_width, spatial_scale):
            super().__init__()
            self.ph, self.pw = int(pooled_height), int(pooled_width)
            self.spatial_scale = float(spatial_scale)

        def forward(self, feat, rois):
            # feat (B, C, H, W); rois (N, 5) = [batch_idx, x1, y1, x2, y2]
            H, W = feat.shape[-2], feat.shape[-1]
            outs = []
            for r in rois:
                b = int(r[0].item())
                x1, y1, x2, y2 = (r[1:] * self.spatial_scale)
                wy = _axis_weights(y1, y2, self.ph, H)
                wx = _axis_weights(x1, x2, self.pw, W)
                pooled = torch.einsum("ki,lj,cij->ckl", wy, wx, feat[b])
                area = torch.clamp((y2 - y1) / self.ph, min=1e-6) * \
                    torch.clamp((x2 - x1) / self.pw, min=1e-6)
                outs.append(pooled / area)
            return torch.stack(outs)

    for pkg in ("ltr.external", "ltr.external.PreciseRoIPooling",
                "ltr.external.PreciseRoIPooling.pytorch"):
        _stub_module(pkg)
    m = types.ModuleType(name)
    m.PrRoIPool2D = PrRoIPool2D
    sys.modules[name] = m


def _patch_autograd_grad_for_tensorlist():
    """torch>=2 rejects list-subclass (pytracking TensorList) arguments to
    torch.autograd.grad; coerce sequence args to plain tuples so the reference's
    GNSteepestDescent meta-optimizer runs."""
    import torch
    if getattr(torch.autograd.grad, "_tensorlist_patched", False):
        return
    _orig = torch.autograd.grad

    def grad(outputs, inputs, grad_outputs=None, **kw):
        def to_t(x):
            return tuple(x) if isinstance(x, (list, tuple)) else x
        return _orig(to_t(outputs), to_t(inputs), to_t(grad_outputs), **kw)

    grad._tensorlist_patched = True
    torch.autograd.grad = grad


def _install_legacy_fft():
    """torch<1.8-style real-tensor FFT API (removed upstream), used by the
    reference's libs/fourier.py and libs/dcf.py: complex values are (..., 2)
    real tensors. Implemented on top of the modern torch.fft namespace."""
    import torch

    if hasattr(torch, "rfft"):
        return

    def rfft(input, signal_ndim, normalized=False, onesided=True):
        dims = tuple(range(-signal_ndim, 0))
        norm = "ortho" if normalized else "backward"
        if onesided:
            out = torch.fft.rfftn(input, dim=dims, norm=norm)
        else:
            out = torch.fft.fftn(input, dim=dims, norm=norm)
        return torch.view_as_real(out)

    def irfft(input, signal_ndim, normalized=False, onesided=True,
              signal_sizes=None):
        dims = tuple(range(-signal_ndim, 0))
        norm = "ortho" if normalized else "backward"
        z = torch.view_as_complex(input.contiguous())
        if onesided:
            return torch.fft.irfftn(z, s=signal_sizes, dim=dims, norm=norm)
        return torch.fft.ifftn(z, dim=dims, norm=norm).real

    def fft(input, signal_ndim, normalized=False):
        dims = tuple(range(-signal_ndim - 1, -1))
        norm = "ortho" if normalized else "backward"
        z = torch.view_as_complex(input.contiguous())
        return torch.view_as_real(torch.fft.fftn(z, dim=dims, norm=norm))

    def ifft(input, signal_ndim, normalized=False):
        dims = tuple(range(-signal_ndim - 1, -1))
        norm = "ortho" if normalized else "backward"
        z = torch.view_as_complex(input.contiguous())
        return torch.view_as_real(torch.fft.ifftn(z, dim=dims, norm=norm))

    torch.rfft, torch.irfft, torch.fft_legacy = rfft, irfft, fft
    # torch.fft is a module now; the reference calls torch.fft(x, nd) as a
    # FUNCTION only from libs/complex.py paths ATOM/ECO don't hit — install
    # the function forms under distinct names and leave the module intact.
    torch.ifft_legacy = ifft


def _install_skimage():
    """Functional skimage.morphology subset used by the reference's VOS F-measure
    (vos_utils.py:3): binary_dilation + disk, implemented with numpy."""
    try:
        import skimage.morphology  # noqa: F401
        return
    except ImportError:
        pass
    import numpy as np

    sk = _stub_module("skimage")
    morph = _stub_module("skimage.morphology")
    sk.morphology = morph

    def disk(radius):
        r = int(radius)
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        return (yy * yy + xx * xx) <= r * r

    def binary_dilation(image, footprint=None):
        image = np.asarray(image).astype(bool)
        if footprint is None:
            footprint = np.ones((3, 3), bool)
        fp = np.asarray(footprint).astype(bool)
        ry, rx = fp.shape[0] // 2, fp.shape[1] // 2
        padded = np.pad(image, ((ry, ry), (rx, rx)))
        out = np.zeros_like(image)
        for dy in range(fp.shape[0]):
            for dx in range(fp.shape[1]):
                if fp[dy, dx]:
                    out |= padded[dy:dy + image.shape[0],
                                  dx:dx + image.shape[1]]
        return out

    morph.disk = disk
    morph.binary_dilation = binary_dilation


def install():
    _install_legacy_fft()
    _install_skimage()
    for name in ("jpeg4py", "cv2", "visdom", "visdom.server", "pandas", "lvis",
                 "pycocotools", "pycocotools.coco", "pycocotools.mask",
                 "tikzplotlib"):
        try:
            __import__(name)
        except ImportError:
            _stub_module(name)
    tb = _stub_module("tensorboardX")
    if not hasattr(tb, "SummaryWriter"):
        tb.SummaryWriter = object
    _install_torchvision()
    _install_timm()
    _install_correlation_sampler()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    _install_prroi()
    _patch_autograd_grad_for_tensorlist()


install()
reference_root = REFERENCE_ROOT
