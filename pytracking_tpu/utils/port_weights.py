"""Port reference PyTorch checkpoints into this framework's flax variable trees.

The reference distributes trained `.pth.tar` checkpoints (MODEL_ZOO.md); loading them
into the TPU framework gives accuracy parity without retraining (SURVEY.md §7.3 item 5).
This module maps torch `state_dict` names/layouts to our flax tree:

  conv OIHW  -> HWIO kernels
  linear (out, in) -> (in, out); inputs that were flattened from NCHW feature maps are
    permuted to NHWC flattening order first
  BatchNorm weight/bias/running_mean/running_var -> params.scale/params.bias +
    batch_stats.mean/batch_stats.var
  1x1 "bin predictor" convs of the DiMP optimizer (shape (1, bins, 1, 1)) -> (bins,)
    weight vectors

Entry point: `port_dimpnet(state_dict) -> variables` for DiMPnet-18/50; the generic
helpers serve the other model families.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, H, W) -> flax (H, W, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray, input_hwc: Optional[Tuple[int, int, int]] = None
                  ) -> np.ndarray:
    """torch linear weight (out, in) -> flax (in, out). If the input was a flattened
    NCHW feature map, pass (H, W, C) to convert the flattening order to NHWC."""
    if input_hwc is not None:
        h, w_, c = input_hwc
        out = w.shape[0]
        w = w.reshape(out, c, h, w_).transpose(0, 2, 3, 1).reshape(out, h * w_ * c)
    return np.ascontiguousarray(w.T)


def set_in(tree: dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def port_bn(sd: Dict[str, np.ndarray], torch_prefix: str, params: dict,
            batch_stats: dict, flax_path: str):
    set_in(params, flax_path + "/scale", sd[torch_prefix + ".weight"])
    set_in(params, flax_path + "/bias", sd[torch_prefix + ".bias"])
    set_in(batch_stats, flax_path + "/mean", sd[torch_prefix + ".running_mean"])
    set_in(batch_stats, flax_path + "/var", sd[torch_prefix + ".running_var"])


def port_conv(sd: Dict[str, np.ndarray], torch_prefix: str, params: dict,
              flax_path: str, bias: bool = None):
    set_in(params, flax_path + "/kernel", conv_kernel(sd[torch_prefix + ".weight"]))
    if (bias is None and torch_prefix + ".bias" in sd) or bias:
        set_in(params, flax_path + "/bias", sd[torch_prefix + ".bias"])


def port_conv_block(sd, torch_prefix: str, params: dict, batch_stats: dict,
                    flax_path: str):
    """Reference conv_block Sequential(Conv2d, BatchNorm2d, ReLU) -> our ConvBlock
    (Conv_0 + BatchNorm_0)."""
    port_conv(sd, torch_prefix + ".0", params, flax_path + "/Conv_0")
    if torch_prefix + ".1.weight" in sd:
        port_bn(sd, torch_prefix + ".1", params, batch_stats,
                flax_path + "/BatchNorm_0")


def port_resnet(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                prefix: str = "feature_extractor", flax_prefix: str = "feature_extractor",
                layers: Tuple[int, ...] = (3, 4, 6, 3), block: str = "bottleneck"):
    """Port a torchvision-style ResNet state dict subtree."""
    port_conv(sd, f"{prefix}.conv1", params, f"{flax_prefix}/conv1")
    port_bn(sd, f"{prefix}.bn1", params, batch_stats, f"{flax_prefix}/bn1")
    n_convs = 3 if block == "bottleneck" else 2
    for stage in range(4):
        for b in range(layers[stage]):
            tp = f"{prefix}.layer{stage + 1}.{b}"
            fp = f"{flax_prefix}/layer{stage + 1}_{b}"
            for ci in range(1, n_convs + 1):
                port_conv(sd, f"{tp}.conv{ci}", params, f"{fp}/conv{ci}")
                port_bn(sd, f"{tp}.bn{ci}", params, batch_stats, f"{fp}/bn{ci}")
            if f"{tp}.downsample.0.weight" in sd:
                port_conv(sd, f"{tp}.downsample.0", params, f"{fp}/downsample_conv")
                port_bn(sd, f"{tp}.downsample.1", params, batch_stats,
                        f"{fp}/downsample_bn")


def port_atom_iou_net(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                      prefix: str = "bb_regressor", flax_prefix: str = "bb_regressor"):
    """Reference AtomIoUNet (ltr/models/bbreg/atom_iou_net.py:15) subtree."""
    for name in ("conv3_1r", "conv3_1t", "conv3_2t", "fc3_1r", "conv4_1r", "conv4_1t",
                 "conv4_2t", "fc34_3r", "fc34_4r"):
        port_conv_block(sd, f"{prefix}.{name}", params, batch_stats,
                        f"{flax_prefix}/{name}")
    # LinearBlocks: torch flattens NCHW pooled maps (C, 5, 5)/(C, 3, 3)
    c_in3 = sd[f"{prefix}.fc3_rt.linear.weight"].shape[1] // 25
    set_in(params, f"{flax_prefix}/fc3_rt/Dense_0/kernel",
           linear_kernel(sd[f"{prefix}.fc3_rt.linear.weight"], (5, 5, c_in3)))
    set_in(params, f"{flax_prefix}/fc3_rt/Dense_0/bias",
           sd[f"{prefix}.fc3_rt.linear.bias"])
    port_bn(sd, f"{prefix}.fc3_rt.bn", params, batch_stats,
            f"{flax_prefix}/fc3_rt/BatchNorm_0")
    c_in4 = sd[f"{prefix}.fc4_rt.linear.weight"].shape[1] // 9
    set_in(params, f"{flax_prefix}/fc4_rt/Dense_0/kernel",
           linear_kernel(sd[f"{prefix}.fc4_rt.linear.weight"], (3, 3, c_in4)))
    set_in(params, f"{flax_prefix}/fc4_rt/Dense_0/bias",
           sd[f"{prefix}.fc4_rt.linear.bias"])
    port_bn(sd, f"{prefix}.fc4_rt.bn", params, batch_stats,
            f"{flax_prefix}/fc4_rt/BatchNorm_0")
    set_in(params, f"{flax_prefix}/iou_predictor/kernel",
           linear_kernel(sd[f"{prefix}.iou_predictor.weight"]))
    set_in(params, f"{flax_prefix}/iou_predictor/bias",
           sd[f"{prefix}.iou_predictor.bias"])


def port_atomnet(state_dict: Dict[str, np.ndarray],
                 layers: Tuple[int, ...] = (2, 2, 2, 2),
                 block: str = "basic") -> dict:
    """ATOMnet checkpoint (reference ltr/models/bbreg/atom.py:7) -> flax variables."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                layers, block)
    port_atom_iou_net(sd, params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def port_dimpnet(state_dict: Dict[str, np.ndarray],
                 layers: Tuple[int, ...] = (3, 4, 6, 3),
                 block: str = "bottleneck",
                 clf_feat_blocks: int = 0) -> dict:
    """Full DiMPnet-18/50 checkpoint -> flax variables dict {'params', 'batch_stats'}."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}

    # backbone
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                layers, block)

    # classifier feature extractor: Sequential([blocks...,] final Conv2d, InstanceL2Norm)
    fe = "classifier.feature_extractor"
    fx = "classifier/feature_extractor"
    for i in range(clf_feat_blocks):
        tp = f"{fe}.{i}"
        fp = f"{fx}/block{i}"
        n_convs = 3 if block == "bottleneck" else 2
        for ci in range(1, n_convs + 1):
            port_conv(sd, f"{tp}.conv{ci}", params, f"{fp}/conv{ci}")
            port_bn(sd, f"{tp}.bn{ci}", params, batch_stats, f"{fp}/bn{ci}")
        if f"{tp}.downsample.0.weight" in sd:
            port_conv(sd, f"{tp}.downsample.0", params, f"{fp}/downsample_conv")
            port_bn(sd, f"{tp}.downsample.1", params, batch_stats, f"{fp}/downsample_bn")
    # the final conv is the next sequential index
    port_conv(sd, f"{fe}.{clf_feat_blocks}", params, f"{fx}/final_conv")

    # filter initializer
    port_conv(sd, "classifier.filter_initializer.filter_conv", params,
              "classifier/filter_initializer/filter_conv")

    # filter optimizer: scalars + 1x1 bin predictors
    fo = "classifier.filter_optimizer"
    fxo = "classifier/filter_optimizer"
    set_in(params, fxo + "/log_step_length", sd[fo + ".log_step_length"])
    set_in(params, fxo + "/filter_reg", sd[fo + ".filter_reg"])
    if fo + ".label_map_predictor.weight" in sd:
        set_in(params, fxo + "/label_map_w",
               sd[fo + ".label_map_predictor.weight"].reshape(-1))
        set_in(params, fxo + "/target_mask_w",
               sd[fo + ".target_mask_predictor.0.weight"].reshape(-1))
        set_in(params, fxo + "/spatial_weight_w",
               sd[fo + ".spatial_weight_predictor.weight"].reshape(-1))

    # IoU net
    port_atom_iou_net(sd, params, batch_stats)

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth.tar checkpoint (the 'net' field of the trainer state,
    reference ltr/admin/loading.py:35-117)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    return {k: v.numpy() for k, v in sd.items()}
