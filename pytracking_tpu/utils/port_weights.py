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


class TrackingStateDict(dict):
    """state_dict wrapper that records which keys a port function consumed.

    Used by the port-coverage tests (tests/test_port_coverage.py) to assert a
    `port_*` entry point reads EVERY checkpoint key — so a reference `.pth.tar`
    cannot silently lose weights on ingest. Values convert to np on access."""

    def __init__(self, state_dict):
        super().__init__({k: np.asarray(v) for k, v in state_dict.items()})
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return default

    def unconsumed(self, ignore_suffixes=("num_batches_tracked",)):
        return {k for k in self
                if k not in self.consumed
                and not k.endswith(ignore_suffixes)}


def _as_sd(state_dict) -> dict:
    """Normalize an incoming state_dict to name->np.ndarray, preserving a
    TrackingStateDict so its consumed-key record survives the port call."""
    if isinstance(state_dict, TrackingStateDict):
        return state_dict
    return {k: np.asarray(v) for k, v in state_dict.items()}


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
    sd = _as_sd(state_dict)
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
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}

    # backbone
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                layers, block)
    # classifier (feature extractor + initializer + optimizer)
    port_dimp_classifier(sd, params, batch_stats, "classifier", "classifier",
                         clf_feat_blocks=clf_feat_blocks, block=block)
    # IoU net
    port_atom_iou_net(sd, params, batch_stats)

    return {"params": params, "batch_stats": batch_stats}


def port_gn(sd: Dict[str, np.ndarray], torch_prefix: str, params: dict,
            flax_path: str):
    """torch GroupNorm weight/bias -> flax scale/bias."""
    set_in(params, flax_path + "/scale", sd[torch_prefix + ".weight"])
    set_in(params, flax_path + "/bias", sd[torch_prefix + ".bias"])


def port_ln(sd: Dict[str, np.ndarray], torch_prefix: str, params: dict,
            flax_path: str):
    set_in(params, flax_path + "/scale", sd[torch_prefix + ".weight"])
    set_in(params, flax_path + "/bias", sd[torch_prefix + ".bias"])


def _mha_tree(in_proj_w, in_proj_b, out_w, out_b, nhead: int) -> dict:
    """torch nn.MultiheadAttention params -> flax MultiHeadDotProductAttention tree.
    in_proj_w (3d, d) = concat[q;k;v]; flax kernels are (d_in, heads, head_dim)."""
    d = out_w.shape[0]
    hd = d // nhead
    qw, kw, vw = np.split(in_proj_w, 3, axis=0)        # each (d, d): y = x @ w.T
    qb, kb, vb = np.split(in_proj_b, 3, axis=0)

    def k_(w):
        return np.ascontiguousarray(w.T).reshape(d, nhead, hd)

    def b_(b):
        return b.reshape(nhead, hd)

    return {"query": {"kernel": k_(qw), "bias": b_(qb)},
            "key": {"kernel": k_(kw), "bias": b_(kb)},
            "value": {"kernel": k_(vw), "bias": b_(vb)},
            "out": {"kernel": np.ascontiguousarray(out_w.T).reshape(nhead, hd, d),
                    "bias": out_b}}


def _stack_layers(trees: list) -> dict:
    """Stack per-layer param dicts along a new leading axis (nn.scan layout)."""
    out = {}
    for k in trees[0]:
        if isinstance(trees[0][k], dict):
            out[k] = _stack_layers([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees])
    return out


def port_detr_transformer(sd: Dict[str, np.ndarray], torch_prefix: str,
                          params: dict, flax_path: str, num_enc: int = 6,
                          num_dec: int = 6, nhead: int = 8):
    """Reference DETR-style Transformer (ltr/models/transformer/transformer.py:66)
    -> our nn.scan-stacked Transformer (models/transformer/transformer.py)."""
    enc_layers = []
    for i in range(num_enc):
        tp = f"{torch_prefix}.encoder.layers.{i}"
        enc_layers.append({
            "_MHA_0": {"MultiHeadDotProductAttention_0": _mha_tree(
                sd[f"{tp}.self_attn.in_proj_weight"],
                sd[f"{tp}.self_attn.in_proj_bias"],
                sd[f"{tp}.self_attn.out_proj.weight"],
                sd[f"{tp}.self_attn.out_proj.bias"], nhead)},
            "Dense_0": {"kernel": sd[f"{tp}.linear1.weight"].T,
                        "bias": sd[f"{tp}.linear1.bias"]},
            "Dense_1": {"kernel": sd[f"{tp}.linear2.weight"].T,
                        "bias": sd[f"{tp}.linear2.bias"]},
            "LayerNorm_0": {"scale": sd[f"{tp}.norm1.weight"],
                            "bias": sd[f"{tp}.norm1.bias"]},
            "LayerNorm_1": {"scale": sd[f"{tp}.norm2.weight"],
                            "bias": sd[f"{tp}.norm2.bias"]},
        })
    set_in_tree(params, f"{flax_path}/encoder/layer", _stack_layers(enc_layers))

    dec_layers = []
    for i in range(num_dec):
        tp = f"{torch_prefix}.decoder.layers.{i}"
        dec_layers.append({
            "_MHA_0": {"MultiHeadDotProductAttention_0": _mha_tree(
                sd[f"{tp}.self_attn.in_proj_weight"],
                sd[f"{tp}.self_attn.in_proj_bias"],
                sd[f"{tp}.self_attn.out_proj.weight"],
                sd[f"{tp}.self_attn.out_proj.bias"], nhead)},
            "_MHA_1": {"MultiHeadDotProductAttention_0": _mha_tree(
                sd[f"{tp}.multihead_attn.in_proj_weight"],
                sd[f"{tp}.multihead_attn.in_proj_bias"],
                sd[f"{tp}.multihead_attn.out_proj.weight"],
                sd[f"{tp}.multihead_attn.out_proj.bias"], nhead)},
            "Dense_0": {"kernel": sd[f"{tp}.linear1.weight"].T,
                        "bias": sd[f"{tp}.linear1.bias"]},
            "Dense_1": {"kernel": sd[f"{tp}.linear2.weight"].T,
                        "bias": sd[f"{tp}.linear2.bias"]},
            "LayerNorm_0": {"scale": sd[f"{tp}.norm1.weight"],
                            "bias": sd[f"{tp}.norm1.bias"]},
            "LayerNorm_1": {"scale": sd[f"{tp}.norm2.weight"],
                            "bias": sd[f"{tp}.norm2.bias"]},
            "LayerNorm_2": {"scale": sd[f"{tp}.norm3.weight"],
                            "bias": sd[f"{tp}.norm3.bias"]},
        })
    set_in_tree(params, f"{flax_path}/decoder/layer", _stack_layers(dec_layers))
    port_ln(sd, f"{torch_prefix}.decoder.norm", params, f"{flax_path}/dec_norm")


def set_in_tree(tree: dict, path: str, sub: dict):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = sub


def port_tomp_head(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                   prefix: str = "head", flax_prefix: str = "head",
                   nhead: int = 8, num_enc: int = 6, num_dec: int = 6):
    """Reference ToMP Head (ltr/models/transformer/heads.py:17): filter predictor
    (+DETR transformer), clf-feature conv, linear classifier, dense box regressor."""
    # clf feature extractor: Sequential(Conv2d, InstanceL2Norm)
    port_conv(sd, f"{prefix}.feature_extractor.0", params,
              f"{flax_prefix}/feature_extractor/final_conv")

    # filter predictor
    fp = f"{prefix}.filter_predictor"
    fx = f"{flax_prefix}/filter_predictor"
    set_in(params, f"{fx}/query_embed_fg", sd[f"{fp}.query_embed_fg.weight"])
    # the reference aliases query_embed_fg_decoder = query_embed_fg
    # (filter_predictor.py:33) — the SAME tensor registered twice in the
    # state_dict; consume the alias so coverage accounting sees it handled
    sd.get(f"{fp}.query_embed_fg_decoder.weight")
    if f"{fp}.query_embed_test.weight" in sd:
        set_in(params, f"{fx}/query_embed_test", sd[f"{fp}.query_embed_test.weight"])
    # box_encoding MLP: Conv1d(4,d/4,1) BN ReLU Conv1d(d/4,d,1) BN ReLU Conv1d(d,d,1)
    for conv_i, bn_i, lin in ((0, 1, "lin0"), (3, 4, "lin1"), (6, None, "lin2")):
        w = sd[f"{fp}.box_encoding.{conv_i}.weight"][..., 0]       # (out, in)
        set_in(params, f"{fx}/box_encoding/{lin}/kernel", np.ascontiguousarray(w.T))
        set_in(params, f"{fx}/box_encoding/{lin}/bias",
               sd[f"{fp}.box_encoding.{conv_i}.bias"])
        if bn_i is not None:
            bn = f"bn{conv_i // 3}"
            port_bn(sd, f"{fp}.box_encoding.{bn_i}", params, batch_stats,
                    f"{fx}/box_encoding/{bn}")
    port_detr_transformer(sd, f"{fp}.transformer", params, f"{fx}/transformer",
                          num_enc=num_enc, num_dec=num_dec, nhead=nhead)

    # classifier / box regressor
    set_in(params, f"{flax_prefix}/classifier/linear/kernel",
           linear_kernel(sd[f"{prefix}.classifier.linear.weight"]))
    set_in(params, f"{flax_prefix}/classifier/linear/bias",
           sd[f"{prefix}.classifier.linear.bias"])
    bb = f"{prefix}.bb_regressor"
    fb = f"{flax_prefix}/bb_regressor"
    if f"{bb}.linear.weight" in sd:
        set_in(params, f"{fb}/linear/kernel", linear_kernel(sd[f"{bb}.linear.weight"]))
        set_in(params, f"{fb}/linear/bias", sd[f"{bb}.linear.bias"])
    for i, ti in enumerate((0, 3, 6, 9)):
        port_conv(sd, f"{bb}.tower.{ti}", params, f"{fb}/tower{i}_conv")
        port_gn(sd, f"{bb}.tower.{ti + 1}", params, f"{fb}/tower{i}_gn")
    port_conv(sd, f"{bb}.bbreg_layer", params, f"{fb}/bbreg_layer")


def port_dimp_classifier(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                         prefix: str = "classifier", flax_prefix: str = "classifier",
                         clf_feat_blocks: int = 0, block: str = "bottleneck"):
    """Reference LinearFilter classifier subtree (feature extractor + initializer +
    steepest-descent optimizer)."""
    fe = f"{prefix}.feature_extractor"
    fx = f"{flax_prefix}/feature_extractor"
    for i in range(clf_feat_blocks):
        tp = f"{fe}.{i}"
        fp = f"{fx}/block{i}"
        n_convs = 3 if block == "bottleneck" else 2
        for ci in range(1, n_convs + 1):
            port_conv(sd, f"{tp}.conv{ci}", params, f"{fp}/conv{ci}")
            port_bn(sd, f"{tp}.bn{ci}", params, batch_stats, f"{fp}/bn{ci}")
        if f"{tp}.downsample.0.weight" in sd:
            port_conv(sd, f"{tp}.downsample.0", params, f"{fp}/downsample_conv")
            port_bn(sd, f"{tp}.downsample.1", params, batch_stats,
                    f"{fp}/downsample_bn")
    port_conv(sd, f"{fe}.{clf_feat_blocks}", params, f"{fx}/final_conv")

    port_conv(sd, f"{prefix}.filter_initializer.filter_conv", params,
              f"{flax_prefix}/filter_initializer/filter_conv")

    fo = f"{prefix}.filter_optimizer"
    fxo = f"{flax_prefix}/filter_optimizer"
    set_in(params, fxo + "/log_step_length", sd[fo + ".log_step_length"])
    set_in(params, fxo + "/filter_reg", sd[fo + ".filter_reg"])
    if fo + ".label_map_predictor.weight" in sd:
        set_in(params, fxo + "/label_map_w",
               sd[fo + ".label_map_predictor.weight"].reshape(-1))
        set_in(params, fxo + "/target_mask_w",
               sd[fo + ".target_mask_predictor.0.weight"].reshape(-1))
        set_in(params, fxo + "/spatial_weight_w",
               sd[fo + ".spatial_weight_predictor.weight"].reshape(-1))


def port_kys_predictor(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                       prefix: str = "predictor.predictor",
                       flax_prefix: str = "predictor"):
    """Reference KYS ResponsePredictor (ltr/models/kys/response_predictor.py:8)."""
    for tseq, fname in (("cost_volume_proc1.0", "cvproc1_0"),
                        ("cost_volume_proc1.1", "cvproc1_1"),
                        ("cost_volume_proc2.0", "cvproc2_0"),
                        ("cost_volume_proc2.1", "cvproc2_1")):
        port_conv_block(sd, f"{prefix}.{tseq}", params, batch_stats,
                        f"{flax_prefix}/{fname}")
    i = 0
    while f"{prefix}.representation_predictor.{i}.0.weight" in sd:
        port_conv(sd, f"{prefix}.representation_predictor.{i}.0", params,
                  f"{flax_prefix}/repr{i}/Conv_0")
        i += 1
    port_conv(sd, f"{prefix}.response_predictor.0.0", params,
              f"{flax_prefix}/response_pred")
    port_conv(sd, f"{prefix}.init_hidden_state_predictor.0.0", params,
              f"{flax_prefix}/init_hidden")
    port_conv(sd, f"{prefix}.is_target_predictor.0.0", params,
              f"{flax_prefix}/is_target_0")
    port_conv(sd, f"{prefix}.is_target_predictor.1.0", params,
              f"{flax_prefix}/is_target_1")
    for gate in ("conv_reset", "conv_update", "conv_state_new"):
        port_conv(sd, f"{prefix}.state_predictor.{gate}", params,
                  f"{flax_prefix}/state_predictor/{gate}")


def port_kysnet(state_dict: Dict[str, np.ndarray]) -> dict:
    """KYSnet checkpoint (reference ltr/models/tracking/kysnet.py:17) -> flax
    variables. Torch prefixes: backbone_feature_extractor / dimp_classifier /
    bb_regressor / predictor.predictor."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "backbone_feature_extractor",
                "feature_extractor", (3, 4, 6, 3), "bottleneck")
    port_dimp_classifier(sd, params, batch_stats, "dimp_classifier", "classifier")
    port_atom_iou_net(sd, params, batch_stats)
    port_kys_predictor(sd, params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def port_lwl_label_encoder(sd: Dict[str, np.ndarray], params: dict,
                           batch_stats: dict, prefix: str = "label_encoder",
                           flax_prefix: str = "label_encoder",
                           n_res: int = 2, res_offset: int = 1):
    """Reference ResidualDS16SW / ResidualDS16SW_Clf (ltr/models/lwl/
    label_encoder.py:9)."""
    port_conv_block(sd, f"{prefix}.conv_block", params, batch_stats,
                    f"{flax_prefix}/conv_block")
    for i in range(res_offset, res_offset + n_res):
        rp = f"{prefix}.res{i}"
        fp = f"{flax_prefix}/res{i}"
        port_conv(sd, f"{rp}.conv1", params, f"{fp}/conv1")
        port_conv(sd, f"{rp}.conv2", params, f"{fp}/conv2")
        port_conv(sd, f"{rp}.downsample", params, f"{fp}/downsample")
        if f"{rp}.bn1.weight" in sd:
            port_bn(sd, f"{rp}.bn1", params, batch_stats, f"{fp}/bn1")
            port_bn(sd, f"{rp}.bn2", params, batch_stats, f"{fp}/bn2")
    port_conv_block(sd, f"{prefix}.label_pred", params, batch_stats,
                    f"{flax_prefix}/label_pred")
    if f"{prefix}.samp_w_pred.weight" in sd:
        port_conv(sd, f"{prefix}.samp_w_pred", params, f"{flax_prefix}/samp_w_pred")


def port_lwl_decoder(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                     prefix: str = "decoder", flax_prefix: str = "decoder",
                     layers=("layer4", "layer3", "layer2", "layer1")):
    """Reference LWTLDecoder (ltr/models/lwl/decoder.py)."""
    for L in layers:
        tse = f"{prefix}.TSE.{L}"
        ftse = f"{flax_prefix}/TSE_{L}"
        port_conv(sd, f"{tse}.reduce.0", params, f"{ftse}/reduce0")
        port_conv(sd, f"{tse}.reduce.2", params, f"{ftse}/reduce1")
        for i, t in enumerate((0, 2, 4)):
            port_conv(sd, f"{tse}.transform.{t}", params, f"{ftse}/transform{i}")
        for rrb in ("RRB1", "RRB2"):
            rp = f"{prefix}.{rrb}.{L}"
            fp = f"{flax_prefix}/{rrb}_{L}"
            port_conv(sd, f"{rp}.conv1x1", params, f"{fp}/conv1x1")
            port_conv(sd, f"{rp}.bblock.0", params, f"{fp}/bb0")
            port_bn(sd, f"{rp}.bblock.1", params, batch_stats, f"{fp}/bn")
            port_conv(sd, f"{rp}.bblock.3", params, f"{fp}/bb1")
        cab = f"{prefix}.CAB.{L}"
        fcab = f"{flax_prefix}/CAB_{L}"
        port_conv(sd, f"{cab}.convreluconv.0", params, f"{fcab}/att0")
        port_conv(sd, f"{cab}.convreluconv.2", params, f"{fcab}/att1")
        if f"{prefix}.proj.{L}.0.weight" in sd:
            port_conv(sd, f"{prefix}.proj.{L}.0", params, f"{flax_prefix}/proj_{L}")
    port_conv(sd, f"{prefix}.project.conv1", params, f"{flax_prefix}/project/conv1")
    port_conv(sd, f"{prefix}.project.conv2", params, f"{flax_prefix}/project/conv2")


def port_lwlnet(state_dict: Dict[str, np.ndarray]) -> dict:
    """LWL (LWTLNet) checkpoint (reference ltr/models/lwl/lwl_net.py:18) -> flax
    variables. Backbone is the mrcnn ResNet-50 (same key names as torchvision)."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                (3, 4, 6, 3), "bottleneck")
    port_conv(sd, "target_model.feature_extractor.0", params,
              "target_model/feature_extractor/final_conv")
    set_in(params, "target_model/filter_reg",
           sd["target_model.filter_optimizer.residual_module.filter_reg"])
    port_lwl_label_encoder(sd, params, batch_stats)
    port_lwl_decoder(sd, params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def port_rtsnet(state_dict: Dict[str, np.ndarray]) -> dict:
    """RTS checkpoint (reference ltr/models/rts/rts_net.py:417
    steepest_descent_resnet50_with_clf_encoder) -> flax variables: LWL parts +
    hinge-classifier branch + score encoder + fusion."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                (3, 4, 6, 3), "bottleneck")
    port_conv(sd, "target_model.feature_extractor.0", params,
              "target_model/feature_extractor/final_conv")
    set_in(params, "target_model/filter_reg",
           sd["target_model.filter_optimizer.residual_module.filter_reg"])
    port_lwl_label_encoder(sd, params, batch_stats)
    port_lwl_decoder(sd, params, batch_stats)
    # classifier branch: features + initializer (the hinge optimizer's filter_reg
    # is a constant — learn_filter_reg=False, rts_net.py:328)
    port_conv(sd, "classifier.feature_extractor.0", params,
              "classifier/feature_extractor/final_conv")
    port_conv(sd, "classifier.filter_initializer.filter_conv", params,
              "classifier/filter_initializer/filter_conv")
    port_lwl_label_encoder(sd, params, batch_stats, "clf_encoder", "clf_encoder")
    if "fusion_module.fusion_conv1.weight" in sd:
        port_conv(sd, "fusion_module.fusion_conv1", params,
                  "fusion_module/fusion_conv1")
    return {"params": params, "batch_stats": batch_stats}


def port_stanet(state_dict: Dict[str, np.ndarray]) -> dict:
    """STA box-to-mask net checkpoint (reference ltr/models/lwl/sta_net.py:99
    steepest_descent_resnet50, shipped as sta.pth.tar for RTS box init) -> flax
    variables for models/lwl/sta_net.py. The target-model feature extractor
    layout is introspected from the keys: BasicBlocks (`feature_extractor.{i}.conv1`)
    and/or a bare final conv (`feature_extractor.{i}.weight`) — construct the flax
    net with matching clf_feat_blocks/clf_final_conv."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                (3, 4, 6, 3), "bottleneck")
    # target-model feature extractor: N BasicBlocks then optional final conv
    i = 0
    while f"target_model.feature_extractor.{i}.conv1.weight" in sd:
        tp = f"target_model.feature_extractor.{i}"
        fp = f"target_model/feature_extractor/block{i}"
        for ci in (1, 2):
            port_conv(sd, f"{tp}.conv{ci}", params, f"{fp}/conv{ci}")
            port_bn(sd, f"{tp}.bn{ci}", params, batch_stats, f"{fp}/bn{ci}")
        if f"{tp}.downsample.0.weight" in sd:
            port_conv(sd, f"{tp}.downsample.0", params, f"{fp}/downsample_conv")
            port_bn(sd, f"{tp}.downsample.1", params, batch_stats,
                    f"{fp}/downsample_bn")
        i += 1
    if f"target_model.feature_extractor.{i}.weight" in sd:
        port_conv(sd, f"target_model.feature_extractor.{i}", params,
                  "target_model/feature_extractor/final_conv")
    for tm in ("target_model", "target_model_segm"):
        set_in(params, f"{tm}/filter_reg",
               sd[f"{tm}.filter_optimizer.residual_module.filter_reg"])
    port_lwl_decoder(sd, params, batch_stats)
    # label/bbox encoders are ResidualDS16FeatSWBox (res1..res3); the segm
    # encoder is ResidualDS16SW (res1..res2)
    port_lwl_label_encoder(sd, params, batch_stats, "label_encoder",
                           "label_encoder", n_res=3)
    port_lwl_label_encoder(sd, params, batch_stats, "bbox_encoder",
                           "bbox_encoder", n_res=3)
    port_lwl_label_encoder(sd, params, batch_stats, "segm_encoder",
                           "segm_encoder", n_res=2)
    return {"params": params, "batch_stats": batch_stats}


def port_tompnet(state_dict: Dict[str, np.ndarray],
                 layers: Tuple[int, ...] = (3, 4, 6, 3)) -> dict:
    """ToMPnet-50/101 checkpoint (reference ltr/models/tracking/tompnet.py:13)
    -> flax variables."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                layers, "bottleneck")
    port_tomp_head(sd, params, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def port_box_encoding(sd: Dict[str, np.ndarray], params: dict, batch_stats: dict,
                      prefix: str, flax_prefix: str):
    """Conv1d-MLP box encoder (reference filter_predictor.py:6-16 MLP)."""
    for conv_i, bn_i, lin in ((0, 1, "lin0"), (3, 4, "lin1"), (6, None, "lin2")):
        w = sd[f"{prefix}.{conv_i}.weight"][..., 0]
        set_in(params, f"{flax_prefix}/{lin}/kernel", np.ascontiguousarray(w.T))
        set_in(params, f"{flax_prefix}/{lin}/bias", sd[f"{prefix}.{conv_i}.bias"])
        if bn_i is not None:
            port_bn(sd, f"{prefix}.{bn_i}", params, batch_stats,
                    f"{flax_prefix}/bn{conv_i // 3}")


def port_tamosnet(state_dict: Dict[str, np.ndarray],
                  layers: Tuple[int, ...] = (3, 4, 6, 3),
                  nhead: int = 8, num_enc: int = 6, num_dec: int = 6) -> dict:
    """TaMOs checkpoint (reference ltr/models/tracking/tamosnet.py:13 + FPNHead)
    -> flax variables. Our TaMOsNet flattens the head: head_feature_extractor /
    filter_predictor / classifier / bb_regressor / fpn are top-level."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                layers, "bottleneck")
    port_conv(sd, "head.feature_extractor.0", params,
              "head_feature_extractor/final_conv")

    fp = "head.filter_predictor"
    set_in(params, "filter_predictor/query_embed_fg",
           sd[f"{fp}.query_embed_fg.weight"])
    port_box_encoding(sd, params, batch_stats, f"{fp}.box_encoding",
                      "filter_predictor/box_encoding")
    port_detr_transformer(sd, f"{fp}.transformer", params,
                          "filter_predictor/transformer", num_enc=num_enc,
                          num_dec=num_dec, nhead=nhead)

    set_in(params, "classifier/linear/kernel",
           linear_kernel(sd["head.classifier.linear.weight"]))
    set_in(params, "classifier/linear/bias", sd["head.classifier.linear.bias"])
    bb = "head.bb_regressor"
    set_in(params, "bb_regressor/linear/kernel",
           linear_kernel(sd[f"{bb}.linear.weight"]))
    set_in(params, "bb_regressor/linear/bias", sd[f"{bb}.linear.bias"])
    for i, ti in enumerate((0, 3, 6, 9)):
        port_conv(sd, f"{bb}.tower.{ti}", params, f"bb_regressor/tower{i}_conv")
        port_gn(sd, f"{bb}.tower.{ti + 1}", params, f"bb_regressor/tower{i}_gn")
    port_conv(sd, f"{bb}.bbreg_layer", params, "bb_regressor/bbreg_layer")

    # FPN: torchvision layout inner_blocks (1x1 laterals, feat2 then feat3) +
    # layer_blocks (3x3 smoothing)
    port_conv(sd, "head.fpn.fpn.inner_blocks.0", params, "fpn/lateral2")
    port_conv(sd, "head.fpn.fpn.inner_blocks.1", params, "fpn/lateral3")
    port_conv(sd, "head.fpn.fpn.layer_blocks.0", params, "fpn/smooth2")
    port_conv(sd, "head.fpn.fpn.layer_blocks.1", params, "fpn/smooth3")
    return {"params": params, "batch_stats": batch_stats}


def _conv1d_dense(sd: Dict[str, np.ndarray], torch_prefix: str, params: dict,
                  flax_path: str):
    """torch Conv1d(k=1) -> flax Dense."""
    w = sd[torch_prefix + ".weight"][..., 0]       # (out, in)
    set_in(params, flax_path + "/kernel", np.ascontiguousarray(w.T))
    if torch_prefix + ".bias" in sd:
        set_in(params, flax_path + "/bias", sd[torch_prefix + ".bias"])


def port_tcm(state_dict: Dict[str, np.ndarray], num_gnn_layers: int = 2) -> dict:
    """Target candidate matching net (KeepTrack; reference ltr/models/
    target_candidate_matching/target_candidate_matching.py:90) -> flax variables."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_resnet(sd, params, batch_stats, "feature_extractor", "feature_extractor",
                (3, 4, 6, 3), "bottleneck")
    port_conv(sd, "descriptor_extractor.conv", params, "descriptor_extractor/conv")

    m = "matcher"
    set_in(params, "matcher/bin_score", sd[f"{m}.bin_score"])
    # keypoint encoder: Conv1d MLP with BN (indices 0,3,6,9,12 convs / 1,4,7,10 BN)
    for i, ci in enumerate((0, 3, 6, 9, 12)):
        _conv1d_dense(sd, f"{m}.kenc.encoder.{ci}", params,
                      f"matcher/kenc/encoder/lin{i}")
        if ci != 12:
            port_bn(sd, f"{m}.kenc.encoder.{ci + 1}", params, batch_stats,
                    f"matcher/kenc/encoder/bn{i}")
    # GNN layers: attn proj.0/1/2 = q/k/v, merge; mlp 0 (conv) 1 (BN) 3 (conv)
    for i in range(2 * num_gnn_layers):
        tp = f"{m}.gnn.layers.{i}.update"
        fp = f"matcher/gnn/layer{i}"
        for j, name in enumerate(("proj_q", "proj_k", "proj_v")):
            _conv1d_dense(sd, f"{tp}.attn.proj.{j}", params, f"{fp}/attn/{name}")
        _conv1d_dense(sd, f"{tp}.attn.merge", params, f"{fp}/attn/merge")
        _conv1d_dense(sd, f"{tp}.mlp.0", params, f"{fp}/mlp/lin0")
        port_bn(sd, f"{tp}.mlp.1", params, batch_stats, f"{fp}/mlp/bn0")
        _conv1d_dense(sd, f"{tp}.mlp.3", params, f"{fp}/mlp/lin1")
    _conv1d_dense(sd, f"{m}.final_proj", params, "matcher/final_proj")
    return {"params": params, "batch_stats": batch_stats}


def port_resnet18_vggm(state_dict: Dict[str, np.ndarray],
                       flax_prefix: str = "") -> dict:
    """ResNet18-VGG-m1 (reference ltr/models/backbone/resnet18_vggm.py:38) ->
    flax variables for models.backbones.vggm_resnet.ResNet18VGGm1."""
    sd_in = _as_sd(state_dict)
    sd = TrackingStateDict({"net." + k: v for k, v in sd_in.items()})
    params: dict = {}
    batch_stats: dict = {}
    fx = (flax_prefix + "/") if flax_prefix else ""
    port_conv(sd, "net.vggmconv1", params, f"{fx}vggmconv1")
    port_resnet(sd, params, batch_stats, "net", flax_prefix or "",
                (2, 2, 2, 2), "basic")
    if isinstance(sd_in, TrackingStateDict):
        sd_in.consumed.update(k[len("net."):] for k in sd.consumed)
    if not flax_prefix:
        # port_resnet wrote under the "" key when no prefix; flatten it
        if "" in params:
            params.update(params.pop(""))
        if "" in batch_stats:
            batch_stats.update(batch_stats.pop(""))
    return {"params": params, "batch_stats": batch_stats}


def port_mobilenetv3(state_dict: Dict[str, np.ndarray]) -> dict:
    """MobileNetV3-LARGE (reference ltr/models/backbone/mobilenetv3.py:134) ->
    flax variables for models.backbones.mobilenetv3.MobileNetV3Large."""
    sd = _as_sd(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    port_conv(sd, "init_conv.0", params, "init_conv")
    port_bn(sd, "init_conv.1", params, batch_stats, "init_bn")
    stage_sizes = (1, 2, 3, 4, 2, 3)
    for s_i, n in enumerate(stage_sizes):
        for b_i in range(n):
            tp = f"layer{s_i + 1}" if n == 1 else f"layer{s_i + 1}.{b_i}"
            fp = f"layer{s_i + 1}_{b_i}"
            port_conv(sd, f"{tp}.conv.0", params, f"{fp}/expand_conv")
            port_bn(sd, f"{tp}.conv.1", params, batch_stats, f"{fp}/expand_bn")
            port_conv(sd, f"{tp}.depth_conv.0", params, f"{fp}/depth_conv")
            port_bn(sd, f"{tp}.depth_conv.1", params, batch_stats, f"{fp}/depth_bn")
            if f"{tp}.squeeze_block.dense.0.weight" in sd:
                set_in(params, f"{fp}/se/fc0/kernel",
                       linear_kernel(sd[f"{tp}.squeeze_block.dense.0.weight"]))
                set_in(params, f"{fp}/se/fc0/bias",
                       sd[f"{tp}.squeeze_block.dense.0.bias"])
                set_in(params, f"{fp}/se/fc1/kernel",
                       linear_kernel(sd[f"{tp}.squeeze_block.dense.2.weight"]))
                set_in(params, f"{fp}/se/fc1/bias",
                       sd[f"{tp}.squeeze_block.dense.2.bias"])
            port_conv(sd, f"{tp}.point_conv.0", params, f"{fp}/point_conv")
            port_bn(sd, f"{tp}.point_conv.1", params, batch_stats, f"{fp}/point_bn")
    if "out_conv1.0.weight" in sd:
        port_conv(sd, "out_conv1.0", params, "out_conv1")
        port_bn(sd, "out_conv1.1", params, batch_stats, "out_bn1")
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth.tar checkpoint (the 'net' field of the trainer state,
    reference ltr/admin/loading.py:35-117)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    return {k: v.numpy() for k, v in sd.items()}
