"""Whole-harness VOS + multi-object parity (round-4 VERDICT items):

* LWL and RTS through BOTH full VOS stacks: reference run_dataset ->
  MultiObjectWrapper -> indexed-PNG segmentation writer -> reference
  evaluate_vos J measure, vs our run_dataset -> our MultiObjectWrapper ->
  our indexed-PNG writer -> our analysis.evaluate_vos — final J means compared.
* TaMOs on a multi-object synthetic through BOTH native multi-object paths with
  the LaGOT prec/rec/F1 analysis (reference extract_results.py:186 vs ours).
"""

import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference checkout not available", allow_module_level=True)

import tests.refshim  # noqa: F401

from pytracking_tpu.utils import port_weights as pw
from tests.test_reference_parity import randomize_bn_stats
from tests.test_whole_harness_auc_parity import (_WrapperStub,
                                                 _install_reference_env)

N_FRAMES = 6
H, W = 240, 320


# ------------------------------------------------------------- VOS benchmark --

def _write_vos_benchmark(root, n_seq=2):
    """Synthetic DAVIS-style benchmark on disk: textured 50x60 target moving over
    a textured background; frames as PNG + per-frame indexed annotation PNGs.
    Returns [(name, [frame paths], [anno paths])]."""
    from pytracking_tpu.utils.png_io import imwrite_indexed

    rng = np.random.default_rng(7)
    out = []
    for s, (vx, vy) in enumerate([(5, 3), (-4, 3)][:n_seq]):
        bg = rng.integers(30, 90, (H, W, 3)).astype(np.uint8)
        tex = rng.integers(140, 255, (60, 50, 3)).astype(np.uint8)
        cx0 = 120 if vx >= 0 else 200
        cy0 = 120
        img_dir = os.path.join(root, "JPEGImages", f"seq{s:02d}")
        ann_dir = os.path.join(root, "Annotations", f"seq{s:02d}")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        frames, annos = [], []
        for t in range(N_FRAMES):
            cx, cy = cx0 + vx * t, cy0 + vy * t
            im = bg.copy()
            im[cy - 30:cy + 30, cx - 25:cx + 25] = tex
            fp = os.path.join(img_dir, f"{t:05d}.png")
            cv2.imwrite(fp, cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
            mask = np.zeros((H, W), np.uint8)
            mask[cy - 30:cy + 30, cx - 25:cx + 25] = 1
            ap = os.path.join(ann_dir, f"{t:05d}.png")
            imwrite_indexed(ap, mask)
            frames.append(fp)
            annos.append(ap)
        bbox0 = [cx0 - 25.0, cy0 - 30.0, 50.0, 60.0]
        out.append((f"seq{s:02d}", frames, annos, bbox0))
    return out


# ------------------------------------------------------- reference VOS stack --

def _ref_lwl_params(ref_net):
    from pytracking.features.net_wrappers import NetWithBackbone
    from pytracking.utils.params import TrackerParams

    wrapper = NetWithBackbone(net_path="unused", use_gpu=False,
                              image_format="bgr255",
                              mean=[102.9801, 115.9465, 122.7717],
                              std=[1.0, 1.0, 1.0])
    wrapper.net = ref_net
    wrapper.initialize = lambda *a, **k: None
    p = TrackerParams()
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            multiobj_mode="parallel",
            seg_to_bb_mode="var", max_scale_change=(0.95, 1.1),
            min_mask_area=100, image_sample_size=(30 * 16, 52 * 16),
            search_area_scale=5.0, border_mode="inside_major",
            patch_max_scale_change=None, sample_memory_size=32,
            learning_rate=0.1, init_samples_minimum_weight=0.25,
            train_skipping=1, update_target_model=True, net_opt_iter=20,
            net_opt_update_iter=3).items():
        setattr(p, k, v)
    p.net = wrapper
    return p


def _ref_rts_params(ref_net):
    from pytracking.features.net_wrappers import NetWithBackbone
    from pytracking.utils.params import TrackerParams

    wrapper = NetWithBackbone(net_path="unused", use_gpu=False,
                              image_format="bgr255",
                              mean=[102.9801, 115.9465, 122.7717],
                              std=[1.0, 1.0, 1.0])
    wrapper.net = ref_net
    wrapper.initialize = lambda *a, **k: None
    p = TrackerParams()
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            multiobj_mode="parallel", seg_to_bb_mode="var", min_mask_area=100,
            image_sample_size=(30 * 16, 52 * 16), search_area_scale=6.0,
            border_mode="inside_major", patch_max_scale_change=None,
            max_scale_change=(0.8, 1.2), sample_memory_size=32,
            learning_rate=0.1, init_samples_minimum_weight=0.25,
            train_skipping=20, update_target_model=True, net_opt_iter=20,
            net_opt_update_iter=3, clf_image_sample_size=(30 * 16, 52 * 16),
            clf_search_area_scale=6.0, clf_border_mode="inside_major",
            clf_patch_max_scale_change=None, clf_sample_memory_size=50,
            clf_learning_rate=0.01, clf_train_skipping=20,
            update_classifier=True, clf_net_opt_iter=10,
            clf_net_opt_update_iter=2, clf_net_opt_hn_iter=1,
            clf_output_sigma_factor=0.25, clf_advanced_localization=True,
            clf_target_not_found_threshold=0.30,
            clf_target_not_found_threshold_too_small=0.50,
            clf_distractor_threshold=10000, clf_hard_negative_threshold=10000,
            clf_target_neighborhood_scale=2.2, clf_displacement_scale=0.8,
            clf_hard_negative_learning_rate=0.02,
            clf_use_augmentation=True,
            clf_augmentation={"fliplr": True,
                              "blur": [(3, 1), (1, 3), (2, 2)]}).items():
        setattr(p, k, v)
    p.net = wrapper
    return p


def _make_ref_sequences(bench):
    from pytracking.evaluation.data import Sequence

    return [Sequence(name, list(frames), "davis", None,
                     ground_truth_seg=list(annos),
                     init_data={0: {"object_ids": ["1"], "mask": annos[0],
                                    "bbox": {"1": list(bbox0)}}},
                     object_ids=["1"], multiobj_mode=True)
            for name, frames, annos, bbox0 in bench]


def _run_reference_vos(tmp_path, bench, name, params_builder, ref_net):
    """Reference run_dataset -> segmentation PNGs -> evaluate_dataset (J).
    Returns mean J over sequences/objects."""
    _install_reference_env(tmp_path)
    from pytracking.evaluation.running import run_dataset
    from pytracking.evaluation.tracker import Tracker
    import pytracking.analysis.evaluate_vos as rev

    seqs = _make_ref_sequences(bench)
    trk = Tracker(name, "harness_vos")
    trk.get_parameters = lambda: params_builder(ref_net)
    run_dataset(seqs, [trk], debug=False, threads=0)

    for name_, _, _, _ in bench:
        seg_dir = os.path.join(trk.segmentation_dir, name_)
        assert os.path.isdir(seg_dir), \
            f"reference harness wrote no segmentations for {name_}"

    rev.get_dataset = lambda *a, **k: _make_ref_sequences(bench)
    # text_bargraph uses the removed np.int alias; it is display-only
    rev.utils.text_bargraph = lambda v: ""
    seq_names, scores, recall, decay = rev.evaluate_dataset(
        trk.segmentation_dir, "synthetic_vos", measure="J", to_file=False,
        quiet=True)
    return float(np.mean(scores))


# ------------------------------------------------------------- our VOS stack --

class _MultiObjStub(_WrapperStub):
    """Stub whose create_tracker builds OUR MultiObjectWrapper around the given
    (cls, params, net, variables) — the real product route for multiobj
    'parallel' trackers (evaluation/tracker.py:110-128)."""

    def __init__(self, name, results_dir, cls, params, net, variables):
        super().__init__(name, results_dir, None)
        self._spec = (cls, params, net, variables)

    def create_tracker(self, multiobj=False):
        from pytracking_tpu.evaluation.multi_object_wrapper import \
            MultiObjectWrapper
        cls, params, net, variables = self._spec
        assert multiobj, "VOS benchmark sequences must be multiobj"
        return MultiObjectWrapper(cls, params, net, variables)


def _run_my_vos(tmp_path, bench, name, cls, params, net, variables):
    from pytracking_tpu.analysis.evaluate_vos import evaluate_vos
    from pytracking_tpu.evaluation.data import Sequence
    from pytracking_tpu.evaluation.running import run_dataset

    os.environ["PYTRACKING_TPU_RESULTS_PATH"] = \
        os.path.join(str(tmp_path), "my_results")
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None

    seqs = [Sequence(nm, list(frames), "davis", None,
                     ground_truth_seg=list(annos),
                     init_data={0: {"object_ids": ["1"], "mask": annos[0],
                                    "bbox": {"1": list(bbox0)}}},
                     object_ids=["1"], multiobj_mode=True)
            for nm, frames, annos, bbox0 in bench]

    stub = _MultiObjStub(name, os.path.join(str(tmp_path), "my_results", name,
                                            "harness_vos"),
                         cls, params, net, variables)
    run_dataset(seqs, [stub], debug=0, threads=0)

    for nm, _, _, _ in bench:
        assert os.path.isdir(os.path.join(stub.segmentation_dir, nm)), \
            f"our harness wrote no segmentations for {nm}"

    results = evaluate_vos([stub], seqs, quiet=True)
    (res,) = results.values()
    return res["J-Mean"]




def _product_mask_iou(tmp_path, name, bench):
    """Per-frame mask IoU between the two products' saved indexed PNGs."""
    from pytracking_tpu.utils.png_io import imread_indexed

    ious = []
    for seq_name, frames, _, _ in bench:
        ref_dir = os.path.join(str(tmp_path), "ref_segm", name, "harness_vos",
                               seq_name)
        my_dir = os.path.join(str(tmp_path), "my_results", name,
                              "harness_vos_segm", seq_name)
        for fr in frames:
            fn = os.path.splitext(os.path.basename(fr))[0] + ".png"
            rp, mp = os.path.join(ref_dir, fn), os.path.join(my_dir, fn)
            if not (os.path.isfile(rp) and os.path.isfile(mp)):
                continue
            a = imread_indexed(rp) == 1
            b = imread_indexed(mp) == 1
            ious.append(float((a & b).sum()) / max(float((a | b).sum()), 1.0))
    return float(np.mean(ious)), float(np.min(ious))

# -------------------------------------------------------------------- tests --

def test_whole_harness_lwl_vos_jf(tmp_path):
    import ltr.models.lwl.lwl_net as ref_lwl

    from pytracking_tpu.models.lwl.lwl_net import steepest_descent_resnet50
    from pytracking_tpu.trackers.lwl import LWLParams, LWLTracker

    bench = _write_vos_benchmark(os.path.join(str(tmp_path), "vosbench"))

    torch.manual_seed(0)
    ref_net = ref_lwl.steepest_descent_resnet50(
        filter_size=3, num_filters=16, optim_iter=3, backbone_pretrained=False,
        out_feature_dim=512, label_encoder_dims=(16, 32, 64),
        use_bn_in_label_enc=False, clf_feat_blocks=0, final_conv=True,
        backbone_type="mrcnn")
    ref_net.eval()
    randomize_bn_stats(ref_net)
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    variables = pw.port_lwlnet(sd)

    ref_j = _run_reference_vos(tmp_path, bench, "lwl", _ref_lwl_params, ref_net)

    net = steepest_descent_resnet50(
        filter_size=3, num_filters=16, optim_iter=3, out_feature_dim=512,
        label_encoder_dims=(16, 32, 64))
    my_j = _run_my_vos(tmp_path, bench, "lwl", LWLTracker, LWLParams(), net,
                       variables)

    mean_iou, min_iou = _product_mask_iou(tmp_path, "lwl", bench)
    print(f"\n--- whole-harness VOS parity [lwl] --- "
          f"ref J {ref_j:.3f}  our J {my_j:.3f}  dJ {my_j - ref_j:+.3f}  "
          f"product mask IoU mean {mean_iou:.3f} min {min_iou:.3f}")
    # random-weight LWL over-segments on BOTH sides (no pretrained checkpoints
    # in this env; the decoder is not online-learned) so J-vs-gt is low — the
    # parity evidence is the per-frame PRODUCT mask agreement through both full
    # pipelines (measured 0.97-1.0) plus the matching final J tables
    assert abs(my_j - ref_j) <= 0.05, \
        f"lwl J {my_j:.3f} vs reference {ref_j:.3f}"
    assert mean_iou > 0.9 and min_iou > 0.8, \
        f"product masks diverge: mean {mean_iou:.3f} min {min_iou:.3f}"


def test_whole_harness_rts_vos_jf(tmp_path):
    import ltr.models.rts.rts_net as ref_rts

    from pytracking_tpu.models.rts.rts_net import rts50
    from pytracking_tpu.trackers.rts import RTSParams, RTSTracker

    bench = _write_vos_benchmark(os.path.join(str(tmp_path), "vosbench"))

    torch.manual_seed(0)
    ref_net = ref_rts.steepest_descent_resnet50_with_clf_encoder(
        filter_size=3, num_filters=16, optim_iter=3, backbone_pretrained=False,
        out_feature_dim=512, label_encoder_dims=(16, 32, 64),
        use_bn_in_label_enc=False, clf_feat_blocks=0, final_conv=True,
        backbone_type="mrcnn", clf_filter_size=4, clf_score_act="relu",
        clf_hinge_threshold=0.05, clf_activation_leak=0.1,
        clf_with_extractor=True, clf_enc_input="sc")
    ref_net.eval()
    randomize_bn_stats(ref_net)
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    variables = pw.port_rtsnet(sd)

    ref_j = _run_reference_vos(tmp_path, bench, "rts", _ref_rts_params, ref_net)

    my_j = _run_my_vos(tmp_path, bench, "rts", RTSTracker, RTSParams(),
                       rts50(optim_iter=3), variables)

    mean_iou, min_iou = _product_mask_iou(tmp_path, "rts", bench)
    print(f"\n--- whole-harness VOS parity [rts] --- "
          f"ref J {ref_j:.3f}  our J {my_j:.3f}  dJ {my_j - ref_j:+.3f}  "
          f"product mask IoU mean {mean_iou:.3f} min {min_iou:.3f}")
    assert abs(my_j - ref_j) <= 0.05, \
        f"rts J {my_j:.3f} vs reference {ref_j:.3f}"
    assert mean_iou > 0.9 and min_iou > 0.8, \
        f"product masks diverge: mean {mean_iou:.3f} min {min_iou:.3f}"


# ------------------------------------------- TaMOs multi-object + LaGOT F1 --

def _write_multiobj_benchmark(root, n_seq=2, n_frames=8):
    """Two textured squares per sequence moving apart; gt dict per object.
    Returns [(name, [frame paths], {obj_id: gt (N,4)})]."""
    rng = np.random.default_rng(3)
    out = []
    for s in range(n_seq):
        bg = rng.integers(30, 90, (H, W, 3)).astype(np.uint8)
        tex1 = rng.integers(140, 255, (40, 40, 3)).astype(np.uint8)
        tex2 = rng.integers(140, 255, (40, 40, 3)).astype(np.uint8)
        seq_dir = os.path.join(root, f"mseq{s:02d}")
        os.makedirs(seq_dir, exist_ok=True)
        frames = []
        gt = {"1": [], "2": []}
        for t in range(n_frames):
            c1 = (90 + 4 * t, 100 + 2 * t)
            c2 = (230 - 4 * t, 150 - 2 * t)
            im = bg.copy()
            im[c1[1] - 20:c1[1] + 20, c1[0] - 20:c1[0] + 20] = tex1
            im[c2[1] - 20:c2[1] + 20, c2[0] - 20:c2[0] + 20] = tex2
            p = os.path.join(seq_dir, f"{t:04d}.png")
            cv2.imwrite(p, cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
            frames.append(p)
            gt["1"].append([c1[0] - 20.0, c1[1] - 20.0, 40.0, 40.0])
            gt["2"].append([c2[0] - 20.0, c2[1] - 20.0, 40.0, 40.0])
        out.append((f"mseq{s:02d}", frames,
                    {k: np.asarray(v) for k, v in gt.items()}))
    return out


class _ObjView:
    """Per-object pseudo-sequence view for the F1 analysis (the LaGOT sot_mode
    layout): results live in {seq}_{oid}.txt, gt is the object's track."""

    def __init__(self, name, gt):
        self.name = name
        self.ground_truth_rect = gt
        # the reference's F1 extractor indexes target_visible directly
        # (extract_results.py:234) — LaGOT always provides it
        self.target_visible = np.ones(len(gt), dtype=np.uint8)
        self.dataset = "lagot"


class _ObjTrackerView:
    def __init__(self, trk):
        self.name = trk.name
        self.parameter_name = getattr(trk, "parameter_name", "harness")
        self.run_id = None
        self.display_name = getattr(trk, "display_name", trk.name)
        self.results_dir = trk.results_dir


def _f1_from_results(trk, bench, side):
    """Run the LaGOT prec/rec/F1 analysis over per-object result files."""
    views = [_ObjView(f"{name}_{oid}", gt[oid])
             for name, _, gt in bench for oid in sorted(gt)]
    if side == "ref":
        from pytracking.analysis.extract_results import \
            extract_results_prec_rec_f1
        eval_data = extract_results_prec_rec_f1(
            [_ObjTrackerView(trk)], views, "harness_f1", verbose=False)
        key = next(iter(eval_data["raw_data"]))
        d = eval_data["raw_data"][key]
        return float(d["f1_max"])
    from pytracking_tpu.analysis.extract_results import \
        extract_results_prec_rec_f1
    eval_data = extract_results_prec_rec_f1([_ObjTrackerView(trk)], views)
    key = next(iter(eval_data["raw_data"]))
    return float(eval_data["raw_data"][key]["f1_max"])


def _ref_tamos_params(ref_net):
    from pytracking.features.net_wrappers import NetWithBackbone
    from pytracking.utils.params import TrackerParams

    wrapper = NetWithBackbone(net_path="unused", use_gpu=False)
    wrapper.net = ref_net
    wrapper.initialize = lambda *a, **k: None
    p = TrackerParams()
    for k, v in dict(
            debug=0, visualization=False, use_gpu=False, device="cpu",
            train_feature_size=[24, 36], feature_stride=16,
            image_sample_size=[384, 576], search_area_scale=5,
            sample_memory_size=2, learning_rate=0.01,
            init_samples_minimum_weight=0.25, update_classifier=True,
            window_output=False, use_augmentation=False, augmentation={},
            augmentation_expansion_factor=2, random_shift_factor=1 / 3,
            advanced_localization=True, target_not_found_threshold=0.25,
            distractor_threshold=0.8, hard_negative_threshold=0.5,
            target_neighborhood_scale=1.5, dispalcement_scale=0.8,
            hard_negative_learning_rate=0.02, update_scale_when_uncertain=True,
            conf_ths=0.85, search_area_rescaling_at_occlusion=False,
            use_gt_box=True, plot_iou=False, normalize_scores=True).items():
        setattr(p, k, v)
    p.net = wrapper
    return p


def test_whole_harness_tamos_multiobj_f1(tmp_path):
    """TaMOs native multi-object through both full products + LaGOT F1
    analysis. Random-weight TaMOs holds the init boxes (scores sit below the
    not-found threshold on both sides — the per-frame score parity is asserted
    at trace level in test_tamos_tracker_first_step_score_parity); here the
    joint product path is proven: native multi-object loop, per-object bbox +
    presence writers, and the prec/rec/F1 analysis produce matching tables."""
    import ltr.models.tracking.tamosnet as ref_tamosnet

    from pytracking_tpu.models.tracking.tamosnet import tamosnet_resnet50
    from pytracking_tpu.trackers.tamos import TaMOsParams, TaMOsTracker

    bench = _write_multiobj_benchmark(os.path.join(str(tmp_path), "frames"))

    torch.manual_seed(0)
    ref_net = ref_tamosnet.tamosnet_resnet50(
        backbone_pretrained=False, filter_size=1, head_feat_blocks=0,
        head_feat_norm=True, final_conv=True, out_feature_dim=256,
        feature_sz=(36, 24), head_layer=["layer2", "layer3"], num_tokens=10,
        label_enc="gaussian", box_enc="ltrb_token",
        fpn_head_cls_output_mode=["high"], fpn_head_bbreg_output_mode=["high"],
        frozen_backbone_layers=[])
    ref_net.eval()
    randomize_bn_stats(ref_net)
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    variables = pw.port_tamosnet(sd)

    # ---- reference product (native multi-object: multiobj_mode 'default')
    _install_reference_env(tmp_path)
    from pytracking.evaluation.data import Sequence as RefSequence
    from pytracking.evaluation.running import run_dataset as ref_run_dataset
    from pytracking.evaluation.tracker import Tracker as RefTracker

    ref_seqs = [RefSequence(name, list(frames), "lagot",
                            {k: v.copy() for k, v in gt.items()},
                            object_ids=["1", "2"], multiobj_mode=True)
                for name, frames, gt in bench]
    ref_trk = RefTracker("tamos", "harness_f1")
    ref_trk.get_parameters = lambda: _ref_tamos_params(ref_net)

    # reference TaMOs.initialize returns only {'time'}; the harness default for
    # the init frame is then the SCALAR 1.0 while track() emits per-object
    # dicts, which breaks the reference's own save_scores on mixed rows
    # (running.py:73-75). Emit the per-object init presence explicitly.
    _RefTaMOs = ref_trk.tracker_class

    class _RefTaMOsInitPresence(_RefTaMOs):
        def initialize(self, image, info):
            out = super().initialize(image, info) or {}
            oids = info.get("init_object_ids") or info.get("object_ids") or []
            out["object_presence_score"] = OrderedDict(
                (oid, 1.0) for oid in oids)
            return out

    ref_trk.tracker_class = _RefTaMOsInitPresence
    ref_run_dataset(ref_seqs, [ref_trk], debug=False, threads=0)
    for name, _, gt in bench:
        for oid in gt:
            assert os.path.isfile(os.path.join(ref_trk.results_dir,
                                               f"{name}_{oid}.txt"))
    ref_f1 = _f1_from_results(ref_trk, bench, "ref")

    # ---- our product
    os.environ["PYTRACKING_TPU_RESULTS_PATH"] = \
        os.path.join(str(tmp_path), "my_results")
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None
    from pytracking_tpu.evaluation.data import Sequence
    from pytracking_tpu.evaluation.running import run_dataset
    from tests.test_whole_harness_auc_parity import _WrapperStub

    my_seqs = [Sequence(name, list(frames), "lagot",
                        {k: v.copy() for k, v in gt.items()},
                        object_ids=["1", "2"], multiobj_mode=True)
               for name, frames, gt in bench]
    mine = TaMOsTracker(TaMOsParams(), tamosnet_resnet50(), variables)
    stub = _WrapperStub("tamos", os.path.join(str(tmp_path), "my_results",
                                              "tamos", "harness_f1"), mine)
    run_dataset(my_seqs, [stub], debug=0, threads=0)
    for name, _, gt in bench:
        for oid in gt:
            assert os.path.isfile(os.path.join(stub.results_dir,
                                               f"{name}_{oid}.txt"))
    my_f1 = _f1_from_results(stub, bench, "my")

    print(f"\n--- whole-harness multi-object F1 parity [tamos] --- "
          f"ref F1 {ref_f1:.3f}  our F1 {my_f1:.3f}  "
          f"dF1 {my_f1 - ref_f1:+.3f}")
    assert abs(my_f1 - ref_f1) <= 0.02, \
        f"tamos F1 {my_f1:.3f} vs reference {ref_f1:.3f}"
