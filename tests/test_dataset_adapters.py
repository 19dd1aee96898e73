"""Dataset adapters over fabricated mini dataset trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _img(path, w=32, h=24):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def _reset_env(tmp_path, **kwargs):
    os.environ["PYTRACKING_TPU_ROOT"] = str(tmp_path)
    for k, v in kwargs.items():
        os.environ["PYTRACKING_TPU_" + k.upper()] = str(v)
    import pytracking_tpu.evaluation.environment as envmod
    envmod._env_settings = None


def test_otb_adapter(tmp_path):
    root = tmp_path / "otb"
    for i in range(1, 4):
        _img(str(root / "Basketball" / "img" / f"{i:04d}.jpg"))
    np.savetxt(root / "Basketball" / "groundtruth_rect.txt",
               np.tile([10, 10, 5, 5], (3, 1)), delimiter=",", fmt="%d")
    _reset_env(tmp_path, otb_path=root)
    from pytracking_tpu.evaluation.adapters.otb import OTBDataset
    seqs = OTBDataset().get_sequence_list()
    assert len(seqs) == 1
    assert len(seqs[0].frames) == 3
    assert seqs[0].ground_truth_rect.shape == (3, 4)


def test_lasot_adapter(tmp_path):
    root = tmp_path / "lasot"
    seq = root / "cat-1"
    for i in range(1, 4):
        _img(str(seq / "img" / f"{i:08d}.jpg"))
    np.savetxt(seq / "groundtruth.txt", np.tile([5, 5, 4, 4], (3, 1)),
               delimiter=",", fmt="%d")
    np.savetxt(seq / "full_occlusion.txt", np.zeros((1, 3)), delimiter=",", fmt="%d")
    np.savetxt(seq / "out_of_view.txt", np.array([[0, 1, 0]]), delimiter=",",
               fmt="%d")
    _reset_env(tmp_path, lasot_path=root)
    from pytracking_tpu.evaluation.adapters.lasot import LaSOTDataset
    seqs = LaSOTDataset().get_sequence_list()
    assert len(seqs) == 1
    assert seqs[0].target_visible.tolist() == [True, False, True]


def test_got10k_adapter(tmp_path):
    root = tmp_path / "got10k" / "test" / "GOT-10k_Test_000001"
    for i in range(1, 3):
        _img(str(root / f"{i:08d}.jpg"))
    np.savetxt(root / "groundtruth.txt", np.array([[1, 2, 3, 4]]), delimiter=",",
               fmt="%d")
    _reset_env(tmp_path, got10k_path=tmp_path / "got10k")
    from pytracking_tpu.evaluation.adapters.got10k import GOT10KDataset
    seqs = GOT10KDataset(split="test").get_sequence_list()
    assert len(seqs) == 1


def test_trackingnet_adapter(tmp_path):
    root = tmp_path / "tn" / "TEST"
    _img(str(root / "frames" / "seqA" / "0.jpg"))
    _img(str(root / "frames" / "seqA" / "1.jpg"))
    os.makedirs(root / "anno", exist_ok=True)
    np.savetxt(root / "anno" / "seqA.txt", np.array([[1, 2, 3, 4]]), delimiter=",",
               fmt="%d")
    _reset_env(tmp_path, trackingnet_path=tmp_path / "tn")
    from pytracking_tpu.evaluation.adapters.trackingnet import TrackingNetDataset
    seqs = TrackingNetDataset().get_sequence_list()
    assert len(seqs) == 1 and len(seqs[0].frames) == 2


def test_vot_adapter_polygon(tmp_path):
    root = tmp_path / "vot" / "ants1"
    _img(str(root / "color" / "00000001.jpg"))
    poly = np.array([[10, 10, 20, 10, 20, 20, 10, 20]])
    np.savetxt(root / "groundtruth.txt", poly, delimiter=",", fmt="%d")
    _reset_env(tmp_path, vot_path=tmp_path / "vot")
    from pytracking_tpu.evaluation.adapters.vot import VOTDataset
    seqs = VOTDataset().get_sequence_list()
    assert len(seqs) == 1
    assert seqs[0].ground_truth_rect.shape == (1, 4)
    # preserve-area conversion of an axis-aligned square is (almost) itself
    np.testing.assert_allclose(seqs[0].ground_truth_rect[0][2:], [11, 11], atol=1.01)


def test_davis_adapter(tmp_path):
    from pytracking_tpu.utils.png_io import imwrite_indexed

    root = tmp_path / "davis"
    os.makedirs(root / "ImageSets" / "2017", exist_ok=True)
    (root / "ImageSets" / "2017" / "val.txt").write_text("bike\n")
    for i in range(2):
        _img(str(root / "JPEGImages" / "480p" / "bike" / f"{i:05d}.jpg"))
        os.makedirs(root / "Annotations" / "480p" / "bike", exist_ok=True)
        m = np.zeros((24, 32), np.uint8)
        m[5:10, 5:10] = 1
        m[15:20, 15:20] = 2
        imwrite_indexed(str(root / "Annotations" / "480p" / "bike" / f"{i:05d}.png"),
                        m)
    _reset_env(tmp_path, davis_dir=root)
    from pytracking_tpu.evaluation.adapters.davis import DavisDataset
    seqs = DavisDataset().get_sequence_list()
    assert len(seqs) == 1
    assert seqs[0].object_ids == ["1", "2"]
    assert seqs[0].init_info()["object_ids"] == ["1", "2"]


def test_youtubevos_adapter(tmp_path):
    from pytracking_tpu.utils.png_io import imwrite_indexed

    root = tmp_path / "ytvos" / "2019" / "valid"
    meta = {"videos": {"vid1": {"objects": {
        "1": {"frames": ["00000"]}, "2": {"frames": ["00005"]}}}}}
    os.makedirs(root, exist_ok=True)
    (root / "meta.json").write_text(json.dumps(meta))
    for fn in ("00000", "00005"):
        _img(str(root / "JPEGImages" / "vid1" / f"{fn}.jpg"))
        os.makedirs(root / "Annotations" / "vid1", exist_ok=True)
        m = np.zeros((24, 32), np.uint8)
        m[2:6, 2:6] = 1 if fn == "00000" else 2
        imwrite_indexed(str(root / "Annotations" / "vid1" / f"{fn}.png"), m)
    _reset_env(tmp_path, youtubevos_dir=tmp_path / "ytvos")
    from pytracking_tpu.evaluation.adapters.youtubevos import YouTubeVOSDataset
    seqs = YouTubeVOSDataset().get_sequence_list()
    assert len(seqs) == 1
    # object 2 initializes at frame index 1 (mid-sequence)
    assert 1 in seqs[0].init_data
    assert seqs[0].init_data[1]["object_ids"] == ["2"]


def test_vos_jf_measures():
    from pytracking_tpu.analysis.evaluate_vos import (binary_jaccard,
                                                      boundary_f_measure)
    a = np.zeros((40, 40), bool)
    a[10:20, 10:20] = True
    assert binary_jaccard(a, a) == 1.0
    assert boundary_f_measure(a, a) == 1.0
    b = np.roll(a, 2, axis=0)
    assert 0.5 < binary_jaccard(a, b) < 1.0
    assert boundary_f_measure(a, np.zeros_like(a)) == 0.0


def test_oxuva_adapter(tmp_path):
    root = tmp_path / "oxuva"
    os.makedirs(root / "tasks")
    os.makedirs(root / "annotations")
    # dev task: vid001/obj1 frames 0..2
    with open(root / "tasks" / "dev.csv", "w") as f:
        f.write("vid001,obj1,0,2,0.1,0.5,0.2,0.6\n")
    with open(root / "annotations" / "dev.csv", "w") as f:
        f.write("vid001,obj1,1,person,False,True,0,present,0.1,0.5,0.2,0.6\n")
        f.write("vid001,obj1,1,person,False,True,2,present,0.2,0.6,0.3,0.7\n")
    for t in range(3):
        _img(str(root / "images" / "dev" / "vid001" / f"{t:06d}.jpeg"))
    _reset_env(tmp_path, oxuva_path=root)
    from pytracking_tpu.evaluation.adapters.oxuva import OxUvADataset
    seqs = OxUvADataset(split="dev").get_sequence_list()
    assert len(seqs) == 1
    gt = seqs[0].ground_truth_rect
    assert gt.shape == (3, 4)
    assert np.all(gt[1] == -1)          # unannotated frame
    assert gt[0][0] == 0.1 * 32          # xmin * width


def test_lagot_adapter_multiobj(tmp_path):
    lasot_root = tmp_path / "lasot"
    lagot_root = tmp_path / "lagot"
    os.makedirs(lagot_root)
    frames = [f"seq/img/{i:08d}.jpg" for i in range(1, 4)]
    for fp in frames:
        _img(str(lasot_root / fp))
    anno = {"seq1": {"frames": frames,
                     "xywh": {"1": [[1, 2, 3, 4]] * 3, "2": [[5, 6, 7, 8]] * 3}}}
    with open(lagot_root / "LaGOT_multiple_object_per_sequence_annotations_final.json",
              "w") as f:
        json.dump(anno, f)
    _reset_env(tmp_path, lasot_path=lasot_root, lagot_path=lagot_root)
    from pytracking_tpu.evaluation.adapters.lagot import LaGOTDataset
    seqs = LaGOTDataset(sot_mode=False).get_sequence_list()
    assert len(seqs) == 1
    assert seqs[0].multiobj_mode
    assert set(seqs[0].object_ids) == {"1", "2"}
    assert set(seqs[0].init_data[0]["object_ids"]) == {"1", "2"}


def test_mobiface_adapter(tmp_path):
    root = tmp_path / "mobiface"
    os.makedirs(root / "train" / "faceA")
    with open(root / "train.meta.csv", "w") as f:
        f.write("name,fps\nfaceA,30\n")
    with open(root / "test.meta.csv", "w") as f:
        f.write("name,fps\n")
    for i in range(3):
        _img(str(root / "train" / "faceA" / f"{i:04d}.jpg"))
    np.savetxt(root / "train" / "faceA.annot.csv",
               np.c_[np.arange(3), np.tile([1, 2, 3, 4], (3, 1))], delimiter=",",
               fmt="%d", header="frame,x,y,w,h")
    _reset_env(tmp_path, mobiface_path=root)
    from pytracking_tpu.evaluation.adapters.mobiface import MobifaceDataset
    seqs = MobifaceDataset(split="train").get_sequence_list()
    assert len(seqs) == 1
    assert seqs[0].ground_truth_rect.shape == (3, 4)


def test_attribute_specs_and_filter(tmp_path):
    spec = {"att_name_long": ["Fast Motion", "Occlusion"],
            "att_name_short": ["FM", "OCC"],
            "SeqA": ["FM"], "SeqB": ["OCC", "FM"], "SeqC": []}
    spec_dir = tmp_path / "specs"
    os.makedirs(spec_dir)
    with open(spec_dir / "otb_attributes.json", "w") as f:
        json.dump(spec, f)
    _reset_env(tmp_path, attribute_specs_path=spec_dir)
    import pytracking_tpu.evaluation.attribute_specs as asp
    asp._cache.clear()
    assert asp.attribute_names("otb") == ["FM", "OCC"]
    assert asp.sequence_attributes("otb", "SeqB") == ["OCC", "FM"]
    kept = asp.filter_names_by_attribute("otb", ["SeqA", "SeqB", "SeqC"],
                                         "Occlusion")
    assert kept == ["SeqB"]
    asp._cache.clear()


def test_get_dataset_attributes(tmp_path):
    spec = {"att_name_long": ["Fast Motion"], "att_name_short": ["FM"],
            "Basketball": ["FM"]}
    root = tmp_path / "otb"
    for i in range(1, 3):
        _img(str(root / "Basketball" / "img" / f"{i:04d}.jpg"))
    np.savetxt(root / "Basketball" / "groundtruth_rect.txt",
               np.tile([10, 10, 5, 5], (2, 1)), delimiter=",", fmt="%d")
    spec_dir = tmp_path / "specs"
    os.makedirs(spec_dir)
    with open(spec_dir / "otb_attributes.json", "w") as f:
        json.dump(spec, f)
    _reset_env(tmp_path, otb_path=root, attribute_specs_path=spec_dir)
    import pytracking_tpu.evaluation.attribute_specs as asp
    asp._cache.clear()
    from pytracking_tpu.evaluation.datasets import get_dataset_attributes
    by_attr = get_dataset_attributes("otb")
    assert "FM" in by_attr
    assert len(by_attr["FM"]) == 1
    asp._cache.clear()
