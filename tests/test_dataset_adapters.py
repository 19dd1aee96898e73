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


def test_registry_covers_reference_names():
    """Every reference registry name resolves here (VERDICT r3 item 4).

    Reference names parsed from /root/reference/pytracking/evaluation/datasets.py;
    the only accepted rename is vot -> vot18 (we keep both)."""
    import re
    ref_file = "/root/reference/pytracking/evaluation/datasets.py"
    if not os.path.isfile(ref_file):
        pytest.skip("reference checkout not available")
    src = open(ref_file).read()
    body = src.split("dataset_dict = dict(")[1].split("\n)\n")[0]
    ref_names = re.findall(r"^\s*(\w+)=DatasetInfo", body, re.M)
    assert len(ref_names) >= 30
    from pytracking_tpu.evaluation.datasets import dataset_dict
    missing = [n for n in ref_names if n not in dataset_dict]
    assert not missing, f"missing registry entries: {missing}"


def test_lasot_vos_mode_and_train_split(tmp_path):
    from pytracking_tpu.utils.png_io import imwrite_indexed

    root = tmp_path / "lasot"
    for name in ("cat-1", "cat-2"):
        seq = root / name
        for i in range(1, 3):
            _img(str(seq / "img" / f"{i:08d}.jpg"))
        np.savetxt(seq / "groundtruth.txt", np.tile([5, 5, 4, 4], (2, 1)),
                   delimiter=",", fmt="%d")
    mask_dir = tmp_path / "lasot_masks" / "cat-1"
    os.makedirs(mask_dir)
    m = np.zeros((24, 32), np.uint8)
    m[5:9, 5:9] = 1
    imwrite_indexed(str(mask_dir / "00000001.png"), m)
    spec_dir = tmp_path / "specs"
    os.makedirs(spec_dir)
    (spec_dir / "lasot_train_split.txt").write_text("cat-2\n")
    _reset_env(tmp_path, lasot_path=root, lasot_mask_path=tmp_path / "lasot_masks")
    os.environ["PYTRACKING_TPU_DATA_SPECS_PATH"] = str(spec_dir)
    try:
        from pytracking_tpu.evaluation.adapters.lasot import (
            LaSOTDataset, LaSOTTrainSequencesDataset)
        seqs = LaSOTDataset(vos_mode=True).get_sequence_list()
        s1 = [s for s in seqs if s.name == "cat-1"][0]
        assert s1.ground_truth_seg[0] is not None
        assert s1.init_info()["init_mask"].sum() == 16
        train = LaSOTTrainSequencesDataset().get_sequence_list()
        assert [s.name for s in train] == ["cat-2"]
    finally:
        del os.environ["PYTRACKING_TPU_DATA_SPECS_PATH"]


def test_got10k_trackingnet_vos_mode(tmp_path):
    from pytracking_tpu.utils.png_io import imwrite_indexed

    g = tmp_path / "got10k" / "val" / "GOT-10k_Val_000001"
    for i in range(1, 3):
        _img(str(g / f"{i:08d}.jpg"))
    np.savetxt(g / "groundtruth.txt", np.array([[1, 2, 3, 4]]), delimiter=",",
               fmt="%d")
    gm = tmp_path / "got10k_masks" / "GOT-10k_Val_000001"
    os.makedirs(gm)
    m = np.zeros((24, 32), np.uint8)
    m[2:4, 2:4] = 1
    imwrite_indexed(str(gm / "00000001.png"), m)

    t = tmp_path / "tn" / "TEST"
    _img(str(t / "frames" / "seqA" / "0.jpg"))
    _img(str(t / "frames" / "seqA" / "1.jpg"))
    os.makedirs(t / "anno", exist_ok=True)
    np.savetxt(t / "anno" / "seqA.txt", np.array([[1, 2, 3, 4]]), delimiter=",",
               fmt="%d")
    tm = tmp_path / "tn_masks" / "seqA"
    os.makedirs(tm)
    imwrite_indexed(str(tm / "0.png"), m)

    _reset_env(tmp_path, got10k_path=tmp_path / "got10k",
               got10k_mask_path=tmp_path / "got10k_masks",
               trackingnet_path=tmp_path / "tn",
               trackingnet_mask_path=tmp_path / "tn_masks")
    from pytracking_tpu.evaluation.datasets import get_dataset
    gseqs = get_dataset("got10kvos_val")
    assert gseqs[0].init_info()["init_mask"].sum() == 4
    tseqs = get_dataset("trackingnetvos")
    assert tseqs[0].init_info()["init_mask"].sum() == 4


def test_youtubevos_all_frames_jjvalid_cleanup(tmp_path):
    from pytracking_tpu.utils.png_io import imwrite_indexed

    root = tmp_path / "ytvos" / "2019"
    train = root / "train"
    # 0e27472bea carries the known-bad start frames for object "2"
    meta = {"videos": {
        "0e27472bea": {"objects": {"2": {"frames": ["00055", "00060", "00065"]}}},
        "othervid": {"objects": {"1": {"frames": ["00000"]}}}}}
    os.makedirs(train, exist_ok=True)
    (train / "meta.json").write_text(json.dumps(meta))
    m = np.zeros((24, 32), np.uint8)
    m[1:3, 1:3] = 2
    for fn in ("00055", "00060", "00065"):
        _img(str(train / "JPEGImages" / "0e27472bea" / f"{fn}.jpg"))
        os.makedirs(train / "Annotations" / "0e27472bea", exist_ok=True)
        imwrite_indexed(str(train / "Annotations" / "0e27472bea" / f"{fn}.png"), m)
    _img(str(train / "JPEGImages" / "othervid" / "00000.jpg"))
    # all_frames folder holds denser frames
    for fn in ("00055", "00057", "00060", "00062", "00065"):
        _img(str(root / "train_all_frames" / "JPEGImages" / "0e27472bea" / f"{fn}.jpg"))
    spec_dir = tmp_path / "specs"
    os.makedirs(spec_dir)
    (spec_dir / "youtubevos_jjvalid.txt").write_text("0e27472bea\n")
    _reset_env(tmp_path, youtubevos_dir=tmp_path / "ytvos")
    os.environ["PYTRACKING_TPU_DATA_SPECS_PATH"] = str(spec_dir)
    try:
        from pytracking_tpu.evaluation.adapters.youtubevos import YouTubeVOSDataset
        # jjvalid + cleanup=['starts']: only the spec'd sequence, init at 00065
        seqs = YouTubeVOSDataset(version="2019", split="jjvalid",
                                 cleanup=["starts"]).get_sequence_list()
        assert [s.name for s in seqs] == ["0e27472bea"]
        assert list(seqs[0].init_data.keys()) == [2]   # index of 00065
        # all_frames: frames come from the _all_frames folder (5 frames)
        seqs = YouTubeVOSDataset(version="2019", split="jjvalid", all_frames=True,
                                 cleanup=["starts"]).get_sequence_list()
        assert len(seqs[0].frames) == 5
        assert "train_all_frames" in seqs[0].frames[0]
        # init frame index shifts accordingly (00065 is index 4 of 5)
        assert list(seqs[0].init_data.keys()) == [4]
    finally:
        del os.environ["PYTRACKING_TPU_DATA_SPECS_PATH"]
