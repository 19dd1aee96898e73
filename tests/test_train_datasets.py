"""Training dataset readers over fabricated mini trees (reference
ltr/dataset/{vos_base,davis,synthetic_video_blend,ecssd,imagenetvid,
lasot_candidate_matching,tao_burst}.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _img(path, w=48, h=40, val=60):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((h, w, 3), val, np.uint8)).save(path)


def _indexed_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    from pytracking_tpu.utils.png_io import imwrite_indexed
    imwrite_indexed(path, arr.astype(np.uint8))


def _davis_tree(tmp_path):
    root = tmp_path / "davis"
    for t in range(4):
        _img(str(root / "JPEGImages" / "480p" / "seqA" / f"{t:05d}.jpg"))
        m = np.zeros((40, 48), np.uint8)
        m[10 + t:20 + t, 12:24] = 1
        m[25:35, 30:40] = 2
        _indexed_png(str(root / "Annotations" / "480p" / "seqA" / f"{t:05d}.png"), m)
    os.makedirs(root / "ImageSets" / "2017", exist_ok=True)
    with open(root / "ImageSets" / "2017" / "train.txt", "w") as f:
        f.write("seqA\n")
    return root


def test_davis_reader(tmp_path):
    from pytracking_tpu.training.datasets.vos_base import Davis

    ds = Davis(str(_davis_tree(tmp_path)))
    assert ds.get_num_sequences() == 2          # one per object id
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (4, 4)
    assert info["visible"].all()
    frames, anno, _ = ds.get_frames(0, [0, 2], info)
    assert len(frames) == 2
    assert anno["mask"][0].shape == (40, 48)
    assert anno["mask"][0].max() == 1.0
    # object 1 box tracks the moving square
    assert anno["bbox"][1][1] == info["bbox"][2][1]


def test_seg_image_dataset_and_blend(tmp_path):
    from pytracking_tpu.training.datasets.seg_images import ECSSD
    from pytracking_tpu.training.datasets.synthetic_video_blend import \
        SyntheticVideoBlend

    root = tmp_path / "ecssd"
    for i in range(2):
        _img(str(root / "images" / f"{i:04d}.jpg"), val=200)
        m = np.zeros((40, 48), np.uint8)
        m[8:30, 10:40] = 255
        os.makedirs(root / "ground_truth_mask", exist_ok=True)
        Image.fromarray(m).save(root / "ground_truth_mask" / f"{i:04d}.png")
    fg = ECSSD(str(root))
    assert fg.get_num_sequences() == 2
    info = fg.get_sequence_info(0)
    assert info["bbox"][0][2] == 30 and info["bbox"][0][3] == 22

    blend = SyntheticVideoBlend(fg, fg, seq_len=5)
    assert blend.is_video_sequence()
    frames, anno, _ = blend.get_frames(0, [0, 1, 4])
    assert len(frames) == 3
    assert anno["mask"][0].sum() > 0
    bb = anno["bbox"][0]
    assert bb[2] > 0 and bb[3] > 0


def test_candidate_matching_dataset_and_sampler(tmp_path):
    from pytracking_tpu.evaluation.adapters.synthetic import SyntheticDataset
    from pytracking_tpu.training.datasets.candidate_matching import (
        CandidateMatchingDataset, CandidateMatchingSampler)

    eval_ds = SyntheticDataset(num_sequences=1, num_frames=6).get_sequence_list()
    dump = {eval_ds[0].name: {
        str(i): {"coords": [[20.0, 30.0], [10.0, 15.0]], "scores": [0.9, 0.4],
                 "state": "target_with_distractors", "match_idx": 0,
                 "anno": [28, 18, 6, 6]} for i in range(1, 6)}}
    p = tmp_path / "dump.json"
    with open(p, "w") as f:
        json.dump(dump, f)

    ds = CandidateMatchingDataset(eval_ds, str(p))
    assert ds.get_num_sequences() == 1
    states = ds.get_frame_states()
    assert len(states["target_with_distractors"]) == 5

    sampler = CandidateMatchingSampler(ds, samples_per_epoch=4, K=4)
    s = sampler[0]
    assert s["img0"].ndim == 3
    assert s["gt_assignment"].shape == (4, 4)
    assert s["gt_matches0"].shape == (4,)
    # at least the matched candidate must be consistent
    m = s["gt_assignment"]
    assert m.sum() >= 1


def test_tao_burst_reader(tmp_path):
    from pytracking_tpu.training.datasets.tao_burst import TAOBURST

    root = tmp_path / "tao"
    anno = {"vid1": {
        "split": "train", "dataset_name": "ds", "seq_name": "s1",
        "annotated_image_paths": ["f0.jpg", "f1.jpg"],
        "track_ids": [1, 2],
        "annotations": [{"1": [1, 2, 3, 4], "2": [5, 6, 7, 8]},
                        {"1": [2, 3, 3, 4]}],
    }}
    os.makedirs(root, exist_ok=True)
    with open(root / "TaoBurst.json", "w") as f:
        json.dump(anno, f)
    for fn in ("f0.jpg", "f1.jpg"):
        _img(str(root / "annotated_frames" / "train" / "ds" / "s1" / fn))

    multi = TAOBURST(str(root), multiobj=True)
    assert multi.get_num_sequences() == 1
    assert multi.get_sequence_info(0)["num_tracks"] == 2

    single = TAOBURST(str(root), multiobj=False)
    assert single.get_num_sequences() == 2
    info = single.get_sequence_info(1)    # track "2": missing in frame 1
    assert bool(info["valid"][0]) and not bool(info["valid"][1])
    frames, anno2, _ = single.get_frames(0, [0, 1], info)
    assert len(frames) == 2


def test_coco_seq_polygon_mask(tmp_path):
    from pytracking_tpu.training.datasets.coco_seq import MSCOCOSeq

    root = tmp_path / "coco"
    os.makedirs(root / "annotations", exist_ok=True)
    _img(str(root / "train2017" / "img1.jpg"))
    data = {"images": [{"id": 1, "file_name": "img1.jpg"}],
            "annotations": [{"id": 10, "image_id": 1, "bbox": [5, 5, 20, 20],
                             "category_id": 1, "iscrowd": 0,
                             "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]]}],
            "categories": [{"id": 1, "name": "thing"}]}
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(data, f)
    ds = MSCOCOSeq(str(root))
    frames, anno, meta = ds.get_frames(0, [0])
    assert anno["mask"][0].sum() > 300          # ~21x21 square
    assert meta["object_class_name"] == "thing"


def test_coco_mot_seq(tmp_path):
    from pytracking_tpu.training.datasets.mot_datasets import MSCOCOMOTSeq

    root = tmp_path / "coco2"
    os.makedirs(root / "annotations", exist_ok=True)
    _img(str(root / "train2017" / "img1.jpg"))
    data = {"images": [{"id": 1, "file_name": "img1.jpg"}],
            "annotations": [
                {"id": 10, "image_id": 1, "bbox": [5, 5, 20, 20],
                 "category_id": 1, "iscrowd": 0},
                {"id": 11, "image_id": 1, "bbox": [25, 10, 15, 15],
                 "category_id": 2, "iscrowd": 0}],
            "categories": []}
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(data, f)
    ds = MSCOCOMOTSeq(str(root))
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    assert info["num_tracks"] == 2
    frames, anno, _ = ds.get_frames(0, [0])
    assert set(anno["bbox"][0].keys()) == {"0", "1"}


def _write_got10k_tree(root, n=4):
    import numpy as np
    names = []
    for i in range(n):
        name = f"GOT-10k_Train_{i:06d}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        np.savetxt(os.path.join(d, "groundtruth.txt"),
                   np.tile([10.0, 10.0, 20.0, 20.0], (3, 1)), delimiter=",")
        names.append(name)
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


def test_got10k_split_files(tmp_path, monkeypatch):
    """Reference-format data-spec splits (ltr/dataset/got10k.py:46-62): the
    split file holds integer indices into list.txt."""
    from pytracking_tpu.training.datasets.got10k import Got10k

    root = str(tmp_path / "got10k")
    names = _write_got10k_tree(root, n=4)
    specs = tmp_path / "specs"
    specs.mkdir()
    (specs / "got10k_vot_train_split.txt").write_text("2\n0\n")
    monkeypatch.setenv("PYTRACKING_TPU_DATA_SPECS_PATH", str(specs))

    ds = Got10k(root, split="vottrain")
    assert ds.sequence_list == [names[2], names[0]]
    ds_ids = Got10k(root, seq_ids=[1, 3])
    assert ds_ids.sequence_list == [names[1], names[3]]
    with pytest.raises(ValueError):
        Got10k(root, split="vottrain", seq_ids=[0])
    # missing spec -> actionable error naming the searched directories
    monkeypatch.delenv("PYTRACKING_TPU_DATA_SPECS_PATH")
    with pytest.raises(FileNotFoundError, match="data_specs"):
        Got10k(root, split="val")


def test_lasot_train_split_file(tmp_path, monkeypatch):
    """LaSOT protocol-II train split: 'class-id' names resolved to class
    subdirectories (reference lasot.py:52-60)."""
    import numpy as np

    from pytracking_tpu.training.datasets.lasot import Lasot

    root = tmp_path / "lasot"
    for name in ("airplane-1", "airplane-2", "bird-1"):
        cls = name.split("-")[0]
        d = root / cls / name / "img"
        d.mkdir(parents=True)
        np.savetxt(str(root / cls / name / "groundtruth.txt"),
                   np.tile([5.0, 5.0, 10.0, 10.0], (2, 1)), delimiter=",")
    specs = tmp_path / "specs"
    specs.mkdir()
    (specs / "lasot_train_split.txt").write_text("airplane-2\nbird-1\n")
    monkeypatch.setenv("PYTRACKING_TPU_DATA_SPECS_PATH", str(specs))

    ds = Lasot(str(root), split="train")
    assert ds.sequence_list == [os.path.join("airplane", "airplane-2"),
                                os.path.join("bird", "bird-1")]
