"""Round-trip tests: preprocessing on synthetic raw data -> pickles that the
HybridDataset loader consumes."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from snipper_tpu.config import Config
from snipper_tpu.data.datasets import HybridDataset
from snipper_tpu.data.preprocess import jta as jta_pp
from snipper_tpu.data.preprocess import mscoco as coco_pp
from snipper_tpu.data.preprocess import posetrack as pt_pp

CFG = Config.tiny()


def _img(path, w=120, h=90):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def test_posetrack_extract_fillin_load(tmp_path):
    root = tmp_path / "posetrack"
    ann_dir = root / "annotations" / "train"
    os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    # labeled frames 0..9 then a gap, then 13..19
    frame_ids = list(range(10)) + list(range(13, 20))
    for i in frame_ids:
        fn = f"images/train/000001_x/{i:06d}.jpg"
        _img(str(root / fn))
        img_id = 1000 + i
        images.append({"id": img_id, "file_name": fn, "is_labeled": True})
        for pid in (0, 1):
            k = rng.uniform(10, 80, (17, 3))
            k[:, 2] = 1
            annotations.append({
                "image_id": img_id, "track_id": pid, "category_id": 1,
                "id": img_id * 100 + pid,
                "keypoints": k.reshape(-1).tolist(),
                "bbox": [10, 10, 40, 60], "bbox_head": [10, 10, 10, 10]})
    with open(ann_dir / "000001_x.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1}]}, f)

    data = pt_pp.extract(str(root), str(root), "train")
    assert len(data["000001_x.json"]) == len(frame_ids)
    filled = pt_pp.fillin(str(root), "train")
    assert len(filled["000001_x.json"]) == 20  # gap frames inserted
    # 18 joints after root augmentation
    assert filled["000001_x.json"][0]["kpts2d"].shape[1] == 18

    # loader consumes it (needs val.pkl too for mode=val; train is enough)
    ds = HybridDataset(CFG, mode="train", posetrack_dir=str(root))
    assert len(ds) > 0
    s = ds[0]
    assert s["targets"]["valid"].sum() == 2


def test_coco_extract_load(tmp_path):
    root = tmp_path / "coco"
    os.makedirs(root / "annotations")
    rng = np.random.default_rng(1)
    images, annotations = [], []
    for i in range(2):
        fn = f"{i:012d}.jpg"
        _img(str(root / "train2017" / fn), w=200, h=150)
        images.append({"id": i, "file_name": fn})
        for a in range(2):
            k = rng.uniform(20, 140, (17, 3))
            k[:, 2] = 2  # COCO vis flag in {0,1,2}
            annotations.append({
                "image_id": i, "category_id": 1, "id": i * 10 + a,
                "keypoints": k.reshape(-1).tolist(),
                "bbox": [5, 5, 100, 100], "num_keypoints": 17})
    with open(root / "annotations" / "person_keypoints_train2017.json",
              "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    recs = coco_pp.extract(str(root), str(root), "train")
    assert len(recs) == 2
    assert recs[0]["kpts2d"].shape == (2, 15, 3)

    ds = HybridDataset(CFG, mode="train", coco_dir=str(root))
    s = ds[0]
    assert s["targets"]["dataset"] == "coco"
    assert s["targets"]["valid"].sum() == 2


def test_jta_split_and_listing(tmp_path):
    root = tmp_path / "jta"
    os.makedirs(root / "annotations" / "train")
    rng = np.random.default_rng(2)
    rows = []
    for frame in range(1, 11):          # raw frames are 1-based
        for pid in (3, 5):
            for j in range(22):
                rows.append([frame, pid, j,
                             *rng.uniform(0, 100, 2).tolist(),
                             *rng.uniform(-2, 5, 3).tolist(), 0, 0])
    with open(root / "annotations" / "train" / "seq_1.json", "w") as f:
        json.dump(rows, f)

    jta_pp.split_annotations(str(root), str(root), n_frames=10)
    ann0 = json.load(open(root / "ann_split" / "train" / "seq_1" /
                          "000.json"))
    assert set(ann0.keys()) == {"3", "5"}
    assert len(ann0["3"][0]) == 44      # 22 joints x 2

    (root / "moving_camera_seq.txt").write_text("")
    listing = jta_pp.prepare_listing(str(root), str(root))
    assert len(listing["train"]["seq_1"]) == 10


def test_jta_listing_requires_exclusion_list(tmp_path):
    """prepare_listing is NAMED no_moving_camera: silently proceeding
    without the 99-sequence exclusion list would label moving-camera-
    contaminated data as clean — a missing list must raise."""
    import os

    import pytest

    root = tmp_path / "jta"
    os.makedirs(root / "ann_split" / "train" / "seq_1")
    with pytest.raises(FileNotFoundError, match="moving_camera_seq"):
        jta_pp.prepare_listing(str(root), str(root))
    # explicit opt-out still works without the list
    listing = jta_pp.prepare_listing(str(root), str(root),
                                     exclude_moving_camera=False)
    assert "train" in listing


def test_jta_extract_frames_cv2_fallback(tmp_path):
    """Video -> half-res JPEG frames without the ffmpeg binary (absent in
    this image): the cv2 VideoCapture fallback is the reference's own
    mechanism (jta.py:11-60)."""
    import numpy as np

    cv2 = pytest.importorskip("cv2")
    os.makedirs(tmp_path / "videos" / "train")
    vw = cv2.VideoWriter(str(tmp_path / "videos" / "train" / "seq_1.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    if not vw.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    rng = np.random.default_rng(0)
    for _ in range(5):
        vw.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    vw.release()

    jta_pp.extract_frames(str(tmp_path), str(tmp_path))
    out = sorted(os.listdir(tmp_path / "images_half" / "train" / "seq_1"))
    assert out == [f"{i:03d}.jpg" for i in range(5)]
    img = cv2.imread(str(tmp_path / "images_half" / "train" / "seq_1" /
                         "000.jpg"))
    assert img.shape == (24, 32, 3)   # half resolution
