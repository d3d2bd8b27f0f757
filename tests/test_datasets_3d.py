"""End-to-end fixture tests for the 3D dataset sources: MuCo, MuPoTS,
CMU-Panoptic (preprocess -> pickle -> HybridDataset sample)."""

import json
import os
import pickle

import numpy as np
from PIL import Image

from snipper_tpu.config import Config
from snipper_tpu.data.datasets import HybridDataset
from snipper_tpu.data.preprocess import cmu_panoptic as pan_pp
from snipper_tpu.data.preprocess import muco as muco_pp
from snipper_tpu.data.preprocess import mupots as mupots_pp

CFG = Config.tiny()
T1 = CFG.total_frames


def _img(path, w=160, h=120):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(abs(hash(path)) % 2 ** 31)
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(path)


def _muco_style_json(n_images, prefix, intrinsic=False, rng=None):
    rng = rng or np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n_images):
        fn = f"{prefix}/img_{i:06d}.jpg"
        img = {"id": i, "file_name": fn, "width": 160, "height": 120}
        if intrinsic:
            img["intrinsic"] = [100.0, 100.0, 80.0, 60.0]
        images.append(img)
        for a in range(2):
            k2 = rng.uniform(10, 150, (21, 2))
            k3 = np.concatenate([rng.uniform(-500, 500, (21, 2)),
                                 rng.uniform(2000, 8000, (21, 1))], 1)
            annotations.append({
                "image_id": i, "keypoints_img": k2.tolist(),
                "keypoints_cam": k3.tolist(),
                "keypoints_vis": [1.0] * 21,
                "bbox": [10, 10, 50, 80]})
    return {"images": images, "annotations": annotations}


def test_muco_extract_and_load(tmp_path):
    root = tmp_path / "muco"
    os.makedirs(root)
    data = _muco_style_json(3, "augmented_set")
    with open(root / "MuCo-3DHP.json", "w") as f:
        json.dump(data, f)
    for img in data["images"]:
        _img(str(root / img["file_name"]))

    out = muco_pp.extract(str(root), str(root))
    assert len(out) == 3
    assert out[0]["kpts2d"].shape == (2, 15, 3)

    ds = HybridDataset(CFG, mode="train", muco_dir=str(root))
    s = ds[0]
    t = s["targets"]
    assert t["dataset"] == "muco"
    assert t["valid"].sum() == 2
    # fake-motion frames differ
    assert not np.allclose(s["images"][0], s["images"][1])
    # depth normalized and flagged
    d = t["depth"][t["valid"]]
    assert np.all(d[..., 1] == 1.0)
    assert d[..., 0].max() <= 8000 / 1000 / CFG.max_depth + 1e-6


def test_mupots_extract_track_and_load(tmp_path):
    root = tmp_path / "mupots"
    os.makedirs(root)
    rng = np.random.default_rng(1)
    data = _muco_style_json(40, "TS1", intrinsic=True, rng=rng)
    with open(root / "MuPoTS-3D.json", "w") as f:
        json.dump(data, f)
    for img in data["images"]:
        _img(str(root / "MuPoTS-3D_images" / img["file_name"]))

    out = mupots_pp.extract(str(root), str(root))
    # greedy tracking assigned consistent ids
    assert "track_ids" in out[0]
    assert len(out[0]["track_ids"]) == 2

    ds = HybridDataset(CFG, mode="val", muco_dir=str(root))
    assert len(ds) > 0
    s = ds[0]
    t = s["targets"]
    assert t["dataset"] == "mupots"
    assert np.allclose(np.asarray(t["cam_intr"]), [100, 100, 80, 60])
    assert t["kpts3d"].shape == (CFG.max_persons, T1, 15, 3)


def test_panoptic_prepare_and_load(tmp_path):
    root = tmp_path / "pan"
    seq = "170221_haggling_b1"  # protocol-1 TEST sequence -> mode=val
    os.makedirs(root / seq / "hdPose3d_stage1_coco19")
    rng = np.random.default_rng(2)

    calib = {"cameras": [
        {"panel": 0, "node": n,
         "K": [[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]],
         "distCoef": [0.01, 0.0, 0.0, 0.0, 0.0],
         "R": np.eye(3).tolist(),
         "t": [[0.0], [0.0], [300.0]]} for n in (3, 12, 23)]}
    with open(root / seq / f"calibration_{seq}.json", "w") as f:
        json.dump(calib, f)

    n_frames = 40
    for i in range(n_frames):
        bodies = []
        for pid in (0, 1):
            skel = np.concatenate(
                [rng.uniform(-50, 50, (19, 2)),
                 rng.uniform(50, 150, (19, 1)),      # z in studio cm
                 np.ones((19, 1))], 1)
            bodies.append({"id": pid, "joints19": skel.reshape(-1).tolist()})
        with open(root / seq / "hdPose3d_stage1_coco19" /
                  f"body3DScene_{i:08d}.json", "w") as f:
            json.dump({"bodies": bodies}, f)

    pan_pp.prepare(str(root), protocol=1)
    assert os.path.exists(root / "panoptic_all_ann_files_protocol1.pkl")

    # images at input resolution (panoptic path does no warping)
    cfg = CFG
    for cam in (3, 12, 23):
        for i in range(n_frames):
            _img(str(root / seq / "hdImgs" / f"hd_00_{cam:02d}" /
                     f"{i:08d}.jpg"), w=cfg.input_width, h=cfg.input_height)

    ds = HybridDataset(cfg, mode="val", panoptic_dir=str(root),
                       panoptic_protocol=1)
    assert len(ds) > 0
    s = ds[0]
    t = s["targets"]
    assert t["dataset"] == "panoptic"
    assert s["images"].shape == (cfg.num_frames, cfg.input_height,
                                 cfg.input_width, 3)
    assert t["valid"].sum() == 2
    # projected keypoints are normalized coords
    vis = t["kpts2d"][..., 2] > 0
    assert vis.any()
