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


# ---------------------------------------------------------------------------
# CMU-Panoptic realism: real HD-camera calibration magnitudes, cv2 oracle,
# protocol-2 camera splits (VERDICT round-1 items)
# ---------------------------------------------------------------------------
HD_K = [[1396.15, 0.0, 951.0], [0.0, 1392.36, 559.5], [0.0, 0.0, 1.0]]
HD_DIST = [-0.2209, 0.1892, 7.7e-4, 9.7e-4, -0.0593]
HD_INTR = np.array([1396.15, 1392.36, 951.0, 559.5])


def _hd_points(n=1500, seed=0):
    """Camera-space points whose pinhole projection covers 1920x1080,
    depths 2-5 m (mm, as the panoptic getter uses)."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(2000.0, 5000.0, n)
    u = rng.uniform(30, 1890, n)
    v = rng.uniform(30, 1050, n)
    x = (u - HD_INTR[2]) / HD_INTR[0] * z
    y = (v - HD_INTR[3]) / HD_INTR[1] * z
    return np.stack([x, y, z], -1)


def test_camera_projection_matches_cv2_realistic_calib():
    """project() vs cv2.projectPoints with real CMU HD magnitudes."""
    import cv2

    from snipper_tpu.data.camera import project

    xyz = _hd_points()
    got = project(xyz, HD_INTR, np.asarray(HD_DIST))
    want, _ = cv2.projectPoints(
        xyz.reshape(-1, 1, 3), np.zeros(3), np.zeros(3),
        np.asarray(HD_K), np.asarray(HD_DIST))
    np.testing.assert_allclose(got[:, :2], want.reshape(-1, 2),
                               rtol=0, atol=1e-6)


def test_camera_unproject_roundtrip_realistic_calib():
    """Iterative inverse round-trips to <0.01 px at full HD resolution;
    the reference's first-order inverse (default) is ~1 px median with
    a documented multi-px worst case at the border."""
    from snipper_tpu.data.camera import project, unproject

    xyz = _hd_points(seed=1)
    uvd = project(xyz, HD_INTR, np.asarray(HD_DIST))

    exact = unproject(uvd, HD_INTR, np.asarray(HD_DIST), iterations=8)
    reproj = project(exact, HD_INTR, np.asarray(HD_DIST))
    err_px = np.linalg.norm((reproj - uvd)[:, :2], axis=-1)
    assert err_px.max() < 1e-2
    np.testing.assert_allclose(exact, xyz, rtol=1e-5, atol=1e-2)

    approx = unproject(uvd, HD_INTR, np.asarray(HD_DIST))
    reproj1 = project(approx, HD_INTR, np.asarray(HD_DIST))
    err1 = np.linalg.norm((reproj1 - uvd)[:, :2], axis=-1)
    assert np.median(err1) < 1.5      # reference first-order quality
    assert err1.max() < 8.0


def test_panoptic_protocol2_realistic_calib(tmp_path):
    """Protocol-2 fixture with real calibration values: cameras 16/30 are
    the test split (reference hybrid_dataloader.py:1577-1620), images at
    half HD resolution, and the getter's projected keypoints agree with a
    direct cv2-oracle projection at half-res intrinsics to <1e-4
    (normalized)."""
    import cv2

    root = tmp_path / "pan2"
    seq = "160224_haggling1"
    os.makedirs(root / seq / "hdPose3d_stage1")
    rng = np.random.default_rng(5)

    def rot_z(deg):
        c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
        return [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]

    cam_nodes = (5, 16, 30)
    calib = {"cameras": [
        {"panel": 0, "node": n, "K": HD_K, "distCoef": HD_DIST,
         "R": rot_z(2.0 * i), "t": [[5.0 * i], [-3.0 * i], [300.0]]}
        for i, n in enumerate(cam_nodes)]}
    with open(root / seq / f"calibration_{seq}.json", "w") as f:
        json.dump(calib, f)

    n_frames = 40
    for i in range(n_frames):
        bodies = []
        for pid in (0, 1):
            # studio-space (cm): near the origin so every camera sees them
            skel = np.concatenate(
                [rng.uniform(-60, 60, (19, 2)),
                 rng.uniform(-40, 40, (19, 1)),
                 np.ones((19, 1))], 1)
            bodies.append({"id": pid, "joints19": skel.reshape(-1).tolist()})
        with open(root / seq / "hdPose3d_stage1" /
                  f"body3DScene_{i:08d}.json", "w") as f:
            json.dump({"bodies": bodies}, f)

    pan_pp.prepare(str(root), protocol=2)
    assert os.path.exists(root / "panoptic_all_ann_files_protocol2.pkl")

    cfg = CFG.replace(input_height=540, input_width=960)
    for cam in cam_nodes:
        for i in range(n_frames):
            _img(str(root / seq / "hdImgs" / f"hd_00_{cam:02d}" /
                     f"{i:08d}.jpg"), w=960, h=540)

    # protocol 2: cams 16/30 are TEST; cam 5 is TRAIN
    ds_val = HybridDataset(cfg, mode="val", panoptic_dir=str(root),
                           panoptic_protocol=2)
    val_cams = {s[2] for s in ds_val.samples}
    assert val_cams == {16, 30}
    ds_tr = HybridDataset(cfg, mode="train", panoptic_dir=str(root),
                          panoptic_protocol=2)
    assert {s[2] for s in ds_tr.samples} == {5}

    s = ds_val[0]
    t = s["targets"]
    assert t["dataset"] == "panoptic"
    assert s["images"].shape == (cfg.num_frames, 540, 960, 3)
    assert t["valid"].sum() == 2

    # oracle: re-project the first frame's GT with cv2 at half-res intrinsics
    sample = ds_val.samples[0]
    _, seq_name, cam_idx, frame_idx, index = sample
    data = ds_val.panoptic_data
    cam = data[f"{seq_name}-cam{cam_idx:02d}"]
    pose = np.asarray(data[f"{seq_name}-poses"][index][1])  # [n, 15, 4] cm
    p3_mm = 10.0 * (pose[..., :3] @ np.asarray(cam["R"]).T
                    + np.asarray(cam["t"]).reshape(1, 1, 3))
    K_half = np.asarray(HD_K).copy()
    K_half[:2] *= 0.5
    want, _ = cv2.projectPoints(p3_mm.reshape(-1, 1, 3), np.zeros(3),
                                np.zeros(3), K_half, np.asarray(HD_DIST))
    want = want.reshape(pose.shape[0], 15, 2) / np.array([960.0, 540.0])
    got = np.asarray(t["kpts2d"])[: pose.shape[0], 0, :, 0:2]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_mupots_track_ids_restart_per_sequence(tmp_path):
    """Track-id assignment resets to 0..n-1 at every sequence boundary
    (reference mupots.py:109-115) — a global counter would inflate the
    per-sample trajectory arrays for late sequences and break pkl id
    compatibility."""
    root = tmp_path / "mupots"
    os.makedirs(root)
    rng = np.random.default_rng(2)
    a = _muco_style_json(5, "TS1", intrinsic=True, rng=rng)
    b = _muco_style_json(5, "TS2", intrinsic=True, rng=rng)
    offset = len(a["images"])
    for img in b["images"]:
        img["id"] += offset
    for ann in b["annotations"]:
        ann["image_id"] += offset
    data = {"images": a["images"] + b["images"],
            "annotations": a["annotations"] + b["annotations"]}
    with open(root / "MuPoTS-3D.json", "w") as f:
        json.dump(data, f)
    out = mupots_pp.extract(str(root), str(root))
    # first frame of each sequence: ids restart at exactly 0..n-1
    assert sorted(out[0]["track_ids"].tolist()) == [0, 1]
    assert sorted(out[offset]["track_ids"].tolist()) == [0, 1]
