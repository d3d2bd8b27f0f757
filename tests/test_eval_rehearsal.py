"""End-to-end eval rehearsal on reference-format FILES (VERDICT r2 #5).

The accuracy-parity harnesses were previously verified only on goldens and
in-memory fixtures; this test runs the reference's FULL final-eval flow
(reference ``eval.py:198-271``, ``engine.py:354-511``,
``datasets/poseval_old/evaluate.py:14-54``) on disk:

  raw PoseTrack18 annotation JSONs + frames
      -> data.preprocess.posetrack.extract  (val.pkl)
  raw MuPoTS-style JSON + frames
      -> data.preprocess.mupots.extract     (MuPoTS-3D.pkl)
      -> HybridDataset val loader
      -> cli.eval main()  (model forward, criterion match, PostProcess)
      -> posetrack result writer (per-video JSONs)
      -> PoseTrack AP / PCKh / MOTA harness  +  3D MPJPE / 3DPCK stats
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

K17 = 17  # raw PoseTrack keypoints (root joint is synthesized at load)


def _img(path, w=160, h=120):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(abs(hash(path)) % 2 ** 31)
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                    ).save(path)


def _posetrack_raw(root, video="000001_x", n_frames=16):
    """Reference-format PoseTrack18 val annotations + frames."""
    rng = np.random.default_rng(3)
    images, annotations = [], []
    base = {0: rng.uniform(20, 60, (K17, 2)),
            1: rng.uniform(80, 140, (K17, 2))}
    for i in range(n_frames):
        fn = f"images/val/{video}/{i:06d}.jpg"
        _img(str(root / fn))
        images.append({"id": 1000 + i, "file_name": fn, "is_labeled": True,
                       "vid_id": video, "frame_id": i})
        for tid in (0, 1):
            k = np.concatenate(
                [base[tid] + rng.uniform(-2, 2, (K17, 2)),
                 np.ones((K17, 1))], 1)
            annotations.append({
                "image_id": 1000 + i,
                "keypoints": k.reshape(-1).tolist(),
                "track_id": tid,
                "bbox": [10.0 + 60 * tid, 10.0, 50.0, 80.0],
                "bbox_head": [15.0 + 60 * tid, 10.0, 20.0, 20.0],
            })
    ann_dir = root / "annotations" / "val"
    os.makedirs(ann_dir, exist_ok=True)
    with open(ann_dir / f"{video}.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return str(ann_dir)


def _mupots_raw(root, n_frames=40):
    rng = np.random.default_rng(4)
    images, annotations = [], []
    for i in range(n_frames):
        fn = f"TS1/img_{i:06d}.jpg"
        _img(str(root / "MuPoTS-3D_images" / fn))
        images.append({"id": i, "file_name": fn, "width": 160, "height": 120,
                       "intrinsic": [100.0, 100.0, 80.0, 60.0]})
        for a in range(2):
            k2 = rng.uniform(10, 150, (21, 2))
            k3 = np.concatenate([rng.uniform(-500, 500, (21, 2)),
                                 rng.uniform(2000, 8000, (21, 1))], 1)
            annotations.append({
                "image_id": i, "keypoints_img": k2.tolist(),
                "keypoints_cam": k3.tolist(),
                "keypoints_vis": [1.0] * 21,
                "bbox": [10, 10, 50, 80]})
    with open(root / "MuPoTS-3D.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)


def _coco_raw(root, n_images=3):
    """Reference-format COCO person_keypoints_val2017 annotations + images.
    Hips and shoulders visible so the root/neck synthesis works."""
    rng = np.random.default_rng(5)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        fn = f"{i:012d}.jpg"
        _img(str(root / "val2017" / fn))
        images.append({"id": 100 + i, "file_name": fn,
                       "width": 160, "height": 120})
        for _ in range(2):
            k = np.concatenate([rng.uniform(20, 140, (17, 2)),
                                np.full((17, 1), 2.0)], 1)
            annotations.append({
                "image_id": 100 + i, "id": aid, "category_id": 1,
                "keypoints": k.reshape(-1).tolist(), "num_keypoints": 17,
                "bbox": [20.0, 20.0, 60.0, 80.0], "area": 4800.0,
                "iscrowd": 0})
            aid += 1
    os.makedirs(root / "annotations", exist_ok=True)
    gt_json = str(root / "annotations" / "person_keypoints_val2017.json")
    with open(gt_json, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return gt_json


def test_full_eval_flow_on_reference_format_files(tmp_path, monkeypatch):
    from snipper_tpu.data.preprocess import mscoco as mscoco_pp
    from snipper_tpu.data.preprocess import mupots as mupots_pp
    from snipper_tpu.data.preprocess import posetrack as posetrack_pp

    pt_root = tmp_path / "posetrack"
    os.makedirs(pt_root)
    gt_dir = _posetrack_raw(pt_root)
    posetrack_pp.extract(str(pt_root), str(pt_root), subset="val")
    assert os.path.exists(pt_root / "val.pkl")

    mp_root = tmp_path / "mupots"
    os.makedirs(mp_root)
    _mupots_raw(mp_root)
    mupots_pp.extract(str(mp_root), str(mp_root))
    assert os.path.exists(mp_root / "MuPoTS-3D.pkl")

    coco_root = tmp_path / "coco"
    os.makedirs(coco_root)
    coco_gt = _coco_raw(coco_root)
    mscoco_pp.extract(str(coco_root), str(coco_root), subset="val")
    assert os.path.exists(coco_root / "coco_val.pkl")

    out = str(tmp_path / "out")
    from snipper_tpu.cli import eval as eval_cli

    monkeypatch.setattr(sys, "argv", [
        "eval", "--preset", "tiny",
        "--posetrack_dir", str(pt_root),
        "--muco_dir", str(mp_root),
        "--coco_dir", str(coco_root), "--coco_gt_json", coco_gt,
        "--write_posetrack", "--posetrack_gt_dir", gt_dir,
        "--save_vis", "--output_dir", out])
    eval_cli.main()

    # 3D stats (MuPoTS) + 2D PCKh (PoseTrack) computed and finite
    stats = json.load(open(os.path.join(out, "eval_stats.json")))
    for key in ("mpjpe_root", "mpjpe_joint", "pel_mpjpe_joint", "3dpck",
                "pckh_root", "pckh_joint"):
        assert key in stats and np.isfinite(stats[key]), (key, stats)
    # harness numbers made it into the stats file: PoseTrack AP/MOTA/PCKh
    # tables and the COCO OKS summary (random model -> values near 0; the
    # assertion is that the full disk flow produced them)
    for key in ("posetrack_ap_ap", "posetrack_tracking_mota",
                "posetrack_pckh_pckh", "coco_AP"):
        assert any(k.startswith(key) for k in stats), (key, sorted(stats))

    # writer produced the per-video prediction JSON the harness consumed
    pred = os.path.join(out, "posetrack_results", "000001_x.json")
    assert os.path.exists(pred)
    data = json.load(open(pred))
    assert data["annotations"], "writer emitted no predictions"
    assert len(data["annotations"][0]["keypoints"]) == K17 * 3

    # eval visuals written
    vis = os.listdir(os.path.join(out, "eval_vis"))
    assert any(v.endswith(".jpg") for v in vis)


def test_posetrack_harness_numbers_on_rehearsal_files(tmp_path):
    """Drive the harness alone with predictions == GT written through the
    REAL writer schema: AP/PCKh/MOTA must be exactly 100 (validates the
    disk round-trip, not the random model)."""
    from snipper_tpu.eval.posetrack_eval import evaluate_posetrack18

    pt_root = tmp_path / "pt"
    os.makedirs(pt_root)
    gt_dir = _posetrack_raw(pt_root, n_frames=6)
    # predictions: copy GT annotations, add per-keypoint scores
    pred_dir = str(tmp_path / "pred")
    os.makedirs(pred_dir)
    gt = json.load(open(os.path.join(gt_dir, "000001_x.json")))
    pred = {"images": gt["images"], "categories": gt["categories"],
            "annotations": []}
    for a in gt["annotations"]:
        k = np.asarray(a["keypoints"], np.float64).reshape(-1, 3)
        k[:, 2] = 0.9
        pred["annotations"].append({**a,
                                    "keypoints": k.reshape(-1).tolist(),
                                    "scores": k[:, 2].tolist()})
    with open(os.path.join(pred_dir, "000001_x.json"), "w") as f:
        json.dump(pred, f)

    res = evaluate_posetrack18(gt_dir, pred_dir)
    assert abs(res["ap"]["ap"][-1] - 100.0) < 1e-6
    assert abs(res["pckh"]["pckh"][-1] - 100.0) < 1e-6
    assert abs(res["tracking"]["mota"][-1] - 100.0) < 1e-6
