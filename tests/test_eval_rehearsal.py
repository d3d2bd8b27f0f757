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


def _jta_raw(raw, out, seq="seq_500", n_frames=24, subset="test",
             w=160, h=120):
    """Reference-format raw JTA sequence: the per-sequence annotation matrix
    ``[frame(1-based), person, joint, x2d, y2d, x3d, y3d, z3d, occluded,
    self_occluded]`` (reference ``datasets/data_preprocess/jta.py:146-205``)
    in ``raw``, half-res frames under the processed dir ``out`` (where the
    reference's frame extraction writes them), and the moving-camera list."""
    rng = np.random.default_rng(6)
    rows = []
    # two persons on constant-velocity tracks within the half-res frame
    # (coherent forecast GT)
    starts = {1: np.array([50.0, 40.0]), 2: np.array([110.0, 80.0])}
    vels = {1: np.array([1.5, 0.4]), 2: np.array([-1.2, 0.8])}
    zs = {1: 4.0, 2: 7.0}
    for f in range(1, n_frames + 1):
        for pid, start in starts.items():
            c = start + vels[pid] * (f - 1)
            for j in range(22):
                jitter = rng.uniform(-8, 8, 2)
                x2, y2 = c + jitter
                z = zs[pid] + 0.01 * j
                rows.append([f, pid, j, 2 * x2, 2 * y2,     # full-res px
                             0.001 * x2, 0.001 * y2, z, 0, 0])
    ann_dir = raw / "annotations" / subset
    os.makedirs(ann_dir, exist_ok=True)
    with open(ann_dir / f"{seq}.json", "w") as f:
        json.dump(rows, f)
    with open(raw / "moving_camera_seq.txt", "w") as f:
        f.write("7\n12\n")  # excluded sequences; seq_500 is not one
    for i in range(n_frames):
        _img(str(out / "images_half" / subset / seq / f"{i:03d}.jpg"),
             w=w, h=h)


def test_jta_forecast_eval_rehearsal(tmp_path, monkeypatch):
    """VERDICT r3 #2 (JTA leg): raw JTA annotation matrices (with future
    frames) on disk -> split_annotations -> prepare_listing (moving-camera
    exclusion) -> HybridDataset test loader -> cli.eval -> the forecasting
    metrics ``future_mpjpe_* / future_3dpck`` asserted from eval_stats.json
    (reference ``README.md:129-187`` JTA forecasting flow,
    ``engine.py:180-212`` future-frame metric split)."""
    from snipper_tpu.data.preprocess import jta as jta_pp

    raw = tmp_path / "jta_raw"
    out = tmp_path / "jta"
    os.makedirs(raw)
    n_frames = 24
    _jta_raw(raw, out, n_frames=n_frames)
    jta_pp.split_annotations(str(raw), str(out), n_frames=n_frames)
    assert os.path.exists(out / "ann_split" / "test" / "seq_500" /
                          "000.json")
    jta_pp.prepare_listing(
        str(out), str(out),
        moving_camera_list=str(raw / "moving_camera_seq.txt"))
    listing = json.load(open(out / "jta_all_ann_files_no_moving_camera.json"))
    assert "seq_500" in listing["test"]

    outdir = str(tmp_path / "out")
    from snipper_tpu.cli import eval as eval_cli

    monkeypatch.setattr(sys, "argv", [
        "eval", "--preset", "tiny", "--jta_dir", str(out),
        "--output_dir", outdir])
    eval_cli.main()

    stats = json.load(open(os.path.join(outdir, "eval_stats.json")))
    # current-frame 3D metrics AND the forecasting (future-frame) split
    for key in ("mpjpe_root", "mpjpe_joint", "pel_mpjpe_joint", "3dpck",
                "future_mpjpe_root", "future_mpjpe_joint",
                "future_pel_mpjpe_joint", "future_3dpck"):
        assert key in stats and np.isfinite(stats[key]), (key, stats)


def _panoptic_raw(root, seq="170221_haggling_b1", n_frames=24,
                  img_w=96, img_h=64):
    """Reference-format CMU-Panoptic protocol-1 sequence: calibration JSON,
    ``hdPose3d_stage1_coco19`` skeletons (joints19, studio cm), and
    half-res frames at the model input resolution."""
    rng = np.random.default_rng(7)
    os.makedirs(root / seq / "hdPose3d_stage1_coco19", exist_ok=True)
    calib = {"cameras": [
        {"panel": 0, "node": n,
         "K": [[2 * 0.9 * img_w, 0, img_w], [0, 2 * 0.9 * img_w, img_h],
               [0, 0, 1]],
         "distCoef": [0.01, 0.0, 0.0, 0.0, 0.0],
         "R": np.eye(3).tolist(),
         "t": [[0.0], [0.0], [300.0]]} for n in (3, 12, 23)]}
    with open(root / seq / f"calibration_{seq}.json", "w") as f:
        json.dump(calib, f)
    for i in range(n_frames):
        bodies = []
        for pid in (0, 1):
            skel = np.concatenate(
                [rng.uniform(-40, 40, (19, 2)),
                 rng.uniform(-30, 30, (19, 1)),      # z in studio cm
                 np.ones((19, 1))], 1)
            skel[:, 0] += 80 * pid - 40
            bodies.append({"id": pid, "joints19": skel.reshape(-1).tolist()})
        with open(root / seq / "hdPose3d_stage1_coco19" /
                  f"body3DScene_{i:08d}.json", "w") as f:
            json.dump({"bodies": bodies}, f)
    for cam in (3, 12, 23):
        for i in range(n_frames):
            _img(str(root / seq / "hdImgs" / f"hd_00_{cam:02d}" /
                     f"{i:08d}.jpg"), w=img_w, h=img_h)


def test_panoptic_protocol1_eval_rehearsal(tmp_path, monkeypatch):
    """VERDICT r3 #2 (Panoptic leg): raw protocol-1 calibration + studio
    skeletons + frames on disk -> cmu_panoptic.prepare -> HybridDataset val
    loader (haggling_b test split, cams 3/12/23) -> cli.eval -> the 3D
    metric set asserted from eval_stats.json (reference ``README.md:192-250``
    Panoptic flow, ``eval.py:198-271``)."""
    from snipper_tpu.data.preprocess import cmu_panoptic as pan_pp

    root = tmp_path / "pan"
    os.makedirs(root)
    _panoptic_raw(root)
    pan_pp.prepare(str(root), protocol=1)
    assert os.path.exists(root / "panoptic_all_ann_files_protocol1.pkl")

    outdir = str(tmp_path / "out")
    from snipper_tpu.cli import eval as eval_cli

    monkeypatch.setattr(sys, "argv", [
        "eval", "--preset", "tiny", "--panoptic_dir", str(root),
        "--panoptic_protocol", "1", "--output_dir", outdir])
    eval_cli.main()

    stats = json.load(open(os.path.join(outdir, "eval_stats.json")))
    for key in ("mpjpe_root", "mpjpe_joint", "pel_mpjpe_joint", "3dpck",
                "future_mpjpe_root", "future_mpjpe_joint", "future_3dpck"):
        assert key in stats and np.isfinite(stats[key]), (key, stats)


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
