"""End-to-end dataset pipeline tests on synthetic on-disk fixtures that
mimic the reference's preprocessed pickle/JSON formats."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from snipper_tpu.config import Config
from snipper_tpu.data.datasets import HybridDataset
from snipper_tpu.data.snippet import build_trajectories, transform_frame_kpts

CFG = Config.tiny()  # T=2 (+1 future), 64x96, max_persons=4
K = 15


def _save_img(path, w=128, h=96):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (h, w, 3))).astype(np.uint8)
    ).save(path)


@pytest.fixture(scope="module")
def posetrack_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("posetrack")
    n_frames = 16
    seq = []
    rng = np.random.default_rng(1)
    for i in range(n_frames):
        fn = f"images/val/000001_x/{i:06d}.jpg"
        _save_img(str(root / fn))
        kpts = rng.uniform(10, 80, (2, 18, 3))
        kpts[..., 2] = 1.0
        seq.append({
            "filename": fn,
            "kpts2d": kpts,
            "bboxes": rng.uniform(0, 50, (2, 4)),
            "track_id": np.array([0, 1]),
            "is_label": True,
        })
    for name in ("train_filled.pkl", "val.pkl"):
        with open(root / name, "wb") as f:
            pickle.dump({"000001_x": seq}, f)
    return str(root)


def test_posetrack_train_sample(posetrack_fixture):
    ds = HybridDataset(CFG, mode="train", posetrack_dir=posetrack_fixture)
    assert len(ds) > 0
    s = ds[0]
    T1 = CFG.total_frames
    assert s["images"].shape == (CFG.num_frames, CFG.input_height,
                                 CFG.input_width, 3)
    assert s["images"].dtype == np.float32
    assert 0.0 <= s["images"].min() and s["images"].max() <= 1.0
    t = s["targets"]
    assert t["kpts2d"].shape == (CFG.max_persons, T1, K, 3)
    assert t["depth"].shape == (CFG.max_persons, T1, K, 2)
    assert t["valid"].sum() == 2
    assert t["dataset"] == "posetrack"
    # kpts normalized
    vis = t["kpts2d"][..., 2] > 0
    assert np.all(t["kpts2d"][..., 0:2][vis] > -2)
    assert np.all(t["kpts2d"][..., 0:2][vis] < 3)


def test_posetrack_val_listing(posetrack_fixture):
    ds = HybridDataset(CFG, mode="val", posetrack_dir=posetrack_fixture)
    assert len(ds) > 0
    s = ds[0]
    assert s["targets"]["bbxes_head"].shape == (CFG.max_persons,
                                                CFG.total_frames, 4)


@pytest.fixture(scope="module")
def jta_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("jta")
    rng = np.random.default_rng(2)
    seq = "seq_0"
    n = 30
    ids = []
    for i in range(n):
        _save_img(str(root / "images_half" / "train" / seq / f"{i:03d}.jpg"),
                  w=160, h=90)
        ann = {}
        for pid in (3, 7):
            k2 = rng.uniform(20, 150, (22, 2)).tolist()
            k3 = np.concatenate(
                [rng.uniform(-2, 2, (22, 2)),
                 rng.uniform(3, 8, (22, 1))], 1).tolist()
            occ = np.zeros((22, 2)).tolist()
            ann[str(pid)] = [k2, k3, occ]
        p = root / "ann_split" / "train" / seq / f"{i:03d}.json"
        os.makedirs(p.parent, exist_ok=True)
        with open(p, "w") as f:
            json.dump(ann, f)
        ids.append(i)
    with open(root / "jta_all_ann_files_no_moving_camera.json", "w") as f:
        json.dump({"train": {seq: ids}, "test": {seq: ids}}, f)
    return str(root)


def test_jta_sample(jta_fixture):
    ds = HybridDataset(CFG, mode="train", jta_dir=jta_fixture)
    assert len(ds) > 0
    s = ds[0]
    t = s["targets"]
    assert t["dataset"] == "jta"
    assert t["valid"].sum() >= 1
    # depth normalized by max_depth and flagged existent
    d = t["depth"][t["valid"]]
    assert np.all(d[..., 0] <= 1.0) and np.all(d[..., 0] >= 0.0)
    assert t["kpts3d"].shape == (CFG.max_persons, CFG.total_frames, K, 3)
    assert np.allclose(np.asarray(t["cam_intr"]),
                       np.array([1158, 1158, 960, 540]) / 2)


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.default_rng(3)
    recs = []
    for i in range(2):
        fn = f"train2017/{i:012d}.jpg"
        _save_img(str(root / fn), w=200, h=150)
        kpts = rng.uniform(10, 140, (3, 19, 3))
        kpts[..., 2] = 1.0
        recs.append({"filename": fn, "kpts2d": kpts,
                     "bboxes": rng.uniform(0, 50, (3, 4)),
                     "width": 200, "height": 150})
    with open(root / "coco_train.pkl", "wb") as f:
        pickle.dump(recs, f)
    return str(root)


def test_coco_fake_motion(coco_fixture):
    ds = HybridDataset(CFG, mode="train", coco_dir=coco_fixture)
    assert len(ds) == 2
    s = ds[0]
    t = s["targets"]
    assert t["dataset"] == "coco"
    # frames must differ (interpolated crops simulate camera motion)
    assert not np.allclose(s["images"][0], s["images"][1])
    # every person present in every frame
    assert np.all(t["track_ids"][t["valid"]] == 1)


def test_build_trajectories_future_filtering():
    kpts = [np.ones((2, K, 3)), np.ones((1, K, 3)), np.ones((3, K, 3))]
    ids = [np.array([0, 2]), np.array([2]), np.array([0, 2, 5])]
    out = build_trajectories(kpts, ids, seq_len=2, max_persons=4)
    # person 5 appears only in the future frame -> dropped
    assert out["n_persons"] == 2
    assert set(out["traj_ids"][:2].tolist()) == {0, 2}
    # frame 0: persons {0, 2}; frame 1: {2}; future frame: {0, 2} (5 dropped)
    np.testing.assert_array_equal(out["track_ids"][:2].sum(0), [2, 1, 2])


def test_transform_frame_kpts_flip_roundtrip():
    rng = np.random.default_rng(4)
    k = rng.uniform(0, 100, (2, K, 3))
    k[..., 2] = 1.0
    ident = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    out = transform_frame_kpts(k, False, 100, ident, (50, 100))
    np.testing.assert_allclose(out[..., 0], k[..., 0] / 100, rtol=1e-6)
    # flip: x -> (W - x - 1), joints swapped L/R
    fl = transform_frame_kpts(k, True, 100, ident, (50, 100))
    np.testing.assert_allclose(fl[:, 3, 0] * 100, 100 - k[:, 4, 0] - 1,
                               rtol=1e-5)


def test_jta_listed_without_augmentation(jta_fixture):
    """The reference lists every JTA sample with augmentation disabled,
    train and test (hybrid_dataloader.py:1564-1565, :1718)."""
    ds = HybridDataset(CFG, mode="train", jta_dir=jta_fixture)
    jta = [s for s in ds.samples if s[0] == "jta"]
    assert jta and all(s[4] is False for s in jta)


def test_bbox_padded_reference_parity():
    """bbox_2d_padded semantics (hybrid_dataloader.py:1375-1410): 15% pad
    on BOTH axes; no-visible-joints rows get the [1, 1, 1, 1] placeholder."""
    from snipper_tpu.data.snippet import bbox_2d_padded_batch

    k = np.zeros((2, 15, 3))
    k[0, 0] = [10.0, 20.0, 1.0]
    k[0, 1] = [30.0, 60.0, 1.0]
    b = bbox_2d_padded_batch(k)
    np.testing.assert_allclose(
        b[0], [10 - 0.15 * 20 / 2, 20 - 0.15 * 40 / 2, 20 * 1.15, 40 * 1.15])
    np.testing.assert_allclose(b[1], [1.0, 1.0, 1.0, 1.0])


def test_bbxes_are_pixel_space(posetrack_fixture):
    """The reference computes bbxes BEFORE keypoint normalization
    (hybrid_dataloader.py:343), i.e. in input-pixel units."""
    ds = HybridDataset(CFG, mode="train", posetrack_dir=posetrack_fixture)
    s = ds[0]
    t = s["targets"]
    wh = t["bbxes"][t["valid"]][..., 2:4]
    # a real person's padded box spans many pixels; normalized-space boxes
    # could never exceed ~1.2
    assert (wh > 2.0).any(), wh


def test_device_preprocess_mode_matches_host_pipeline(posetrack_fixture):
    """device_preprocess=True emits raw frames + folded affines + color;
    warping them with the device op must reproduce the host pipeline's
    images bit-approximately for the SAME augmentation stream (same seed
    -> same per-sample rot/flip/color), through the real loader collate
    (zero-padding to 128-multiples)."""
    import jax.numpy as jnp

    from snipper_tpu.data.device_preprocess import warp_train_batch_device
    from snipper_tpu.data.loader import DataLoader

    ds_host = HybridDataset(CFG, mode="train",
                            posetrack_dir=posetrack_fixture, seed=9)
    ds_dev = HybridDataset(CFG, mode="train",
                           posetrack_dir=posetrack_fixture, seed=9,
                           device_preprocess=True)
    kw = dict(shuffle=False, process_index=0, process_count=1)
    b_host = next(iter(DataLoader(ds_host, 2, **kw)))
    b_dev = next(iter(DataLoader(ds_dev, 2, **kw)))

    assert "images" not in b_dev and b_dev["raw_images"].dtype == np.uint8
    assert b_dev["raw_images"].shape[2] % 128 == 0
    got = np.asarray(warp_train_batch_device(
        jnp.asarray(b_dev["raw_images"]), jnp.asarray(b_dev["warp_inv"]),
        jnp.asarray(b_dev["color_scale"]),
        (CFG.input_height, CFG.input_width)))
    np.testing.assert_allclose(got, b_host["images"], atol=2e-3)
    # targets are identical (host-side keypoint transforms are unchanged)
    np.testing.assert_allclose(b_dev["targets"]["kpts2d"],
                               b_host["targets"]["kpts2d"], atol=1e-6)
