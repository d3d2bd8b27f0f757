"""Tests for eval metrics and the snippet association pipeline."""

import numpy as np

from snipper_tpu.eval.metrics import (compute_mpjpe, eval_pose3d,
                                      matcher_pose3d, pck3d, unproject)
from snipper_tpu.infer.pipeline import associate_snippets, compute_match_cost
from snipper_tpu.infer.visualize import bbox_2d_padded

K = 15


def test_unproject_pinhole():
    kpts = np.array([[[320.0, 240.0], [420.0, 240.0]]])  # [1, 2, 2]
    depth = np.array([[[2.0], [4.0]]])
    cam = [100.0, 100.0, 320.0, 240.0]
    p = unproject(kpts, depth, cam)
    np.testing.assert_allclose(p[0, 0], [0, 0, 2.0])
    np.testing.assert_allclose(p[0, 1], [4.0, 0, 4.0])


def test_compute_mpjpe_keys():
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((3, K, 3))
    vis = np.ones((3, K, 1))
    pred = gt + 0.1
    # every joint off by 0.1 in each axis -> norm = 0.1*sqrt(3)
    e = compute_mpjpe(gt, vis, pred, "mpjpe_joint")
    np.testing.assert_allclose(e, 0.1 * np.sqrt(3), rtol=1e-6)
    e = compute_mpjpe(gt, vis, pred, "mpjpe_root")
    assert e.shape == (3,)
    # constant offset cancels under root alignment
    e = compute_mpjpe(gt, vis, pred, "pel_mpjpe_joint")
    np.testing.assert_allclose(e, 0.0, atol=1e-6)
    assert pck3d(e) == 1.0


def test_matcher_pose3d_prefers_nearest():
    gt = np.zeros((2, K, 3))
    gt[1, :, 0] = 5.0
    vis = np.ones((2, K, 1))
    pred = np.zeros((2, K, 3))
    pred[0, :, 0] = 5.1   # pred0 near gt1
    pred[1, :, 0] = 0.1   # pred1 near gt0
    src, tgt = matcher_pose3d(gt, vis, pred)
    pairs = dict(zip(tgt.tolist(), src.tolist()))
    assert pairs[0] == 1 and pairs[1] == 0


def test_eval_pose3d_end_to_end():
    T = 2
    gt3d = np.zeros((1, T, K, 3))
    gt3d[..., 2] = 3.0
    cam = np.array([100.0, 100.0, 0.0, 0.0])
    # pred kpts in input space == gt projected (identity inv_trans)
    proj = gt3d[..., 0:2] / 3.0 * 100.0
    res = {
        "dataset": "mupots",
        "human_score": np.ones((1, T)) * 0.9,
        "pred_kpts": proj[0][None],               # [1, T, K, 2]
        "pred_depth": np.full((1, T, K, 1), 3.0),
        "gt_pose3d": gt3d,
        "gt_kpts_vis": np.ones((1, T, K, 1)),
        "gt_track_ids": np.ones((1, T)),
        "inv_trans": np.array([[1.0, 0, 0], [0, 1.0, 0]]),
        "cam_intr": cam,
    }
    err = eval_pose3d("mpjpe_joint", [res], 0, T)
    assert err.shape == (2 * K,)
    np.testing.assert_allclose(err, 0.0, atol=1e-6)


def _snippet_result(positions, score=0.95):
    """positions: [n, T, 2] root pixel positions; build a full result."""
    n, T, _ = positions.shape
    kpts = np.tile(positions[:, :, None, :], (1, 1, K, 1)).astype(np.float64)
    # spread joints slightly so hips differ from root
    kpts += np.arange(K)[None, None, :, None] * 2.0
    return {
        "human_score": np.full((n, T), score),
        "pred_kpt_scores": np.full((n, T, K, 1), score),
        "pred_kpts": kpts,
        "pred_depth": np.full((n, T, K, 1), 5.0),
        "inv_trans": np.array([[1.0, 0, 0], [0, 1.0, 0]]),
        "img_size": np.array([800.0, 600.0]),
    }


def test_association_propagates_ids():
    T, gap = 4, 5
    n_frames_total = 1 + gap * (T - 1) * 2
    files = [f"{i:04d}.jpg" for i in range(n_frames_total)]
    idxs = [0, gap * (T - 1)]

    # two people: person A at x=100, person B at x=500, constant
    posA, posB = 100.0, 500.0
    r1 = _snippet_result(np.array([[[posA, 100]] * T, [[posB, 300]] * T]))
    r2 = _snippet_result(np.array([[[posB, 300]] * T, [[posA, 100]] * T]))
    for r, i in zip((r1, r2), idxs):
        r["filenames"] = [files[i + gap * t] for t in range(T)]

    frames, max_pid = associate_snippets([r1, r2], idxs, files, T, gap, 15.0)
    assert max_pid == 2
    # identities must be consistent: query order swapped in snippet 2, but
    # pids follow position
    pids1, data1 = frames[0]
    pids2, data2 = frames[gap * (T - 1) * 2 - gap + gap]  # a late frame
    # person at x~100 has same pid in first and last frames
    a1 = pids1[np.argmin(data1[:, 1, 0])]
    a2 = pids2[np.argmin(data2[:, 1, 0])]
    assert a1 == a2


def test_association_new_person_gets_new_pid():
    T, gap = 2, 3
    files = [f"{i:04d}.jpg" for i in range(20)]
    idxs = [0, gap]
    r1 = _snippet_result(np.array([[[100.0, 100]] * T]))
    r2 = _snippet_result(np.array([[[100.0, 100]] * T, [[600.0, 400]] * T]))
    for r, i in zip((r1, r2), idxs):
        r["filenames"] = [files[i + gap * t] for t in range(T)]
    frames, max_pid = associate_snippets([r1, r2], idxs, files, T, gap, 15.0)
    assert max_pid == 2
    pids_last, _ = frames[idxs[1] + gap]
    assert set(pids_last.tolist()) == {0, 1}


def test_match_cost_and_bbox():
    pre = np.zeros((1, K, 4))
    cur = np.zeros((2, K, 4))
    cur[1, :, 0] = 50.0
    c = compute_match_cost(pre, cur, 600, 800, 15.0)
    assert c[0, 0] < c[0, 1]
    pose = np.zeros((K, 4))
    pose[:, 0] = np.linspace(10, 110, K)
    pose[:, 1] = np.linspace(20, 220, K)
    pose[:, 3] = 1.0
    x, y, w, h = bbox_2d_padded(pose)
    assert w > 100 and h > 200  # padded beyond the raw extent


def test_postprocess_slices_padded_target_slots():
    """Targets are padded to max_persons (data/snippet.py); postprocess
    must forward only the REAL persons (its docstring contract) — padded
    slots would otherwise reach the PoseTrack writer as garbage
    predictions with traj_id 0."""
    from snipper_tpu.infer.postprocess import postprocess

    n, T, K, M = 6, 2, 15, 4
    rng = np.random.default_rng(0)
    outputs = {
        "pred_logits": rng.normal(size=(1, n, T, 2)),
        "pred_kpts2d": rng.normal(size=(1, n, T, K, 3)),
        "pred_depth": rng.normal(size=(1, n, T, K, 1)),
    }
    valid = np.array([True, True, False, False])
    tgt = {
        "kpts2d": rng.uniform(size=(M, T, K, 3)).astype(np.float32),
        "depth": np.zeros((M, T, K, 2), np.float32),
        "valid": valid,
        "track_ids": np.ones((M, T), np.int32) * valid[:, None],
        "traj_ids": np.array([5, 9, 0, 0], np.int32),
        "kpts3d": rng.uniform(size=(M, T, K, 3)).astype(np.float32),
        "max_depth": np.float32(15.0),
        "input_size": np.array([96.0, 64.0], np.float32),
        "inv_trans": np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
        "dataset": "posetrack",
    }
    indices = np.array([[3, 1, 0, 2]])
    res = postprocess(outputs, [tgt], indices)[0]
    assert res["gt_kpts"].shape[0] == 2
    assert res["gt_pose3d"].shape[0] == 2
    assert list(res["gt_traj_ids"]) == [5, 9]
    src, tgt_idx = res["indices"]
    assert list(src) == [3, 1] and list(tgt_idx) == [0, 1]


def test_prefetched_propagates_worker_errors():
    """A decode failure inside the prefetch thread must fail the run, not
    silently truncate the stream (partial tracks presented as success)."""
    import pytest

    from snipper_tpu.infer.pipeline import prefetched

    def gen():
        yield 1
        yield 2
        raise RuntimeError("corrupt frame")

    out = []
    with pytest.raises(RuntimeError, match="corrupt frame"):
        for x in prefetched(gen(), depth=1):
            out.append(x)
    assert out == [1, 2]


def test_snippet_index_ignores_non_frames(tmp_path):
    """Sequence dirs routinely carry sidecar files and subdirectories;
    only image files may count as frames (anything else shifts every
    frame index and crashes the decoder)."""
    from snipper_tpu.infer.pipeline import snippet_index

    for name in ("0001.jpg", "0002.jpg", "0003.png", "seqinfo.ini",
                 ".DS_Store", "gt.txt"):
        (tmp_path / name).write_bytes(b"x")
    (tmp_path / "subdir").mkdir()
    (tmp_path / "0000.jpg").mkdir()  # a directory named like a frame
    _, files = snippet_index(str(tmp_path), 2, 1)
    assert files == ["0001.jpg", "0002.jpg", "0003.png"]
