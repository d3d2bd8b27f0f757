"""Visualization suite: reference demo artifact-set parity
(inference_utils.py:342-644 — track2d/track3d/trajectory/board/GIF +
heatmap and attention overlays)."""

import os

import numpy as np
import pytest
from PIL import Image

from snipper_tpu.infer.visualize import (bbox_2d_padded, pid_palette,
                                         save_as_videos, save_visual_results,
                                         visualize_attention,
                                         visualize_heatmaps)

K = 15


def _fake_frames_dir(tmp_path, n=6, w=96, h=64):
    d = tmp_path / "frames"
    d.mkdir()
    names = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"{i:06d}.jpg"
        Image.fromarray(img).save(d / name)
        names.append(name)
    return str(d), names


def _fake_tracks(n_frames=6, n_people=2):
    rng = np.random.default_rng(1)
    frames = {}
    for f in range(n_frames):
        data = np.zeros((n_people, K, 4))
        for p in range(n_people):
            data[p, :, 0] = 20 + 25 * p + f * 2 + rng.uniform(-2, 2, K)
            data[p, :, 1] = 20 + rng.uniform(0, 20, K)
            data[p, :, 2] = 3.0 + p                     # depth
            data[p, :, 3] = 0.9                         # score
        frames[f] = (np.arange(n_people), data)
    return frames


def test_bbox_2d_padded():
    pose = np.zeros((K, 4))
    pose[:, 0] = np.linspace(10, 30, K)
    pose[:, 1] = np.linspace(40, 80, K)
    pose[:, 3] = 1.0
    x, y, w, h = bbox_2d_padded(pose)
    assert x < 10 and y < 40 and x + w > 30 and y + h > 80
    pose[:, 3] = 0.0
    assert bbox_2d_padded(pose) is None


def test_pid_palette_deterministic():
    assert pid_palette(7) == pid_palette(7)


def test_demo_artifact_set(tmp_path):
    """One pass over the full artifact set the reference demo writes."""
    data_dir, names = _fake_frames_dir(tmp_path)
    frames = _fake_tracks()
    out = str(tmp_path / "out")
    os.makedirs(out)
    save_visual_results(frames, names, data_dir, out, max_pid=2,
                        max_depth=15.0, gap=2)
    last = f"{len(names) - 1:06d}"
    for rel in (
        "track2d/000000_track.jpg",
        f"track2d/{last}_track.jpg",
        "track3d/000000_track3d.jpg",
        "track3d/000000_track3d_topdown.jpg",
        f"track3d/{last}_trajectory3d.jpg",
        f"track3d/{last}_trajectory3d_topdown.jpg",
    ):
        assert os.path.exists(os.path.join(out, rel)), rel

    save_as_videos(out, sorted(frames.keys()), names)
    assert os.path.exists(os.path.join(out, "static_img.jpg"))
    gif = os.path.join(out, "pose_tracking.gif")
    assert os.path.exists(gif)
    im = Image.open(gif)
    assert getattr(im, "n_frames", 1) == len(frames)


def test_heatmap_and_attention_overlays(tmp_path):
    T, h, w, H, L, P, Lq = 2, 8, 12, 4, 2, 4, 6
    images = np.random.default_rng(0).uniform(0, 1, (T, 64, 96, 3))
    heat = [np.random.default_rng(1).uniform(0, 1, (1, T, h, w, H, K))]
    visualize_heatmaps(heat, images, str(tmp_path / "hm"))
    assert os.path.exists(tmp_path / "hm" / "heatmap_t0.jpg")
    assert os.path.exists(tmp_path / "hm" / "heatmap_t1.jpg")

    rng = np.random.default_rng(2)
    loc = rng.uniform(0, 1, (1, T, Lq, H, L, P, 2))
    attn = rng.uniform(0, 1, (1, T, Lq, H, L, P))
    visualize_attention([(loc, attn)], images, str(tmp_path / "attn"),
                        query_scores=rng.uniform(0, 1, Lq), top_k=3)
    assert os.path.exists(tmp_path / "attn" / "attention_t0.jpg")
    assert os.path.exists(tmp_path / "attn" / "attention_t1.jpg")


def test_save_eval_keypoint_renders(tmp_path):
    """Eval-time GT-vs-pred render (reference engine.py:132-135 save_vis):
    one JPEG per sample with observed frames tiled horizontally."""
    import numpy as np

    from snipper_tpu.infer.visualize import save_eval_keypoint_renders

    rng = np.random.default_rng(0)
    B, T, H, W, K = 2, 2, 48, 64, 15
    images = rng.uniform(0, 1, (B, T, H, W, 3)).astype(np.float32)
    results = []
    for _ in range(B):
        m, n = 2, 4
        results.append({
            "gt_kpts": rng.uniform(5, 40, (m, T, K, 2)).astype(np.float32),
            "gt_kpts_vis": np.ones((m, T, K, 1), np.float32),
            "pred_kpts": rng.uniform(5, 40, (n, T, K, 2)).astype(np.float32),
            "pred_kpt_scores": np.ones((n, T, K, 1), np.float32),
            "indices": (np.arange(m), np.arange(m)),
        })
    out = str(tmp_path / "vis")
    save_eval_keypoint_renders(results, images, out, batch_idx=3)
    import os

    files = sorted(os.listdir(out))
    assert files == ["eval_b0003_s0.jpg", "eval_b0003_s1.jpg"], files
    from PIL import Image

    im = Image.open(os.path.join(out, files[0]))
    assert im.size == (W * T, H)
