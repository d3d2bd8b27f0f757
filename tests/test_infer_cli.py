"""End-to-end inference CLI on a frames directory (tiny preset, CPU).

Covers the single-chip batched path: --snippet_batch groups several
snippets per dispatch (the light_t1 throughput knob, BASELINE.md) and
must produce identical tracks to the per-snippet loop.
"""

import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image


def _frames_dir(tmp_path, n=8, w=96, h=64):
    d = tmp_path / "seq"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(img).save(d / f"{i:06d}.jpg")
    return str(d)


def test_extract_video_frames_clears_stale_frames(tmp_path):
    """Re-extracting a shorter clip into the same directory must not leave
    trailing frames from a previous longer run (the pipeline lists the
    directory, so stale frames would silently join the sequence)."""
    import cv2

    from snipper_tpu.infer.pipeline import extract_video_frames

    rng = np.random.default_rng(2)
    video = str(tmp_path / "short.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (32, 24))
    assert w.isOpened()
    for _ in range(3):
        w.write(rng.integers(0, 255, (24, 32, 3), np.uint8))
    w.release()

    out = tmp_path / "frames"
    out.mkdir()
    for i in range(7):  # a previous, longer extraction
        (out / f"{i:06d}.jpg").write_bytes(b"stale")
    # snippet_index accepts any image extension case-insensitively, so
    # stale frames from other sources must be cleared too
    (out / "000007.PNG").write_bytes(b"stale")
    (out / "000008.webp").write_bytes(b"stale")

    # an unopenable video must NOT destroy the previous extraction
    with pytest.raises(FileNotFoundError):
        extract_video_frames(str(tmp_path / "typo.mp4"), str(out))
    assert len(os.listdir(out)) == 9

    n = extract_video_frames(video, str(out))
    assert n == 3
    assert sorted(os.listdir(out)) == [f"{i:06d}.jpg" for i in range(3)]


@pytest.mark.slow
def test_video_input_matches_frames_dir(tmp_path, monkeypatch):
    """--video decodes to {output_dir}/frames and must yield the same
    tracks as running on that frame directory directly."""
    import cv2

    from snipper_tpu.cli import infer as infer_cli

    rng = np.random.default_rng(1)
    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64))
    assert w.isOpened()
    for _ in range(6):
        w.write(rng.integers(0, 255, (64, 96, 3), np.uint8))
    w.release()

    out_v = str(tmp_path / "from_video")
    monkeypatch.setattr(sys, "argv", [
        "infer", "--preset", "tiny", "--video", video, "--seq_gap", "1",
        "--output_dir", out_v])
    infer_cli.main()
    frames_dir = os.path.join(out_v, "frames")
    assert len(os.listdir(frames_dir)) == 6

    out_d = str(tmp_path / "from_frames")
    monkeypatch.setattr(sys, "argv", [
        "infer", "--preset", "tiny", "--data_dir", frames_dir,
        "--seq_gap", "1", "--output_dir", out_d])
    infer_cli.main()

    tracks = {}
    for out in (out_v, out_d):
        with open(os.path.join(out, "tracks.pkl"), "rb") as f:
            tracks[out] = pickle.load(f)
    a, b = tracks[out_v], tracks[out_d]
    assert a["max_pid"] == b["max_pid"]
    assert set(a["frames"]) == set(b["frames"])
    for k in a["frames"]:
        assert list(a["frames"][k][0]) == list(b["frames"][k][0])
        np.testing.assert_array_equal(a["frames"][k][1], b["frames"][k][1])


@pytest.mark.slow
def test_vis_heatmap_frame_name(tmp_path, monkeypatch):
    """--vis_heatmap_frame_name renders the overlay for exactly the named
    frame (reference inference.py:209-219) and fails loudly when the frame
    is not part of any predicted snippet (reference inference.py:217)."""
    from snipper_tpu.cli import infer as infer_cli

    data_dir = _frames_dir(tmp_path, n=6)
    out = str(tmp_path / "vis")
    monkeypatch.setattr(sys, "argv", [
        "infer", "--preset", "tiny", "--data_dir", data_dir,
        "--seq_gap", "1", "--output_dir", out, "--save_visuals",
        "--vis_heatmap_frame_name", "000003.jpg"])
    infer_cli.main()
    assert os.listdir(os.path.join(out, "heatmaps")) == [
        "heatmap_000003.jpg"]

    monkeypatch.setattr(sys, "argv", [
        "infer", "--preset", "tiny", "--data_dir", data_dir,
        "--seq_gap", "1", "--output_dir", str(tmp_path / "vis2"),
        "--save_visuals", "--vis_heatmap_frame_name", "999999.jpg"])
    with pytest.raises(ValueError, match="not used for prediction"):
        infer_cli.main()

    # the flag shapes the --save_visuals stage; alone it is a usage error
    monkeypatch.setattr(sys, "argv", [
        "infer", "--preset", "tiny", "--data_dir", data_dir,
        "--output_dir", str(tmp_path / "vis3"),
        "--vis_heatmap_frame_name", "000003.jpg"])
    with pytest.raises(SystemExit):
        infer_cli.main()


@pytest.mark.slow
def test_snippet_batch_matches_per_snippet(tmp_path, monkeypatch):
    from snipper_tpu.cli import infer as infer_cli

    data_dir = _frames_dir(tmp_path)
    outs = {}
    for tag, extra in (
            ("b1", []),
            ("b2", ["--snippet_batch", "2"]),
            # every dispatch-shaping flag at once: sharded over the 8
            # virtual devices, 2 snippets per chip, frames warped on device
            ("dp", ["--data_parallel", "--snippet_batch", "2",
                    "--device_preprocess"])):
        out = str(tmp_path / tag)
        monkeypatch.setattr(sys, "argv", [
            "infer", "--preset", "tiny", "--data_dir", data_dir,
            "--seq_gap", "1", "--output_dir", out] + extra)
        infer_cli.main()
        with open(os.path.join(out, "tracks.pkl"), "rb") as f:
            outs[tag] = pickle.load(f)

    a = outs["b1"]
    for tag in ("b2", "dp"):
        b = outs[tag]
        assert a["max_pid"] == b["max_pid"], tag
        assert set(a["frames"]) == set(b["frames"]), tag
        for k in a["frames"]:
            pids_a, data_a = a["frames"][k]
            pids_b, data_b = b["frames"][k]
            assert list(pids_a) == list(pids_b), (tag, k)
            # coordinates are pixel-scale; batch-shape-dependent XLA fusion
            # (and the device-vs-host warp) gives ~1e-6 normalized jitter
            # -> ~1e-4 px after decode
            np.testing.assert_allclose(data_a, data_b, rtol=1e-3, atol=5e-3,
                                       err_msg=f"{tag}@{k}")
