"""Preprocessing debug-visualization tests (reference dataset_util.py role)."""

import os

import numpy as np

from snipper_tpu.data.preprocess.visualize import (JOINT15_NAMES,
                                                   render_annotation_frame,
                                                   render_sequence)


def _person(x0, y0):
    k = np.zeros((15, 3))
    k[:, 0] = x0 + np.linspace(0, 30, 15)
    k[:, 1] = y0 + np.linspace(0, 60, 15)
    k[:, 2] = 1
    return k


def test_joint15_names_match_skeleton():
    from snipper_tpu.data.skeleton import NUM_JOINTS, SKELETON_EDGES

    assert len(JOINT15_NAMES) == NUM_JOINTS
    assert max(max(e) for e in SKELETON_EDGES) < NUM_JOINTS


def test_render_annotation_frame_draws_and_saves(tmp_path):
    img = np.zeros((120, 160, 3), np.uint8)
    kpts = np.stack([_person(10, 10), _person(90, 30)])
    out_path = str(tmp_path / "f.jpg")
    out = render_annotation_frame(img, kpts, [3, 7], out_path)
    assert out.shape == img.shape
    assert out.sum() > 0          # something was drawn
    assert os.path.exists(out_path)


def test_render_sequence_stable_palette(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    root.mkdir()
    frames = []
    for i in range(3):
        name = f"{i:03d}.jpg"
        Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(root / name)
        frames.append({"filename": name,
                       "kpts2d": np.stack([_person(5 + i, 5)]),
                       "track_ids": np.array([4])})
    written = render_sequence(frames, str(root), str(tmp_path / "vis"),
                              name="seq", max_frames=2)
    assert len(written) == 2 and all(os.path.exists(p) for p in written)


def test_render_sequence_reads_singular_track_id_key(tmp_path):
    """posetrack extractor records store ids under 'track_id' (singular,
    preprocess/posetrack.py) — render_sequence must honor it, not fall
    back to unstable arange ids."""
    from PIL import Image

    root = tmp_path / "imgs"
    root.mkdir()
    frames = []
    for i in range(2):
        name = f"{i:03d}.jpg"
        Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(root / name)
        frames.append({"filename": name,
                       "kpts2d": np.stack([_person(5 + i, 5)]),
                       "track_id": np.array([9])})
    written = render_sequence(frames, str(root), str(tmp_path / "vis"),
                              name="seq")
    assert len(written) == 2
