"""Visualization: 2D skeleton overlays, 3D pose plots, trajectory renders,
GIF export.

Counterpart of reference ``inference_utils.py:342-644``
(``save_visual_results`` / ``save_as_videos`` / ``visualize_heatmaps``),
rebuilt on PIL + matplotlib (no cv2/imageio in the image).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from snipper_tpu.data.skeleton import SKELETON_EDGES


def _colors(n: int):
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("rainbow")
    return [tuple(int(255 * c) for c in cmap(x)[:3])
            for x in np.linspace(0, 1, max(n, 1))]


def draw_skeleton_2d(img: np.ndarray, kpts: np.ndarray, color,
                     score_thresh: float = 0.3) -> np.ndarray:
    """Draw one person's skeleton; ``kpts [K, >=3]`` (x, y, ..., score
    last col)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(img)
    d = ImageDraw.Draw(im)
    score = kpts[:, -1]
    for a, b in SKELETON_EDGES:
        if score[a] > score_thresh and score[b] > score_thresh:
            d.line([tuple(kpts[a, :2]), tuple(kpts[b, :2])], fill=color,
                   width=3)
    for k in range(kpts.shape[0]):
        if score[k] > score_thresh:
            x, y = kpts[k, :2]
            d.ellipse([x - 3, y - 3, x + 3, y + 3], fill=color)
    return np.asarray(im)


def render_pose3d(poses: Dict[int, np.ndarray], colors, max_depth: float,
                  img_w: int, img_h: int, path: str, elev=20, azim=-80):
    """3D scatter/limb plot, (x, depth, -y) axes like the reference."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for pid, kpt in poses.items():
        c = np.asarray(colors[pid % len(colors)]) / 255.0
        for a, b in SKELETON_EDGES:
            ax.plot([kpt[a, 0], kpt[b, 0]], [kpt[a, 2], kpt[b, 2]],
                    [-kpt[a, 1], -kpt[b, 1]], color=c, linewidth=2)
    ax.set_xlim([0, img_w])
    ax.set_ylim([0, max_depth + 2])
    ax.set_zlim([-img_h, 0])
    ax.set_xticklabels([])
    ax.set_yticklabels([])
    ax.set_zticklabels([])
    ax.view_init(elev, azim)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def save_visual_results(all_frames: Dict[int, tuple],
                        all_filenames: List[str], data_dir: str,
                        save_dir: str, max_pid: int, max_depth: float,
                        save_3d: bool = True):
    """Per tracked frame: skeleton overlay JPEG (+ 3D plot)."""
    from PIL import Image

    os.makedirs(os.path.join(save_dir, "pose2d"), exist_ok=True)
    if save_3d:
        os.makedirs(os.path.join(save_dir, "pose3d"), exist_ok=True)
    colors = _colors(max_pid)
    for frame_idx, (pids, data) in sorted(all_frames.items()):
        fn = all_filenames[frame_idx]
        img = np.asarray(Image.open(os.path.join(data_dir, fn))
                         .convert("RGB"))
        vis = img.copy()
        for i, pid in enumerate(pids):
            kpts = np.concatenate([data[i, :, 0:2], data[i, :, 3:4]], -1)
            vis = draw_skeleton_2d(vis, kpts, colors[pid % len(colors)])
        Image.fromarray(vis).save(
            os.path.join(save_dir, "pose2d", f"{frame_idx:06d}.jpg"))
        if save_3d:
            poses = {int(pid): np.stack(
                [data[i, :, 0], data[i, :, 1], data[i, :, 2]], -1)
                for i, pid in enumerate(pids)}
            render_pose3d(poses, colors, max_depth, img.shape[1],
                          img.shape[0],
                          os.path.join(save_dir, "pose3d",
                                       f"{frame_idx:06d}.jpg"))


def save_as_gif(image_dir: str, out_path: str, fps: int = 5):
    """Assemble rendered frames into a GIF (reference writes at 5 fps,
    ``inference_utils.py:618``)."""
    from PIL import Image

    files = sorted(os.listdir(image_dir))
    if not files:
        return
    frames = [Image.open(os.path.join(image_dir, f)) for f in files]
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def visualize_heatmaps(heatmaps: List[np.ndarray], images: np.ndarray,
                       save_dir: str, level: int = 0, head: int = 0):
    """Overlay encoder keypoint heatmaps on input frames (counterpart of
    ``inference_utils.py:622-644``). heatmaps: [(B, T, h, w, nhead, K)]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_dir, exist_ok=True)
    hm = np.asarray(heatmaps[level])[0, :, :, :, head]  # [T, h, w, K]
    T = hm.shape[0]
    for t in range(T):
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(images[t])
        ax.imshow(hm[t].max(-1), alpha=0.5, cmap="jet",
                  extent=(0, images.shape[2], images.shape[1], 0))
        ax.axis("off")
        fig.savefig(os.path.join(save_dir, f"heatmap_t{t}.jpg"),
                    bbox_inches="tight")
        plt.close(fig)
