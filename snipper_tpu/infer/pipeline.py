"""Video inference pipeline: snippet sampling + cross-snippet association.

Counterpart of reference ``inference_utils.py``:
- ``load_snippet_samples`` — frame listing, snippet index stride
  ``gap * (T - 1)`` so consecutive snippets OVERLAP by exactly one frame,
  center-affine resize to the input shape (reference ``:143-195``).
- ``associate_snippets`` — greedy bidirectional-argmin identity propagation
  over the shared frame via a normalized L2 match cost on (kpts, depth,
  score); unmatched detections get fresh person ids; matched poses on the
  overlap are score-weighted averaged (reference ``:198-339``).
- ``compute_match_cost`` (reference ``:98-108``; the padded-bbox render
  helper lives in infer.visualize).

Frame decoding is PIL, the affine warp comes from
snipper_tpu.data.transforms; cv2 is required only for the optional
``--video`` input path (:func:`extract_video_frames`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from snipper_tpu.data.transforms import (gen_trans_from_patch,
                                         generate_patch_image)


def transform_pts_np(pts: np.ndarray, trans: np.ndarray) -> np.ndarray:
    ones = np.ones_like(pts[..., 0:1])
    return np.concatenate([pts, ones], -1) @ np.asarray(trans).T


def compute_match_cost(pre: np.ndarray, cur: np.ndarray, h: float, w: float,
                       max_depth: float) -> np.ndarray:
    """Normalized squared L2 over (x, y, depth, 0.1*score) summed over
    keypoints; ``pre [m, K, 4]``, ``cur [n, K, 4]`` -> ``[m, n]``."""
    d = pre[:, None] - cur[None, :]
    d = d * np.array([1.0 / w, 1.0 / h, 1.0 / max_depth, 0.1])
    return np.sum(d ** 2, axis=(-1, -2))


def _read_rgb(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def extract_video_frames(video_path: str, out_dir: str) -> int:
    """Decode a video file into numbered JPEG frames (``%06d.jpg``) so the
    frame-directory pipeline (snippet sampling, association by frame index,
    visualization re-reads) runs unchanged on raw videos.

    The reference requires pre-extracted frames (its ``get_all_samples``
    lists a directory, ``inference_utils.py:143-195``; videos are split by a
    separate JTA preprocessing step, ``datasets/data_preprocess/jta.py:11-60``
    — the same cv2 mechanism used here). Returns the frame count."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    os.makedirs(out_dir, exist_ok=True)
    # a previous run may have extracted MORE frames into the same directory
    # (e.g. a longer clip); the pipeline lists every image file, so stale
    # trailing frames would silently join the new sequence — clear anything
    # snippet_index would count (only after the video proved openable)
    for old in os.listdir(out_dir):
        if old.lower().endswith(IMAGE_EXTS):
            os.remove(os.path.join(out_dir, old))
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        path = os.path.join(out_dir, f"{i:06d}.jpg")
        if not cv2.imwrite(path, frame,
                           [int(cv2.IMWRITE_JPEG_QUALITY), 95]):
            cap.release()
            raise OSError(f"failed to write frame {i} to {path}")
        i += 1
    cap.release()
    if i == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    return i


def snippet_index(data_dir: str, num_frames: int, gap: int):
    """(frame_indices, all_files): snippet start stride is ``gap * (T - 1)``
    (``gap`` when T == 1), so the last frame of snippet k is the first frame
    of snippet k+1 (reference ``get_all_samples``, inference_utils.py:143).

    Only image files count as frames: sequence dirs routinely contain
    seqinfo/gt sidecar files or subdirectories, which would shift every
    frame index and crash the decoder."""
    skip = gap if num_frames == 1 else gap * (num_frames - 1)
    all_files = sorted(
        f for f in os.listdir(data_dir)
        if f.lower().endswith(IMAGE_EXTS)
        and os.path.isfile(os.path.join(data_dir, f)))
    return list(range(0, len(all_files) - skip, skip)), all_files


def iter_snippet_samples(data_dir: str, num_frames: int, gap: int,
                         input_shape: Tuple[int, int],
                         warp_on_device: bool = False,
                         index: Optional[tuple] = None):
    """Lazily decode snippet samples (generator; see
    :func:`load_snippet_samples` for the sample schema). Long videos stream
    with O(1) host memory; combine with :func:`prefetched` so JPEG decoding
    overlaps device compute.

    ``index``: a precomputed ``(frame_indices, all_files)`` from
    :func:`snippet_index` — pass the SAME listing the caller plans to
    associate against, so a directory that changes between listings cannot
    desync the iterator from the association index."""
    frame_indices, all_files = (index if index is not None
                                else snippet_index(data_dir, num_frames,
                                                   gap))
    h, w = input_shape
    for idx in frame_indices:
        filenames = [all_files[idx + gap * t] for t in range(num_frames)]
        imgs = np.stack([_read_rgb(os.path.join(data_dir, f))
                         for f in filenames])
        img_h, img_w = imgs.shape[1:3]

        # center crop-resize covering the input aspect (no augmentation)
        scale = max(img_w / w, img_h / h)
        cx, cy = img_w * 0.5, img_h * 0.5
        trans = gen_trans_from_patch(cx, cy, w * scale, h * scale, w, h, 0.0)
        inv_trans = gen_trans_from_patch(cx, cy, w * scale, h * scale, w, h,
                                         0.0, inv=True)
        sample = {
            "filenames": filenames,
            "inv_trans": inv_trans.astype(np.float32),
            "input_size": np.array([w, h], np.float32),
            "img_size": np.array([img_w, img_h], np.float32),
        }
        if warp_on_device:
            sample["raw_imgs"] = imgs.astype(np.uint8)
            sample["trans"] = trans.astype(np.float32)
        else:
            sample["imgs"] = np.stack(
                [generate_patch_image(im, False, trans, (h, w))
                 for im in imgs]).astype(np.float32)
        yield sample


def prefetched(it, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue so host
    decoding overlaps device compute (single-prefetch-thread pattern shared
    with data.loader)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    error: list = []

    def worker():
        try:
            for x in it:
                q.put(x)
        except BaseException as e:  # noqa: BLE001 - surfaced to consumer
            error.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        x = q.get()
        if x is sentinel:
            if error:
                # a decode failure must FAIL the run, not silently
                # truncate the stream (partial tracks presented as success)
                raise error[0]
            return
        yield x


def load_snippet_samples(data_dir: str, num_frames: int, gap: int,
                         input_shape: Tuple[int, int],
                         warp_on_device: bool = False):
    """Eagerly-materialized snippet samples.

    Returns (samples, frame_indices, all_files); each sample dict has
    ``imgs [T, H, W, 3]`` float32 in [0, 1], ``inv_trans``, ``filenames``,
    ``input_size`` (w, h), ``img_size`` (w, h).

    ``warp_on_device``: skip the host warp — samples carry raw uint8
    ``raw_imgs [T, H, W, 3]`` plus the forward affine ``trans`` for
    :func:`snipper_tpu.data.device_preprocess.preprocess_snippet_device`
    (the fused XLA preprocessing graph); the host then only decodes.
    """
    frame_indices, all_files = snippet_index(data_dir, num_frames, gap)
    samples = list(iter_snippet_samples(data_dir, num_frames, gap,
                                        input_shape, warp_on_device,
                                        index=(frame_indices, all_files)))
    return samples, frame_indices, all_files


def associate_snippets(results: List[Dict], frame_indices: List[int],
                       all_filenames: List[str], num_frames: int, gap: int,
                       max_depth: float):
    """Stitch per-snippet detections into video-level identities.

    ``results[k]`` is a per-snippet dict with ``human_score [n, T]``,
    ``pred_kpt_scores/pred_kpts/pred_depth``, ``inv_trans``, ``img_size``,
    ``filenames`` (PostProcess schema, pixel/metric space).

    Returns ``(all_frames_results, max_pid)`` where
    ``all_frames_results[frame_idx] = (pids [m], frame_data [m, K, 4])``
    with columns (x, y, depth, score) and the root replaced by the hip
    midpoint.
    """
    all_frames: Dict[int, tuple] = {}
    max_pid = 0

    def frame_block(kpts, scores, depth, inv_trans):
        k = transform_pts_np(kpts, inv_trans)
        data = np.concatenate([k, depth, scores], axis=-1)  # [m, K, 4]
        if data.shape[0]:
            data[:, 0, :] = (data[:, 9, :] + data[:, 10, :]) / 2
        return data

    for s_idx, res in enumerate(results):
        pred_human = np.asarray(res["human_score"]) > 0.5      # [nq, T]
        exist = pred_human.sum(1) > 0
        pred_human = pred_human[exist]
        scores = np.asarray(res["pred_kpt_scores"])[exist]
        kpts = np.asarray(res["pred_kpts"])[exist]
        depth = np.asarray(res["pred_depth"])[exist]
        inv_trans = np.asarray(res["inv_trans"])

        cur2pre_idx = np.zeros([0], np.int64)
        if s_idx == 0:
            n = pred_human.shape[0]
            seq_pids = np.arange(n)
            max_pid += n
        else:
            frame_idx = frame_indices[s_idx]
            key = frame_idx if num_frames > 1 else frame_idx - gap
            pre_pids, pre_data = all_frames.get(key, (np.zeros(0, np.int32),
                                                      np.zeros((0, 15, 4))))
            cur_exist = pred_human[:, 0]
            cur_data = frame_block(kpts[cur_exist, 0], scores[cur_exist, 0],
                                   depth[cur_exist, 0], inv_trans)

            if cur_data.shape[0] == 0 or pre_data.shape[0] == 0:
                seq_pids = np.full(cur_exist.shape[0], -1, np.int32)
                miss = int((seq_pids == -1).sum())
                seq_pids[seq_pids == -1] = np.arange(miss) + max_pid
                max_pid += miss
            else:
                w, h = np.asarray(res["img_size"])
                cost = compute_match_cost(pre_data, cur_data, h, w, max_depth)
                # greedy bidirectional argmin: a pair matches only if each is
                # the other's nearest
                pre2cur = np.argmin(cost, axis=1)
                mask = np.full(cost.shape, np.inf)
                mask[np.arange(len(pre2cur)), pre2cur] = 1
                masked = cost * mask
                cur_no_match = (mask != np.inf).sum(0) == 0
                cur2pre_idx = np.argmin(masked, axis=0)
                cur2pre_idx[cur_no_match] = -1

                cur_pids = np.full(len(cur2pre_idx), -1, np.int32)
                for i, p in enumerate(cur2pre_idx):
                    if p == -1:
                        cur_pids[i] = max_pid
                        max_pid += 1
                    else:
                        cur_pids[i] = pre_pids[p]
                seq_pids = np.full(cur_exist.shape[0], -1, np.int32)
                seq_pids[cur_exist] = cur_pids
                miss = int((seq_pids == -1).sum())
                seq_pids[seq_pids == -1] = np.arange(miss) + max_pid
                max_pid += miss

        for t in range(num_frames):
            assert res["filenames"][t] == \
                all_filenames[frame_indices[s_idx] + t * gap]
            frame_idx = frame_indices[s_idx] + t * gap
            ex = pred_human[:, t]
            data = frame_block(kpts[ex, t], scores[ex, t], depth[ex, t],
                               inv_trans)
            # score-weighted pose averaging on the shared (overlap) frame
            if (t == 0 and s_idx > 0 and cur2pre_idx.shape[0] > 0
                    and num_frames > 1):
                key = frame_indices[s_idx]
                _, pre_data = all_frames[key]
                valid = cur2pre_idx != -1
                cur_i = np.arange(len(cur2pre_idx))[valid]
                pre_i = cur2pre_idx[valid]
                ps = pre_data[pre_i][:, :, 3:4]
                cs = data[cur_i][:, :, 3:4]
                data[cur_i, :, 3:4] = (ps + cs) / 2
                data[cur_i, :, 0:3] = (
                    ps * pre_data[pre_i][:, :, 0:3]
                    + cs * data[cur_i][:, :, 0:3]) / (ps + cs)
            all_frames[frame_idx] = (seq_pids[ex], data)
    return all_frames, max_pid


def make_data_parallel_forward(model, params, mesh):
    """Data-parallel inference over a device mesh.

    Snippets are independent (the reference loops them serially at batch 1,
    ``inference.py:141-189``), so multi-chip serving shards a batch of
    ``B = dp * per_chip_batch`` snippets over the ``data`` axis: params
    replicated, batch sharded, XLA runs each shard independently (no
    collectives in the forward). Per-chip batch 1 is optimal for the
    compute-bound canonical configs (batch scaling flat/negative), while
    the cheap configs gain from per-chip batching (light_t1 ~1.4-1.6x at
    batch 4 — dispatch overhead amortized; BASELINE.md).

    Returns ``(run, dp_size)`` where ``run(imgs [B, T, H, W, 3]) -> out``
    requires ``B % dp_size == 0``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["data"]
    repl = jax.device_put(params, NamedSharding(mesh, P()))
    data = NamedSharding(mesh, P("data"))
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def run(imgs: np.ndarray):
        assert imgs.shape[0] % dp == 0, (imgs.shape, dp)
        # device_put the HOST array with the sharding directly: each device
        # receives only its B/dp slice (jnp.asarray first would upload the
        # whole batch to one default device and reshard from there)
        x = jax.device_put(imgs, data)
        return fwd(repl, x)

    return run, dp


class ExactnessGuard:
    """Forward wrapper enforcing windowed-sampling exactness on EVERY call.

    The windowed deformable-sampling path is exact only while its runtime
    dropped-tap counter (``out["sampling_overflow"]``) stays zero; learned
    offsets can exceed the contraction-window margin on ANY snippet, not
    just the first (offsets are input-dependent). This guard re-checks the
    counter after every forward — the outputs are read back to host each
    iteration anyway, so the extra scalar read is free — and escalates the
    margin cascade 5 -> 8 -> exact pmerged, re-running the snippet that
    overflowed so no corrupted predictions are ever returned.

    ``build(cfg) -> forward`` rebuilds the jitted forward for a new config
    (compile cost is paid at most twice per process). Exactness contract of
    reference ``models/ops/functions/ms_deform_attn_func.py:45-65``.
    """

    def __init__(self, cfg, build):
        self.cfg = cfg
        self._build = build
        self._fwd = build(cfg)
        self.overflow_events = 0

    @property
    def forward(self):
        """The current (post-cascade) jitted forward — for callers that
        time raw calls without the per-call overflow readback."""
        return self._fwd

    def __call__(self, imgs):
        out = self._fwd(imgs)
        while self.cfg.deform_impl in ("windowed", "windowed2d",
                                       "windowed_hybrid",
                                       "windowed_vjp") and \
                float(np.asarray(out["sampling_overflow"])) > 0:
            self.overflow_events += 1
            if self.cfg.sampling_margin < 8:
                print(f"windowed overflow at margin "
                      f"{self.cfg.sampling_margin}: widening to 8",
                      flush=True)
                self.cfg = self.cfg.replace(sampling_margin=8)
            else:
                print("windowed sampling overflow: falling back to the "
                      "exact pmerged path", flush=True)
                self.cfg = self.cfg.replace(deform_impl="pmerged")
            self._fwd = self._build(self.cfg)
            out = self._fwd(imgs)
        return out
