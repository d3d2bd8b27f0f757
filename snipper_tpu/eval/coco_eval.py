"""COCO keypoint result writer + OKS-based AP evaluation.

Counterpart of reference ``write_val_results_coco`` / ``eval_coco_val_results``
(``datasets/hybrid_dataloader.py:1876-1915``). pycocotools is not available
in this image, so a self-contained COCOeval-keypoints implementation is
provided: standard OKS with the 17-keypoint sigmas, AP/AR averaged over OKS
thresholds 0.5:0.05:0.95, greedy per-image matching by descending score
(the COCOeval algorithm), medium/large area splits.

The reference's writer also carries a known wart — it gates on a
``self.eval_coco`` attribute that is never set (``:1878``), which would
raise; per SURVEY.md §5 that is intentionally not replicated.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from snipper_tpu.data.skeleton import JOINT15_TO_COCO

# standard COCO keypoint sigmas (17 kpts)
COCO_SIGMAS = np.array([
    .026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
    .107, .107, .087, .087, .089, .089]) * 2  # k = 2*sigma per COCOeval

OKS_THRESHOLDS = np.arange(0.5, 0.99, 0.05)


def write_coco_results(results: Dict, output_dir: str) -> str:
    """``results``: {image_id: [(human_score [n], kpts2d [n, 15, 3]), ...]}
    -> COCO-format prediction JSON (17 keypoints, JOINT15 mapped through the
    19-joint intermediate as the reference does)."""
    os.makedirs(output_dir, exist_ok=True)
    anns = []
    for image_id, entries in results.items():
        human_score, kpts2d = entries[0][:2]
        for p in range(np.asarray(kpts2d).shape[0]):
            coco_kpt = np.zeros([19, 3])
            coco_kpt[JOINT15_TO_COCO] = np.asarray(kpts2d)[p]
            anns.append({
                "image_id": int(image_id),
                "category_id": 1,
                "keypoints": coco_kpt[2:].reshape(-1).tolist(),
                "score": float(np.asarray(human_score)[p]),
            })
    path = os.path.join(output_dir, "coco_val2017_predictions.json")
    with open(path, "w") as f:
        json.dump(anns, f)
    return path


def compute_oks(gt_kpts: np.ndarray, gt_area: float, dt_kpts: np.ndarray
                ) -> float:
    """OKS between one GT and one detection; kpts ``[17, 3]``."""
    vis = gt_kpts[:, 2] > 0
    if not vis.any():
        return 0.0
    d2 = ((gt_kpts[:, 0] - dt_kpts[:, 0]) ** 2
          + (gt_kpts[:, 1] - dt_kpts[:, 1]) ** 2)
    var = (COCO_SIGMAS ** 2) * 2.0 * max(gt_area, 1e-6)
    e = d2[vis] / var[vis]
    return float(np.mean(np.exp(-e)))


def evaluate_coco_keypoints(gt_json_path: str, pred_json_path: str,
                            area_rng=(32 ** 2, 1e10)) -> Dict[str, float]:
    """OKS AP/AR over thresholds 0.5:0.05:0.95 (COCOeval 'keypoints')."""
    with open(gt_json_path) as f:
        gt = json.load(f)
    with open(pred_json_path) as f:
        preds = json.load(f)

    gts_by_img: Dict[int, list] = {}
    for a in gt.get("annotations", []):
        if a.get("num_keypoints", 1) == 0:
            continue
        gts_by_img.setdefault(a["image_id"], []).append(a)
    dts_by_img: Dict[int, list] = {}
    for d in preds:
        dts_by_img.setdefault(d["image_id"], []).append(d)

    tps = {t: [] for t in OKS_THRESHOLDS}
    scores_all = []
    n_gt = 0
    for img_id, gts in gts_by_img.items():
        gts = [g for g in gts
               if area_rng[0] <= g.get("area", 1e9) < area_rng[1]]
        n_gt += len(gts)
        dts = sorted(dts_by_img.get(img_id, []),
                     key=lambda d: -d["score"])
        gk = [np.asarray(g["keypoints"], np.float64).reshape(-1, 3)
              for g in gts]
        ga = [g.get("area", 1e9) for g in gts]
        oks = np.zeros((len(dts), len(gts)))
        for i, d in enumerate(dts):
            dk = np.asarray(d["keypoints"], np.float64).reshape(-1, 3)
            for j in range(len(gts)):
                oks[i, j] = compute_oks(gk[j], ga[j], dk)
        for t in OKS_THRESHOLDS:
            taken = np.zeros(len(gts), bool)
            tp = []
            for i in range(len(dts)):
                best, bj = t, -1
                for j in range(len(gts)):
                    if not taken[j] and oks[i, j] >= best:
                        best, bj = oks[i, j], j
                if bj >= 0:
                    taken[bj] = True
                    tp.append(True)
                else:
                    tp.append(False)
            tps[t].append(np.asarray(tp, bool))
        scores_all.append(np.asarray([d["score"] for d in dts]))

    if n_gt == 0:
        return {"AP": float("nan"), "AR": float("nan")}
    scores = np.concatenate(scores_all) if scores_all else np.zeros(0)
    order = np.argsort(-scores)
    aps, ars = [], []
    for t in OKS_THRESHOLDS:
        tp = (np.concatenate(tps[t]) if tps[t] else np.zeros(0, bool))[order]
        ctp = np.cumsum(tp)
        cfp = np.cumsum(~tp)
        rec = ctp / n_gt
        prec = ctp / np.maximum(ctp + cfp, 1e-12)
        # COCO 101-point interpolation
        rthrs = np.linspace(0, 1, 101)
        q = np.zeros(101)
        prec_env = prec.copy()
        for i in range(len(prec_env) - 2, -1, -1):
            prec_env[i] = max(prec_env[i], prec_env[i + 1])
        inds = np.searchsorted(rec, rthrs, side="left")
        for ri, pi in enumerate(inds):
            if pi < len(prec_env):
                q[ri] = prec_env[pi]
        aps.append(q.mean())
        ars.append(rec[-1] if len(rec) else 0.0)
    return {"AP": float(np.mean(aps)), "AP50": float(aps[0]),
            "AP75": float(aps[5]), "AR": float(np.mean(ars))}
