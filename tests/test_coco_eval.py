"""COCO OKS evaluation tests, including hand-derived COCOeval golden values.

The golden scenario walks the exact pycocotools algorithm by hand
(cocoeval.py evaluateImg/accumulate): crowd GTs absorb detections (ignored),
num_keypoints==0 GTs are ignore regions with bbox-fallback OKS, maxDets
truncates, and AP uses 101-point interpolated precision per OKS threshold.
"""

import json

import numpy as np
import pytest

from snipper_tpu.eval.coco_eval import (OKS_THRESHOLDS, compute_oks,
                                        evaluate_coco_keypoints,
                                        write_coco_results)


def _kpts(x0, y0, v=2):
    """17 keypoints with a 2D spread: bbox 80 x 60 -> area 4800 (medium)."""
    k = np.zeros((17, 3))
    k[:, 0] = x0 + np.arange(17) * 5.0
    k[:, 1] = y0 + (np.arange(17) % 4) * 20.0
    k[:, 2] = v
    return k


def _gt_ann(image_id, kpts, area=5000.0, ann_id=1, iscrowd=0, bbox=None):
    nk = int((kpts[:, 2] > 0).sum()) if kpts is not None else 0
    ann = {"image_id": image_id, "id": ann_id, "category_id": 1,
           "keypoints": (kpts if kpts is not None
                         else np.zeros((17, 3))).reshape(-1).tolist(),
           "area": area, "num_keypoints": nk, "iscrowd": iscrowd}
    if bbox is not None:
        ann["bbox"] = list(bbox)
    return ann


def _det(image_id, kpts, score):
    return {"image_id": image_id, "category_id": 1,
            "keypoints": kpts.reshape(-1).tolist(), "score": score}


def test_oks_perfect_is_one():
    k = _kpts(50, 50)
    gt = _gt_ann(0, k)
    assert abs(compute_oks(gt, k) - 1.0) < 1e-9


def test_oks_bbox_fallback_inside_region_is_one():
    """GT with no labeled keypoints: detections inside the doubled bbox have
    zero distance (cocoeval.py computeOks z-region)."""
    gt = _gt_ann(0, None, bbox=(100, 100, 50, 50))
    inside = np.zeros((17, 3))
    inside[:, 0] = 120
    inside[:, 1] = 120
    assert abs(compute_oks(gt, inside) - 1.0) < 1e-9
    far = np.zeros((17, 3))
    far[:, 0] = 10000
    far[:, 1] = 10000
    assert compute_oks(gt, far) < 1e-6


def _mid_oks_offset(gt_ann):
    """Offset delta (x only) putting the detection's OKS vs gt in
    (0.755, 0.79): a TP exactly for thresholds 0.5..0.75, FP above."""
    base = np.asarray(gt_ann["keypoints"], np.float64).reshape(-1, 3)
    for delta in np.linspace(0.5, 40.0, 400):
        d = base.copy()
        d[:, 0] += delta
        oks = compute_oks(gt_ann, d)
        if 0.755 <= oks <= 0.79:
            return d, oks
    raise AssertionError("no offset found")


def _golden_setup(tmp_path, with_crowd=True):
    A = _kpts(100, 100)
    D = _kpts(300, 100)
    gt = {"images": [{"id": 0}, {"id": 1}],
          "annotations": [
              _gt_ann(0, A, ann_id=1),
              _gt_ann(1, D, ann_id=4),
          ]}
    if with_crowd:
        # crowd region (B) and a keypoint-less ignore GT (C) on image 0
        gt["annotations"] += [
            _gt_ann(0, None, ann_id=2, iscrowd=1, bbox=(1000, 1000, 80, 60)),
            _gt_ann(0, None, ann_id=3, bbox=(2000, 2000, 50, 50)),
        ]
    d4, oks4 = _mid_oks_offset(_gt_ann(1, D))
    d2 = np.zeros((17, 3))  # inside B's doubled bbox -> OKS 1.0 vs B
    d2[:, 0] = 1010 + np.arange(17) * 5.0
    d2[:, 1] = 1010 + (np.arange(17) % 4) * 20.0
    preds = [
        _det(0, A, 0.9),                 # d1: perfect on A -> TP
        _det(0, d2, 0.8),                # d2: on crowd B -> ignored
        _det(0, _kpts(5000, 100), 0.7),  # d3: far from everything -> FP
        _det(1, d4, 0.6),                # d4: mid-OKS on D
    ]
    gt_path, pr_path = tmp_path / "gt.json", tmp_path / "pred.json"
    gt_path.write_text(json.dumps(gt))
    pr_path.write_text(json.dumps(preds))
    return str(gt_path), str(pr_path), oks4


def test_golden_crowd_ignore_maxdets(tmp_path):
    """Hand-derived golden AP/AR for the 2-image crowd/ignore scenario.

    With B (crowd) present: detections ordered d1(TP) d2(ignored) d3(FP)
    d4(TP for t<=0.75). n_gt=2.
      t <= 0.75: rec=[.5,.5,1], prec env=[1,2/3,2/3]
                 -> AP_t = (51*1 + 50*(2/3))/101
      t >  0.75: rec=[.5,.5,.5], prec env=[1,.5,1/3]
                 -> AP_t = 51/101
      AP = (6*AP_lo + 4*AP_hi)/10; AR = (6*1.0 + 4*0.5)/10 = 0.8
    """
    gt_path, pr_path, oks4 = _golden_setup(tmp_path, with_crowd=True)
    assert 0.75 < oks4 < 0.8  # d4 is TP exactly for the first 6 thresholds
    ap_lo = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    ap_hi = 51 / 101
    want_ap = (6 * ap_lo + 4 * ap_hi) / 10
    m = evaluate_coco_keypoints(gt_path, pr_path)
    np.testing.assert_allclose(m["AP"], want_ap, atol=1e-9)
    np.testing.assert_allclose(m["AP50"], ap_lo, atol=1e-9)
    np.testing.assert_allclose(m["AP75"], ap_lo, atol=1e-9)
    np.testing.assert_allclose(m["AR"], 0.8, atol=1e-9)
    # all GTs/dets are medium-sized; no large GTs exist
    np.testing.assert_allclose(m["AP_medium"], want_ap, atol=1e-9)
    assert m["AP_large"] == -1.0

    # maxDets=1: only d1 and d4 survive -> rec=[.5,1], prec=[1,1] below
    # t=0.75 (AP_t=1), rec=[.5,.5] above (AP_t=51/101)
    m1 = evaluate_coco_keypoints(gt_path, pr_path, max_dets=1)
    want_ap1 = (6 * 1.0 + 4 * ap_hi) / 10
    np.testing.assert_allclose(m1["AP"], want_ap1, atol=1e-9)


def test_golden_crowd_removal_turns_ignore_into_fp(tmp_path):
    """Without the crowd GT, d2 becomes a plain FP: the same detections
    score strictly lower, by the hand-computed amount."""
    gt_path, pr_path, oks4 = _golden_setup(tmp_path, with_crowd=False)
    assert 0.75 < oks4 < 0.8
    # d1 TP, d2 FP, d3 FP, d4 TP(for t<=.75):
    #   t<=.75: rec=[.5,.5,.5,1], prec env=[1,.5,.5,.5] -> (51+50*.5)/101
    #   t>.75:  rec=[.5]*4 -> 51/101
    ap_lo = (51 * 1.0 + 50 * 0.5) / 101
    ap_hi = 51 / 101
    want_ap = (6 * ap_lo + 4 * ap_hi) / 10
    m = evaluate_coco_keypoints(gt_path, pr_path)
    np.testing.assert_allclose(m["AP"], want_ap, atol=1e-9)
    np.testing.assert_allclose(m["AR"], 0.8, atol=1e-9)


def test_matching_prefers_best_oks_not_first(tmp_path):
    """COCOeval picks the highest-OKS GT, not the first above threshold."""
    A = _kpts(100, 100)
    B = _kpts(108, 100)  # close to A
    det = _kpts(106, 100)  # nearer to B than to A
    gt = {"images": [{"id": 0}],
          "annotations": [_gt_ann(0, A, ann_id=1), _gt_ann(0, B, ann_id=2)]}
    preds = [_det(0, det, 0.9)]
    gt_path, pr_path = tmp_path / "gt.json", tmp_path / "p.json"
    gt_path.write_text(json.dumps(gt))
    pr_path.write_text(json.dumps(preds))
    oks_a = compute_oks(gt["annotations"][0], det)
    oks_b = compute_oks(gt["annotations"][1], det)
    assert oks_b > oks_a > 0.5
    m = evaluate_coco_keypoints(gt_path, pr_path)
    # one TP out of two GTs at every threshold where oks_b >= t
    n_tp_thr = int((OKS_THRESHOLDS <= oks_b).sum())
    want_ar = (0.5 * n_tp_thr) / len(OKS_THRESHOLDS)
    np.testing.assert_allclose(m["AR"], want_ar, atol=1e-9)


def test_eval_perfect_predictions(tmp_path):
    rng = np.random.default_rng(0)
    gt = {"annotations": [], "images": [{"id": i} for i in range(3)]}
    preds = []
    for i in range(3):
        k = np.zeros((17, 3))
        k[:, 0] = rng.uniform(50, 500, 17)
        k[:, 1] = rng.uniform(50, 400, 17)
        k[:, 2] = 2
        gt["annotations"].append(_gt_ann(i, k, ann_id=i + 1))
        preds.append({"image_id": i, "category_id": 1,
                      "keypoints": k.reshape(-1).tolist(), "score": 0.9})
    gt_path = tmp_path / "gt.json"
    pr_path = tmp_path / "pred.json"
    gt_path.write_text(json.dumps(gt))
    pr_path.write_text(json.dumps(preds))
    m = evaluate_coco_keypoints(str(gt_path), str(pr_path))
    assert m["AP"] > 0.99 and m["AR"] > 0.99


def test_eval_degrades_with_noise(tmp_path):
    rng = np.random.default_rng(1)
    gt = {"annotations": [], "images": [{"id": 0}]}
    k = np.zeros((17, 3))
    k[:, 0] = rng.uniform(100, 200, 17)
    k[:, 1] = rng.uniform(100, 200, 17)
    k[:, 2] = 2
    gt["annotations"].append(_gt_ann(0, k, area=2500.0))
    noisy = k.copy()
    noisy[:, 0:2] += rng.normal(0, 15, (17, 2))
    preds = [{"image_id": 0, "category_id": 1,
              "keypoints": noisy.reshape(-1).tolist(), "score": 0.9}]
    gt_path = tmp_path / "gt.json"
    pr_path = tmp_path / "p.json"
    gt_path.write_text(json.dumps(gt))
    pr_path.write_text(json.dumps(preds))
    m = evaluate_coco_keypoints(str(gt_path), str(pr_path))
    assert m["AP"] < 0.99


def test_writer_schema(tmp_path):
    res = {7: [(np.array([0.8, 0.6]),
                np.concatenate([np.ones((2, 15, 2)) * 50,
                                np.ones((2, 15, 1)) * 0.9], -1))]}
    path = write_coco_results(res, str(tmp_path))
    anns = json.loads(open(path).read())
    assert len(anns) == 2
    assert len(anns[0]["keypoints"]) == 17 * 3
    assert anns[0]["image_id"] == 7


def test_area_range_boundaries_inclusive():
    """pycocotools ignores a GT only when area < lo or area > hi (BOTH
    bounds inclusive, cocoeval.py evaluateImg): a GT with area exactly
    96^2 counts in BOTH the medium and large ranges."""
    from snipper_tpu.eval.coco_eval import AREA_RANGES, _evaluate_img

    gt = _gt_ann(0, _kpts(50, 50), area=96.0 ** 2)
    for rng_name in ("medium", "large"):
        _, _, _, n_gt = _evaluate_img([gt], [], AREA_RANGES[rng_name], 20)
        assert n_gt == 1, rng_name
