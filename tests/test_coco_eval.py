"""COCO OKS evaluation sanity tests."""

import json

import numpy as np

from snipper_tpu.eval.coco_eval import (compute_oks, evaluate_coco_keypoints,
                                        write_coco_results)


def _gt_ann(image_id, kpts, area=10000.0, ann_id=1):
    return {"image_id": image_id, "id": ann_id, "category_id": 1,
            "keypoints": kpts.reshape(-1).tolist(), "area": area,
            "num_keypoints": int((kpts[:, 2] > 0).sum())}


def test_oks_perfect_is_one():
    k = np.zeros((17, 3))
    k[:, 0] = np.arange(17) * 10
    k[:, 1] = 50
    k[:, 2] = 2
    assert abs(compute_oks(k, 10000.0, k) - 1.0) < 1e-9


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
