"""Cross-validate eval/posetrack_eval.py against the reference's ACTUAL
vendored poseval code (VERDICT r4 #3).

The same synthetic scenarios are fed to (a) our harness as Frame lists and
(b) the reference's `assignGTmulti` + `evaluateAP.computeMetrics` +
`evaluatePCKh` running in a subprocess on the read-only reference tree
(`tests/_poseval_oracle_worker.py`), and the per-joint AP / precision /
recall / PCKh tables are pinned equal. The MOTA leg cannot be oracled
(motmetrics is not installed); its semantics are pinned by the hand-counted
CLEAR-MOT battery in test_posetrack_eval.py instead.

Scenario constraints that keep the two harnesses comparable (documented
reference behaviors, not test shortcuts):
- joint ids 0..13 only — the harness's Joint().count == 14 excludes
  head_top from every loop (eval_helpers.py:14);
- every frame keeps >= 1 GT pose — GT-empty FRAMES are removed by the
  reference's cleanupData before assignGTmulti ever sees them
  (eval_helpers.py:281-289), which our _drop_gt_empty reproduces; feeding
  the oracle such frames directly would exercise a state the full
  reference pipeline cannot reach;
- all prediction scores distinct — computeRPC's argsort()[::-1] reverses
  tie order vs our stable descending sort (eval_helpers.py:180), an
  ordering-dependent AP difference on exact ties;
- for the PCKh leg, predictions are GT-ALIGNED per frame (pred i is GT
  i's hypothesis, extras appended after) — computeDist pairs rects BY
  POSITION (evaluatePCKh.py:24), assuming pre-aligned inputs.
"""

import json
import math
import os
import subprocess
import sys

import numpy as np
import pytest

from snipper_tpu.eval.posetrack_eval import (Frame, evaluate_ap,
                                             evaluate_pckh)

J = 14
REFERENCE = "/root/reference/datasets/poseval_old"
WORKER = os.path.join(os.path.dirname(__file__), "_poseval_oracle_worker.py")


def _pose(track_id, x0, y0, joint_ids, head=None, scores=None,
          offsets=None):
    pts = []
    for n, j in enumerate(joint_ids):
        dx, dy = (offsets or {}).get(j, (0.0, 0.0))
        p = {"id": int(j), "x": float(x0 + 12.0 * j + dx),
             "y": float(y0 + dy)}
        if scores is not None:
            p["score"] = float(scores[n])
        pts.append(p)
    pose = {"track_id": int(track_id), "points": pts}
    if head is not None:
        pose["head"] = [float(v) for v in head]
    return pose


HEAD = [0.0, 0.0, 30.0, 40.0]  # head size = 0.6 * 50 = 30 -> thresh 15 px


def scenario_aligned():
    """AP + PCKh scenario: aligned noisy predictions, per-joint presence
    gaps, displaced joints, one far false positive, one zero-point GT
    pose, two sequences."""
    rng = np.random.default_rng(5)
    frames = []
    score = iter(np.linspace(0.99, 0.01, 200))  # distinct scores
    for seq_id, seq_name in ((0, "seq_a"), (1, "seq_b")):
        for t in range(3):
            gt, pr = [], []
            # person 1: full joints; prediction jittered within threshold
            # except joints 3 and 7 (displaced by 20 px > 15 px thresh)
            gt.append(_pose(1, 100, 100 + 5 * t, range(J), head=HEAD))
            pr.append(_pose(1, 100, 100 + 5 * t, range(J),
                            scores=[next(score) for _ in range(J)],
                            offsets={j: tuple(rng.uniform(-4, 4, 2))
                                     for j in range(J)}
                            | {3: (20.0, 0.0), 7: (0.0, 20.0)}))
            # person 2: only even joints annotated; prediction misses
            # joints 0 and 2 entirely
            even = [j for j in range(J) if j % 2 == 0]
            gt.append(_pose(2, 400, 300 + 5 * t, even, head=HEAD))
            pr.append(_pose(2, 400, 300 + 5 * t, [j for j in even
                                                  if j not in (0, 2)],
                            scores=[next(score)
                                    for _ in range(len(even) - 2)]))
            if t == 1:
                # a GT pose with zero annotated points: removed by our
                # cleanup, kept-but-inert in assignGTmulti (hasGT all 0)
                gt.append(_pose(3, 700, 700, [], head=HEAD))
                pr.append(_pose(3, 700, 700, [9],
                                scores=[next(score)]))
            if t == 2:
                # far false positive appended AFTER the aligned block
                pr.append(_pose(9, 2000, 2000, range(0, J, 3),
                                scores=[next(score)
                                        for _ in range(len(range(0, J, 3)))
                                        ]))
            frames.append({"seq_id": seq_id, "seq_name": seq_name,
                           "gt": gt, "pr": pr})
    return {"frames": frames, "pckh": True}


def scenario_adversarial_ap():
    """AP-only scenario (unaligned orders break computeDist's positional
    pairing, so pckh=False): shuffled prediction order, missed people,
    contended best-match (two GTs near one prediction), a frame with
    more predictions than GTs, a pred pose with zero points, and a joint
    (13) that has GT but never a prediction (pins the 0.0-not-NaN row)."""
    frames = []
    score = iter(np.linspace(0.97, 0.03, 200))
    ids = [j for j in range(J) if j != 13]
    for t in range(4):
        gt = [
            _pose(1, 100, 100, range(J), head=HEAD),   # incl. joint 13
            _pose(2, 160, 100, ids, head=HEAD),        # close to person 1
            _pose(3, 900, 500, ids, head=HEAD),
        ]
        pr = [
            # best-match contention: halfway between persons 1 and 2
            _pose(21, 130, 100, ids,
                  scores=[next(score) for _ in ids]),
            _pose(23, 900, 500, ids,
                  scores=[next(score) for _ in ids],
                  offsets={j: (3.0, -2.0) for j in ids}),
        ]
        if t == 0:
            pr.append({"track_id": 44, "points": []})  # zero-point pred
        if t == 2:
            pr = pr + [_pose(40 + k, 3000 + 50 * k, 3000, ids[:4],
                             scores=[next(score) for _ in range(4)])
                       for k in range(3)]              # n_pr > n_gt
        if t == 3:
            pr = pr[:1]                                 # missed people
        frames.append({"seq_id": 0, "seq_name": "adv", "gt": gt, "pr": pr})
    return {"frames": frames, "pckh": False}


def _to_frames(scenario):
    gt_frames, pr_frames = [], []
    for fr in scenario["frames"]:
        def build(poses, is_gt):
            n = len(poses)
            kpts = np.full((n, J, 3), np.nan if not is_gt else 0.0)
            if not is_gt:
                kpts[:, :, 2] = 0.0
            heads = np.zeros(n)
            tids = np.zeros(n, np.int64)
            for i, p in enumerate(poses):
                tids[i] = p["track_id"]
                if is_gt:
                    x1, y1, x2, y2 = p["head"]
                    heads[i] = 0.6 * math.hypot(x2 - x1, y2 - y1)
                for pt in p["points"]:
                    kpts[i, pt["id"], 0] = pt["x"]
                    kpts[i, pt["id"], 1] = pt["y"]
                    kpts[i, pt["id"], 2] = (1.0 if is_gt
                                            else pt["score"])
            return Frame(kpts, tids, head_sizes=heads if is_gt else None,
                         seq=fr["seq_name"])

        gt_frames.append(build(fr["gt"], True))
        pr_frames.append(build(fr["pr"], False))
    return gt_frames, pr_frames


def _run_oracle(scenario, tmp_path):
    spath = str(tmp_path / "scenario.json")
    opath = str(tmp_path / "oracle.json")
    with open(spath, "w") as f:
        json.dump(scenario, f)
    res = subprocess.run([sys.executable, WORKER, spath, opath],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, (res.stdout, res.stderr)
    with open(opath) as f:
        return json.load(f)


def _assert_rows_equal(ours, ref, name):
    ref = np.array([np.nan if v is None else v for v in ref], np.float64)
    assert ours.shape == ref.shape, (name, ours, ref)
    both_nan = np.isnan(ours) & np.isnan(ref)
    np.testing.assert_allclose(np.where(both_nan, 0.0, ours),
                               np.where(both_nan, 0.0, ref),
                               rtol=1e-9, atol=1e-9,
                               err_msg=f"{name}: ours={ours} ref={ref}")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_ap_and_pckh_match_reference_poseval_aligned(tmp_path):
    scenario = scenario_aligned()
    oracle = _run_oracle(scenario, tmp_path)
    gt_frames, pr_frames = _to_frames(scenario)
    ours_ap = evaluate_ap(gt_frames, pr_frames)
    for key in ("ap", "pre", "rec"):
        _assert_rows_equal(ours_ap[key], oracle[key], key)
    ours_pckh = evaluate_pckh(gt_frames, pr_frames)
    _assert_rows_equal(ours_pckh["pckh"], oracle["pckh"], "pckh")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_ap_matches_reference_poseval_adversarial(tmp_path):
    scenario = scenario_adversarial_ap()
    oracle = _run_oracle(scenario, tmp_path)
    gt_frames, pr_frames = _to_frames(scenario)
    ours = evaluate_ap(gt_frames, pr_frames)
    for key in ("ap", "pre", "rec"):
        _assert_rows_equal(ours[key], oracle[key], key)
    # the no-prediction joint 13 is 0.0 (included in the mean), not NaN
    assert ours["ap"][13] == 0.0 and oracle["ap"][13] == 0.0
