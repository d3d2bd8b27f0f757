"""Tests of the PoseTrack AP/MOT evaluation harness on crafted scenarios."""

import numpy as np

from snipper_tpu.eval.posetrack_eval import (Frame, MOTAccumulator,
                                             evaluate_ap, evaluate_tracking,
                                             voc_ap)

J = 15


def _gt_frame(positions, ids, seq="s0"):
    n = len(positions)
    kpts = np.zeros((n, J, 3))
    for i, (x, y) in enumerate(positions):
        kpts[i, :, 0] = x + np.arange(J)
        kpts[i, :, 1] = y
        kpts[i, :, 2] = 1.0
    return Frame(kpts, np.asarray(ids), head_sizes=np.full(n, 50.0), seq=seq)


def _pred_from_gt(gt, ids=None, noise=0.0, score=0.9):
    kpts = gt.kpts.copy()
    kpts[:, :, 0:2] += noise
    kpts[:, :, 2] = score
    return Frame(kpts, np.asarray(ids if ids is not None else gt.track_ids),
                 seq=gt.seq)


def test_perfect_predictions_ap_100():
    gts = [_gt_frame([(100, 100), (300, 200)], [0, 1]) for _ in range(4)]
    preds = [_pred_from_gt(g) for g in gts]
    m = evaluate_ap(gts, preds)
    assert np.nanmin(m["ap"][:J]) == 100.0
    assert m["ap"][J] == 100.0


def test_missed_and_false_positive_reduce_ap():
    gts = [_gt_frame([(100, 100), (300, 200)], [0, 1])]
    # only one person predicted + one spurious far detection
    p = _pred_from_gt(gts[0])
    far = p.kpts.copy()
    far[1, :, 0:2] += 5000
    pred = Frame(np.concatenate([p.kpts[:1], far[1:2]]),
                 np.array([0, 7]), seq="s0")
    m = evaluate_ap(gts, [pred])
    assert m["ap"][J] < 100.0
    assert m["rec"][J] <= 50.0 + 1e-6


def test_tracking_perfect_mota_100():
    gts, preds = [], []
    for t in range(5):
        g = _gt_frame([(100 + 2 * t, 100), (300, 200 + t)], [0, 1])
        gts.append(g)
        preds.append(_pred_from_gt(g))
    m = evaluate_tracking(gts, preds)
    assert abs(m["mota"][J] - 100.0) < 1e-6


def test_tracking_id_switch_penalized():
    gts, preds = [], []
    for t in range(4):
        g = _gt_frame([(100, 100), (300, 200)], [0, 1])
        gts.append(g)
        # swap predicted identities halfway
        ids = [5, 6] if t < 2 else [6, 5]
        preds.append(_pred_from_gt(g, ids=ids))
    m_clean = evaluate_tracking(gts, [_pred_from_gt(g) for g in gts])
    m_switch = evaluate_tracking(gts, preds)
    assert m_switch["mota"][J] < m_clean["mota"][J]


def test_mot_accumulator_counts():
    acc = MOTAccumulator()
    d = np.zeros((1, 1))
    acc.update([1], [9], d)          # match
    acc.update([1], [9], d)          # keep
    acc.update([1], [8], d)          # switch
    acc.update([1], [], np.zeros((1, 0)))   # miss
    acc.update([], [8], np.zeros((0, 1)))   # false positive
    m = acc.metrics
    assert acc.num_switches == 1
    assert acc.num_miss == 1
    assert acc.num_fp == 1
    assert acc.num_gt == 4


def test_voc_ap_simple():
    # one TP then one FP over 1 GT -> precision 1 at recall 1
    rec = np.array([1.0, 1.0])
    prec = np.array([1.0, 0.5])
    assert abs(voc_ap(rec, prec) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# CLEAR-MOT golden vectors (hand-derived from motmetrics semantics:
# persistent correspondences carried over gaps, continuation preferred over
# globally-cheaper Hungarian re-assignment, SWITCH counted when a known
# object re-matches a different hypothesis; MOTP = (1 - avg_dist) * 100 per
# reference poseval_old/evaluateTracking.py:168)
# ---------------------------------------------------------------------------
def test_mot_golden_carry_forward_switch_across_gap():
    """g1 matches p1, disappears from predictions for one frame, then
    matches p2: the retained g1->p1 correspondence makes frame 4 a SWITCH.
    Without carry-forward MOTA would be 75; motmetrics says 50."""
    from snipper_tpu.eval.posetrack_eval import MOTAccumulator

    acc = MOTAccumulator()
    acc.update(["g1"], ["p1"], np.array([[0.1]]))          # MATCH
    acc.update(["g1"], [], np.zeros((1, 0)))               # MISS (corr kept)
    acc.update(["g1"], ["p1"], np.array([[0.2]]))          # MATCH (same id)
    acc.update(["g1"], ["p2"], np.array([[0.1]]))          # SWITCH
    m = acc.metrics
    assert acc.num_switches == 1
    assert acc.num_matches == 3
    assert acc.num_miss == 1 and acc.num_fp == 0
    np.testing.assert_allclose(m["mota"], 50.0)
    np.testing.assert_allclose(m["motp"], (1 - (0.1 + 0.2 + 0.1) / 3) * 100)


def test_mot_golden_continuation_beats_cheaper_hungarian():
    """Existing correspondences are kept when still valid even when a global
    re-assignment would be cheaper (motmetrics preferential matching)."""
    from snipper_tpu.eval.posetrack_eval import MOTAccumulator

    nan = np.nan
    acc = MOTAccumulator()
    acc.update(["g1", "g2"], ["p1", "p2"],
               np.array([[0.4, nan], [0.3, 0.45]]))
    # frame 2: Hungarian alone would pick g1-p2 + g2-p1 (0.36 total), but
    # both previous pairs are still valid and must be continued
    acc.update(["g1", "g2"], ["p1", "p2"],
               np.array([[0.4, 0.35], [0.01, 0.45]]))
    m = acc.metrics
    assert acc.num_switches == 0
    assert acc.num_matches == 4
    np.testing.assert_allclose(m["mota"], 100.0)
    np.testing.assert_allclose(
        m["motp"], (1 - (0.4 + 0.45 + 0.4 + 0.45) / 4) * 100)


def test_mot_golden_duplicate_carried_correspondence():
    """Two GTs can end up carrying the SAME pr_id (g1 matches p1, then g1
    vanishes while g2 matches p1, then both reappear): the prediction must
    serve at most one GT. Before the uniqueness check this double-counted
    the match (num_matches 4, num_fp -1, MOTA 125 > 100)."""
    from snipper_tpu.eval.posetrack_eval import MOTAccumulator

    acc = MOTAccumulator()
    acc.update(["g1"], ["p1"], np.array([[0.1]]))   # g1-p1
    acc.update(["g2"], ["p1"], np.array([[0.1]]))   # g2-p1 (g1->p1 carried)
    # both GTs present, one prediction: first in GT order keeps the carry,
    # the other is a miss (no free prediction left for the Hungarian step)
    acc.update(["g1", "g2"], ["p1"], np.array([[0.1], [0.1]]))
    m = acc.metrics
    assert acc.num_matches == 3
    assert (acc.num_miss, acc.num_fp, acc.num_switches) == (1, 0, 0)
    np.testing.assert_allclose(m["mota"], 75.0)
    np.testing.assert_allclose(m["motp"], 90.0)


def test_mot_golden_miss_fp_counting():
    from snipper_tpu.eval.posetrack_eval import MOTAccumulator

    nan = np.nan
    acc = MOTAccumulator()
    # g1 matched by p1; g2 missed; p9 a false positive
    acc.update(["g1", "g2"], ["p1", "p9"],
               np.array([[0.2, nan], [nan, nan]]))
    m = acc.metrics
    assert (acc.num_matches, acc.num_miss, acc.num_fp) == (1, 1, 1)
    np.testing.assert_allclose(m["mota"], 0.0)
    np.testing.assert_allclose(m["motp"], 80.0)
    np.testing.assert_allclose(m["pre"], 50.0)
    np.testing.assert_allclose(m["rec"], 50.0)


def test_mot_golden_end_to_end_single_joint():
    """The carry-forward golden scenario driven through assign_frame +
    evaluate_tracking with real Frame geometry (1 joint, head_size-scaled
    distances), under the two reference tracking quirks now reproduced:

    - the LAST frame of the sequence is dropped from tracking
      (evaluateTracking.py:69 ``imgidxs[:-1]``) — so a 5th frame is added
      to keep the frame-4 SWITCH inside the accumulation window;
    - the pred-empty frame 2 contributes the reference's DUMMY event
      (assignGTmulti else-branch, eval_helpers.py:624-637): gt id 0 vs
      pred id 0 at nan distance = 1 object + 1 miss + 1 FP — NOT a miss
      for the real GT id.

    Hand count over frames 1-4: objects 4 (3 real + 1 dummy), matches 3
    (0.1, 0.2, 0.1), miss 1 (dummy), FP 1 (dummy), switches 1 (frame 4,
    p7 -> p8 across the kept correspondence).
    MOTA = (1 - (1+1+1)/4) * 100 = 25; MOTP = (1 - 0.4/3) * 100."""
    from snipper_tpu.eval.posetrack_eval import Frame, evaluate_tracking

    def gt_frame(x):
        k = np.array([[[x, 0.0, 2.0]]])
        return Frame(k, np.array([1]), head_sizes=np.array([1.0]), seq="s")

    def pr_frame(x, tid):
        k = np.array([[[x, 0.0, 0.9]]])
        return Frame(k, np.array([tid]), seq="s")

    empty_pr = Frame(np.zeros((0, 1, 3)), np.zeros(0, np.int64), seq="s")
    gts = [gt_frame(0.0)] * 5
    prs = [pr_frame(0.1, 7), empty_pr, pr_frame(0.2, 7), pr_frame(0.1, 8),
           pr_frame(0.1, 8)]
    out = evaluate_tracking(gts, prs)
    np.testing.assert_allclose(out["mota"][0], 25.0)
    np.testing.assert_allclose(out["motp"][0],
                               (1 - (0.1 + 0.2 + 0.1) / 3) * 100)


def test_tracking_last_frame_of_sequence_is_dropped():
    """Reference quirk (evaluateTracking.py:69): a defect confined to the
    FINAL frame of a sequence is invisible to MOTA. An ID switch in frame
    3 of 3 scores the same 100.0 as a clean run; moving the switch to
    frame 2 of 3 is penalized: 4 objects (2 kept frames x 2), 4 matches,
    2 switches (an identity SWAP switches BOTH GTs)
    -> MOTA = (1 - 2/4) * 100 = 50."""
    gts = [_gt_frame([(100, 100), (300, 200)], [0, 1]) for _ in range(3)]

    def preds(switch_at):
        return [_pred_from_gt(g, ids=([5, 6] if t < switch_at else [6, 5]))
                for t, g in enumerate(gts)]

    m_last = evaluate_tracking(gts, preds(switch_at=2))
    np.testing.assert_allclose(m_last["mota"][J], 100.0)
    m_mid = evaluate_tracking(gts, preds(switch_at=1))
    np.testing.assert_allclose(m_mid["mota"][J], 50.0)


def test_occlusion_gap_reentry_same_id_no_switch():
    """CLEAR-MOT: a correspondence carried over an occlusion gap must NOT
    count a switch at re-entry with the SAME hypothesis id — only a
    DIFFERENT id does. Gap of 2 frames; hand count: 5 objects, 3 matches,
    2 misses, 0 FP, 0 switches -> MOTA = (1 - 2/5) * 100 = 60."""
    from snipper_tpu.eval.posetrack_eval import MOTAccumulator

    acc = MOTAccumulator()
    acc.update(["g"], ["p"], np.array([[0.1]]))            # MATCH
    acc.update(["g"], [], np.zeros((1, 0)))                # MISS (occluded)
    acc.update(["g"], [], np.zeros((1, 0)))                # MISS
    acc.update(["g"], ["p"], np.array([[0.1]]))            # MATCH, no switch
    acc.update(["g"], ["p"], np.array([[0.1]]))            # MATCH
    assert acc.num_switches == 0
    assert (acc.num_matches, acc.num_miss, acc.num_fp) == (3, 2, 0)
    np.testing.assert_allclose(acc.metrics["mota"], 60.0)


def test_motp_zero_not_nan_when_joint_has_no_detections():
    """Reference evaluateTracking.py:157-160: a joint with GT but zero
    detections gets MOTP 0.0 — INCLUDED in the joint mean (not NaN /
    excluded). Two joints: joint 0 matches perfectly (MOTP 100), joint 1
    never matches (MOTP 0.0) -> mean 50, not 100."""
    k_gt = np.zeros((1, 2, 3))
    k_gt[0, :, 0] = [100.0, 200.0]
    k_gt[0, :, 1] = 100.0
    k_gt[0, :, 2] = 1.0
    k_pr = k_gt.copy()
    k_pr[0, 1, 0] += 5000.0          # joint 1 predicted far away
    k_pr[0, :, 2] = 0.9
    gts = [Frame(k_gt, np.array([1]), head_sizes=np.array([50.0]), seq="s")
           for _ in range(3)]
    prs = [Frame(k_pr, np.array([1]), seq="s") for _ in range(3)]
    m = evaluate_tracking(gts, prs)
    np.testing.assert_allclose(m["motp"][0], 100.0)
    np.testing.assert_allclose(m["motp"][1], 0.0)
    np.testing.assert_allclose(m["motp"][2], 50.0)


def test_pckh_golden_vectors():
    """PCKh table (reference poseval_old/evaluatePCKh.py): hand-derived
    values — perfect predictions give 100, a prediction displaced beyond
    0.5*head_size on HALF the joints of one of two people gives 75 for
    those joints, and missing predictions give 0."""
    from snipper_tpu.eval.posetrack_eval import evaluate_pckh

    gt = _gt_frame([(0, 0), (300, 300)], [1, 2])
    # perfect
    perfect = _pred_from_gt(gt)
    out = evaluate_pckh([gt], [perfect])
    np.testing.assert_allclose(out["pckh"], 100.0)

    # person 2's first half of joints displaced by 40 px: head_size=50 ->
    # threshold 25, so those joints are wrong for one of the two people:
    # per-joint pckh = 1 correct / 2 GT = 50 for the first half, 100 rest
    bad = _pred_from_gt(gt)
    k = bad.kpts.copy()
    k[1, : J // 2, 0] += 40.0
    bad = Frame(k, bad.track_ids, seq=gt.seq)
    out = evaluate_pckh([gt], [bad])
    want = np.full(J, 100.0)
    want[: J // 2] = 50.0
    np.testing.assert_allclose(out["pckh"][:J], want)
    np.testing.assert_allclose(out["pckh"][J], want.mean())

    # no predictions at all -> 0 everywhere
    empty = Frame(np.zeros((0, J, 3)), np.zeros(0, np.int64), seq=gt.seq)
    out = evaluate_pckh([gt], [empty])
    np.testing.assert_allclose(out["pckh"], 0.0)


def test_assign_frame_dummy_mot_without_predictions():
    """Reference-faithful pred-empty branch (assignGTmulti else-branch,
    eval_helpers.py:624-637): EVERY joint's MOT container gets the dummy
    (gt id 0, pred id 0, nan distance) pair — one object + one miss + one
    FP per joint — regardless of the real GT annotation pattern. The
    per-joint GT counts (n_gt, used by AP recall) still reflect the real
    annotations."""
    from snipper_tpu.eval.posetrack_eval import assign_frame

    kpts = np.zeros((1, J, 3))
    kpts[0, 0] = [10.0, 10.0, 1.0]
    gt = Frame(kpts, np.array([4]), head_sizes=np.array([50.0]))
    pred = Frame(np.zeros((0, J, 3)), np.zeros(0, np.int64))
    _, _, n_gt, mot = assign_frame(gt, pred)
    assert list(n_gt) == [1] + [0] * (J - 1)
    for j in range(J):
        assert mot[j]["gt_ids"] == [0] and mot[j]["pr_ids"] == [0]
        assert np.isnan(mot[j]["dist"]).all()


def test_assign_frame_dummy_mot_without_gt_and_fp_scores():
    """Zero GT poses: the MOT containers carry the reference dummy pair,
    while AP still records the present prediction joints as false
    positives (assignGTmulti's no-GT branch, eval_helpers.py:614-623)."""
    from snipper_tpu.eval.posetrack_eval import assign_frame

    k = np.full((1, J, 3), np.nan)
    k[0, 2] = [5.0, 5.0, 0.9]
    pred = Frame(k, np.array([1]))
    gt = Frame(np.zeros((0, J, 3)), np.zeros(0, np.int64))
    scores, labels, _, mot = assign_frame(gt, pred)
    assert scores[2] == [0.9] and labels[2] == [False]
    assert all(scores[j] == [] for j in range(J) if j != 2)
    for j in range(J):
        assert mot[j]["gt_ids"] == [0] and mot[j]["pr_ids"] == [0]


def test_evaluate_posetrack18_drops_gt_empty_frames(tmp_path):
    """poseval cleanupData parity (eval_helpers.py:281-289): frames whose
    GT has no annotations are removed together with their predictions —
    a prediction on such a frame must not count as a false positive."""
    import json as json_mod
    import os

    from snipper_tpu.eval.posetrack_eval import evaluate_posetrack18

    def kp(x, vis_or_score):
        k = np.zeros((J, 3))
        k[:, 0] = x + np.arange(J)
        k[:, 1] = 100.0
        k[:, 2] = vis_or_score
        return k.reshape(-1).tolist()

    # two annotated frames (0, 2) so one survives tracking's last-frame
    # drop (evaluateTracking.py:69); frame 1 is GT-empty
    gt = {"images": [{"id": 0}, {"id": 1}, {"id": 2}],
          "annotations": [{"image_id": 0, "keypoints": kp(100, 1.0),
                           "track_id": 0, "bbox_head": [0, 0, 30, 40]},
                          {"image_id": 2, "keypoints": kp(100, 1.0),
                           "track_id": 0, "bbox_head": [0, 0, 30, 40]}]}
    pred = {"images": [{"id": 0}, {"id": 1}, {"id": 2}],
            "annotations": [
                {"image_id": 0, "keypoints": kp(100, 0.9), "track_id": 0},
                {"image_id": 2, "keypoints": kp(100, 0.9), "track_id": 0},
                # spurious prediction on the GT-empty frame 1
                {"image_id": 1, "keypoints": kp(500, 0.9), "track_id": 5}]}
    os.makedirs(tmp_path / "gt")
    os.makedirs(tmp_path / "pred")
    for d, name, data in ((tmp_path / "gt", "v.json", gt),
                          (tmp_path / "pred", "v.json", pred)):
        with open(os.path.join(d, name), "w") as f:
            json_mod.dump(data, f)
    out = evaluate_posetrack18(str(tmp_path / "gt"), str(tmp_path / "pred"))
    np.testing.assert_allclose(out["ap"]["ap"][J], 100.0)
    np.testing.assert_allclose(out["tracking"]["mota"][J], 100.0)
    np.testing.assert_allclose(out["pckh"]["pckh"][J], 100.0)


def test_writer_aligns_overlapping_snippets_by_traj_id(tmp_path):
    """Two snippets cover the same frame with DIFFERENT person sets
    ({3,7} then {7}): the written annotations must average per traj id —
    positional slot averaging (the reference's fixed-ordered-ids shortcut,
    hybrid_dataloader.py:1830-1833) would silently mix person 3 into
    person 7."""
    import json as json_mod

    from snipper_tpu.eval.posetrack_writer import write_val_results

    K = 15
    s = np.full((K, 1), 0.5)

    def entry(filename, traj_ids, xs):
        kp = np.stack([np.full((K, 2), float(x)) for x in xs])
        return {"video_name": "v.json", "filename": filename,
                "traj_ids": np.asarray(traj_ids),
                "pred_kpts": kp,
                "pred_kpt_scores": np.repeat(s[None], len(xs), 0)}

    entries = [entry("f0.jpg", [3, 7], [10.0, 20.0]),
               entry("f0.jpg", [7], [40.0])]
    posetrack_data = {"categories": [],
                      "v.json": [{"info": {"id": 0}, "filename": "f0.jpg"}]}
    write_val_results({"v.json": entries}, posetrack_data, str(tmp_path))
    with open(tmp_path / "v.json") as f:
        data = json_mod.load(f)
    anns = {a["track_id"]: a for a in data["annotations"]}
    assert set(anns) == {3, 7}
    k3 = np.asarray(anns[3]["keypoints"]).reshape(-1, 3)
    k7 = np.asarray(anns[7]["keypoints"]).reshape(-1, 3)
    # track 3 comes from snippet A alone; track 7 is the equal-score
    # average of 20 and 40
    np.testing.assert_allclose(k3[k3[:, 2] > 0, 0], 10.0)
    np.testing.assert_allclose(k7[k7[:, 2] > 0, 0], 30.0)


def test_standalone_tracking_drops_gt_empty_frames():
    """evaluate_tracking applies the same poseval cleanup protocol as
    evaluate_posetrack18: a prediction on a frame with zero GT poses is
    ignored entirely (the frame is removed before scoring), not an FP.
    Two annotated frames so one survives the last-frame drop."""
    gt = _gt_frame([(100, 100)], [1])
    empty_gt = Frame(np.zeros((0, J, 3)), np.zeros(0, np.int64), seq="s0")
    stray = _pred_from_gt(_gt_frame([(400, 400)], [9]))
    m = evaluate_tracking([gt, empty_gt, gt],
                          [_pred_from_gt(gt), stray, _pred_from_gt(gt)])
    np.testing.assert_allclose(m["mota"][J], 100.0)


def test_gt_poses_without_points_are_cleaned_then_frame_goes_dummy():
    """cleanupData order (eval_helpers.py:281-296): GT-empty FRAMES are
    dropped first, THEN poses without points are removed — so a frame
    whose every GT pose has zero annotated joints survives as GT-empty
    and takes the dummy-MOT branch (1 object + 1 miss + 1 FP per joint).
    Hand count per joint over the 2 kept frames: frame 0 clean match
    (1 obj, 1 match), frame 1 dummy (1 obj, 1 miss, 1 FP); frame 2
    dropped as last-of-sequence. MOTA = (1 - 2/2) * 100 = 0."""
    gt = _gt_frame([(100, 100)], [1])
    unannotated = Frame(np.zeros((1, J, 3)), np.array([1]),
                        head_sizes=np.array([50.0]), seq="s0")
    m = evaluate_tracking([gt, unannotated, gt],
                          [_pred_from_gt(gt)] * 3)
    np.testing.assert_allclose(m["mota"][J], 0.0)


def test_preemption_single_sigint_after_sigterm_does_not_raise():
    """One Ctrl-C AFTER a SIGTERM preemption must not abort the
    preemption checkpoint save; only a SECOND SIGINT escalates."""
    import signal

    import pytest

    from snipper_tpu.train.preemption import PreemptionGuard

    guard = PreemptionGuard()
    try:
        guard._handle(signal.SIGTERM, None)
        assert guard.should_stop
        guard._handle(signal.SIGINT, None)     # first Ctrl-C: flag only
        with pytest.raises(KeyboardInterrupt):
            guard._handle(signal.SIGINT, None)  # second: escalate
    finally:
        guard.restore()
