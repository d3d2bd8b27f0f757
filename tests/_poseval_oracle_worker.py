"""Subprocess worker: run the reference's ACTUAL vendored poseval harness
(`/root/reference/datasets/poseval_old/`) on a synthetic scenario and dump
its AP / precision / recall / PCKh tables.

VERDICT r4 #3: `snipper_tpu/eval/posetrack_eval.py` reimplements
`assignGTmulti` + `evaluateAP`/`evaluatePCKh`; until now it was pinned only
by hand-derived goldens, so tie-breaking or protocol drift in the
reimplementation would go unnoticed. The AP/PCKh legs are numpy-only and
runnable here (unlike the MOTA leg, which needs the uninstalled
`motmetrics`). The reference modules are imported at runtime from the
read-only tree — never copied; `shapely` (used only by the ignore-region
helpers this path never calls, eval_helpers.py:299-352) is stubbed, the
same pattern as `_reference_oracle_worker.py`'s torchvision stub.

Input scenario JSON (argv[1]):
    {"frames": [{"seq_id": int, "seq_name": str,
                 "gt": [{"track_id": int, "head": [x1, y1, x2, y2],
                         "points": [{"id": j, "x": x, "y": y}, ...]}],
                 "pr": [{"track_id": int,
                         "points": [{"id": j, "x": x, "y": y,
                                     "score": s}, ...]}]}]}
Joint ids must stay in 0..13 (the harness's Joint().count == 14;
head_top id 14 is excluded from its AP loops, eval_helpers.py:14).

Output (argv[2]): JSON {"ap": [...15], "pre": [...], "rec": [...],
"pckh": [...15]} — 14 per-joint rows + the total row, NaN as null.
"""

import json
import sys
import types


def _stub_shapely():
    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")

    def _unused(*a, **k):  # pragma: no cover - never called on this path
        raise RuntimeError("shapely stub: ignore-region helpers not in use")

    geometry.Point = _unused
    geometry.Polygon = _unused
    shapely.geometry = geometry
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = geometry


def _rect(pose, is_gt):
    point = []
    for p in pose["points"]:
        entry = {"id": [p["id"]], "x": [p["x"]], "y": [p["y"]]}
        if not is_gt:
            entry["score"] = [p["score"]]
        point.append(entry)
    rect = {"track_id": [pose["track_id"]],
            "annopoints": [{"point": point}]}
    if is_gt:
        x1, y1, x2, y2 = pose["head"]
        rect.update({"x1": [x1], "y1": [y1], "x2": [x2], "y2": [y2]})
    return rect


def main():
    scenario_path, out_path = sys.argv[1], sys.argv[2]
    with open(scenario_path) as f:
        scenario = json.load(f)

    _stub_shapely()
    sys.path.insert(0, "/root/reference/datasets")
    from poseval_old import eval_helpers
    # evaluatePCKh.py does a TOP-LEVEL `import eval_helpers`; alias the
    # package module so the legacy import resolves without a second copy
    sys.modules.setdefault("eval_helpers", eval_helpers)
    from poseval_old import evaluatePCKh
    from poseval_old.evaluateAP import computeMetrics

    gt_frames, pr_frames = [], []
    for fr in scenario["frames"]:
        gt_frames.append({"seq_id": fr["seq_id"],
                          "seq_name": fr["seq_name"],
                          "annorect": [_rect(p, True) for p in fr["gt"]]})
        pr_frames.append({"seq_id": fr["seq_id"],
                          "seq_name": fr["seq_name"],
                          "annorect": [_rect(p, False) for p in fr["pr"]]})

    scores, labels, n_gt, _ = eval_helpers.assignGTmulti(
        gt_frames, pr_frames, distThresh=0.5)
    ap, pre, rec = computeMetrics(scores, labels, n_gt)
    out = {"ap": ap.flatten().tolist(), "pre": pre.flatten().tolist(),
           "rec": rec.flatten().tolist()}

    if scenario.get("pckh", True):
        # computeDist pairs GT rect i with PRED rect i (evaluatePCKh.py:24)
        # — the scenario must provide aligned orderings for this leg
        pck = evaluatePCKh.evaluatePCKh(gt_frames, pr_frames)
        out["pckh"] = pck.flatten().tolist()

    with open(out_path, "w") as f:
        json.dump(out, f)
    print("poseval oracle OK", flush=True)


if __name__ == "__main__":
    main()
