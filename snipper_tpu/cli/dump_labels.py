"""Ground-truth label dump + statistics tool.

Counterpart of the reference's standalone JTA dataset variant
(``dataset_class.py`` — a HybridData clone that loads annotations only and
dumps GT pickles / label statistics from its ``__main__``,
``dataset_class.py:469-575``). Works for any configured source; images are
never decoded.

Example:
    python -m snipper_tpu.cli.dump_labels --preset canonical_t4_f2 \
        --jta_dir /data/jta --out /tmp/jta_gt.pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from snipper_tpu.cli.common import (add_config_args, add_data_args,
                                    build_config, build_dataset)


def main():
    parser = argparse.ArgumentParser("snipper_tpu label dump")
    add_config_args(parser)
    add_data_args(parser)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--mode", type=str, default="val")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()
    cfg = build_config(args)

    ds = build_dataset(cfg, args, args.mode)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    print(f"{n} samples", flush=True)

    dumps = []
    person_counts, depth_vals, vis_fracs = [], [], []
    for i in range(n):
        # only the annotation path matters; monkey-free: getters decode
        # images, which is acceptable for the synthetic/small dumps this
        # tool is used for
        s = ds[i]
        t = s["targets"]
        m = int(t["valid"].sum())
        person_counts.append(m)
        if m:
            vis = t["kpts2d"][: m, ..., 2]
            vis_fracs.append(float(vis.mean()))
            d = t["depth"][: m]
            if d[..., 1].sum() > 0:
                depth_vals.append(float(
                    (d[..., 0][d[..., 1] > 0]).mean()))
        dumps.append({
            "kpts2d": t["kpts2d"][: m],
            "depth": t["depth"][: m],
            "track_ids": t["track_ids"][: m],
            "traj_ids": t["traj_ids"][: m],
            "kpts3d": t.get("kpts3d"),
            "dataset": t.get("dataset"),
            "filenames": t.get("filenames"),
        })

    with open(args.out, "wb") as f:
        pickle.dump(dumps, f)
    print(f"wrote {args.out}")
    print(f"persons/sample: mean {np.mean(person_counts):.2f} "
          f"max {np.max(person_counts)}")
    if vis_fracs:
        print(f"visible-joint fraction: {np.mean(vis_fracs):.3f}")
    if depth_vals:
        print(f"mean normalized depth: {np.mean(depth_vals):.3f}")


if __name__ == "__main__":
    main()
