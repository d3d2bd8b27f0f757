from snipper_tpu.eval.metrics import (  # noqa: F401
    compute_mpjpe,
    eval_kpts2d_pckh,
    eval_pose3d,
    matcher_pose3d,
    transform_pts,
    unproject,
)
