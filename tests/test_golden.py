"""Golden-output regression: tiny-config forward outputs pinned to committed
values. Protects the numerics of the whole stack (backbone, posenc,
deformable sampling, refinement, heads) across refactors.

Regenerate after an INTENTIONAL numerics change:
    python tests/test_golden.py --regen
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.models.snipper import init_model

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_tiny.json")


def _compute():
    cfg = Config.tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(1234))
    rng = np.random.default_rng(99)
    x = jnp.asarray(rng.uniform(0, 1, (1, cfg.num_frames, cfg.input_height,
                                       cfg.input_width, 3)), jnp.float32)
    out = model.apply({"params": params}, x)
    # compact fingerprints: means/stds and a few fixed probe values
    k = np.asarray(out["pred_kpts2d"], np.float64)
    l = np.asarray(out["pred_logits"], np.float64)
    d = np.asarray(out["pred_depth"], np.float64)
    return {
        "logits_mean": float(l.mean()), "logits_std": float(l.std()),
        "kpts_mean": float(k.mean()), "kpts_std": float(k.std()),
        "depth_mean": float(d.mean()), "depth_std": float(d.std()),
        "probe_logit": float(l[0, 3, 1, 0]),
        "probe_kpt": float(k[0, 5, 2, 7, 1]),
        "probe_depth": float(d[0, 2, 0, 3, 0]),
    }


def test_golden_outputs():
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = _compute()
    for key, v in want.items():
        np.testing.assert_allclose(got[key], v, rtol=2e-4, atol=2e-5,
                                   err_msg=key)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(_compute(), f, indent=2)
        print(f"wrote {GOLDEN_PATH}")
