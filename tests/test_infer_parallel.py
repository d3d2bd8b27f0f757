"""Data-parallel inference over the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.infer.pipeline import make_data_parallel_forward
from snipper_tpu.models.snipper import init_model
from snipper_tpu.parallel.mesh import make_mesh


def test_data_parallel_forward_matches_per_sample():
    cfg = Config.tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp_size=4, tp_size=1)
    run, dp = make_data_parallel_forward(model, params, mesh)
    assert dp == 4

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, cfg.num_frames, cfg.input_height,
                              cfg.input_width, 3)).astype(np.float32)
    out = run(imgs)
    logits = np.asarray(out["pred_logits"])
    assert logits.shape[0] == 4

    # per-sample single-device forward must agree (snippets independent)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    for b in range(4):
        want = np.asarray(fwd(params, jnp.asarray(imgs[b:b + 1]))
                          ["pred_logits"])[0]
        np.testing.assert_allclose(logits[b], want, rtol=2e-4, atol=2e-4)
