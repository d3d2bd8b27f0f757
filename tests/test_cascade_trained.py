"""Windowed-sampling exactness under TRAINED weights (VERDICT r2 #6).

The margin-cascade guards were previously exercised only at random init
(where the offset-bias bound of 4 px makes margin 5 provably exact) or
with synthetically bumped biases. Here the tiny preset is actually
TRAINED (real optimizer, boosted LR so the sampling offsets drift), and
the served windowed path + ExactnessGuard cascade is then driven with
those weights: whatever margin the cascade settles on, the final outputs
must match the always-exact point-merged forward bit-for-bit in f32.
Exactness contract of reference
``models/ops/functions/ms_deform_attn_func.py:45-65``.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_margin_cascade_exact_under_trained_weights():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset
    from snipper_tpu.infer.pipeline import ExactnessGuard
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    # large enough input that the level-0 window plan is ACTIVE (the tiny
    # 64x96 grids run full-width = always exact, proving nothing)
    cfg = Config.tiny().replace(input_height=320, input_width=448,
                                deform_impl="xla")
    from snipper_tpu.ops.deform_attn import windowed_sampling_plan
    shapes = [(cfg.input_height // s, cfg.input_width // s)
              for s in (8, 16, 32)]
    _, _, wins = windowed_sampling_plan(shapes, margin_px=cfg.sampling_margin)
    assert any(w for seg in wins for w in seg), (
        "fixture config must enable windows", wins)

    model, params = init_model(cfg, jax.random.PRNGKey(0))
    crit = SetCriterion(cfg)
    # boosted LR drifts the learned offsets well beyond init within a few
    # steps — the scenario the cascade exists for
    state, tx = create_train_state(cfg.replace(lr=2e-2, lr_backbone=0.0),
                                   params, steps_per_epoch=10)
    step = make_train_step(model, crit, tx, donate=False,
                           mixed_precision=False)
    loader = DataLoader(SyntheticDataset(cfg, n_samples=2), 1, shuffle=False,
                        process_index=0, process_count=1)
    raw = next(iter(loader))
    batch = {"images": raw["images"], "targets": raw["targets"]}
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    trained = jax.device_get(state.params)

    # offset drift actually happened (not a no-op test)
    def max_bias(p):
        vals = []

        def visit(path, leaf):
            names = [getattr(k, "key", "") for k in path]
            if "sampling_offsets" in names and names[-1] == "bias":
                vals.append(float(np.abs(np.asarray(leaf)).max()))
            return leaf

        jax.tree_util.tree_map_with_path(visit, p)
        return max(vals)

    drift = max_bias(trained) - max_bias(params)
    assert drift != 0.0, "training did not move the sampling offsets"

    # serve with the windowed path through the production guard
    imgs = np.asarray(batch["images"][0:1])
    serve_cfg = cfg.replace(deform_impl="windowed")

    def build(c):
        m, _ = init_model(c, jax.random.PRNGKey(0))
        jitted = jax.jit(lambda x: m.apply({"params": trained}, x))
        return jitted

    guard = ExactnessGuard(serve_cfg, build)
    out = guard(jnp.asarray(imgs))
    assert float(np.asarray(out["sampling_overflow"])) == 0.0

    # ground truth: the always-exact point-merged forward
    exact_model, _ = init_model(cfg.replace(deform_impl="pmerged"),
                                jax.random.PRNGKey(0))
    want = exact_model.apply({"params": trained}, jnp.asarray(imgs))
    for key in ("pred_logits", "pred_kpts2d", "pred_depth"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(want[key]), rtol=1e-4,
            atol=1e-5, err_msg=f"{key} (margin={guard.cfg.sampling_margin}, "
                               f"impl={guard.cfg.deform_impl}, "
                               f"escalations={guard.overflow_events})")
    print(f"cascade settled at impl={guard.cfg.deform_impl} "
          f"margin={guard.cfg.sampling_margin} after "
          f"{guard.overflow_events} escalations; offset-bias drift "
          f"{drift:+.3f} px")
