"""Shape/structure tests of the full Snipper model (tiny config).

All tests share two jitted signatures (with/without mask) to keep CPU compile
time bounded.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.models.snipper import init_model

B = 2


@pytest.fixture(scope="module")
def setup():
    cfg = Config.tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    fwd_mask = jax.jit(lambda p, x, m: model.apply({"params": p}, x, m))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(
        0, 1, (B, cfg.num_frames, cfg.input_height, cfg.input_width, 3)),
        jnp.float32)
    return cfg, fwd, fwd_mask, params, imgs


def test_forward_shapes(setup):
    cfg, fwd, _, params, imgs = setup
    out = fwd(params, imgs)

    T1 = cfg.total_frames
    q, K = cfg.num_queries, cfg.num_kpts
    assert out["pred_logits"].shape == (B, q, T1, 2)
    assert out["pred_kpts2d"].shape == (B, q, T1, K, 3)
    assert out["pred_depth"].shape == (B, q, T1, K, 1)
    assert out["aux_logits"].shape == (cfg.dec_layers - 1, B, q, T1, 2)
    # root channels pass through a sigmoid
    root = out["pred_kpts2d"][:, :, :, 0]
    assert float(jnp.min(root)) >= 0.0 and float(jnp.max(root)) <= 1.0
    # heatmaps: one per level with head/keypoint split; level 0 is stride 8
    assert len(out["heatmaps"]) == cfg.num_feature_levels
    h0 = out["heatmaps"][0]
    assert h0.shape == (B, cfg.num_frames, cfg.input_height // 8,
                        cfg.input_width // 8, cfg.nheads, K)
    for v in jax.tree.leaves(out):
        assert bool(jnp.isfinite(v).all())


def test_padding_mask_changes_output(setup):
    cfg, fwd, fwd_mask, params, imgs = setup
    mask = np.zeros((B, cfg.num_frames, cfg.input_height, cfg.input_width),
                    bool)
    mask[:, :, :, cfg.input_width // 2:] = True  # right half padded
    o1 = fwd(params, imgs)
    o2 = fwd_mask(params, imgs, jnp.asarray(mask))
    assert not np.allclose(np.asarray(o1["pred_kpts2d"]),
                           np.asarray(o2["pred_kpts2d"]))
    for v in jax.tree.leaves(o2):
        assert bool(jnp.isfinite(v).all())


def test_windowed_full_model_matches_exact_path():
    """The served/benched sampling path (windowed, margin-5 cascade) must
    produce the same full-model outputs as the exact pmerged path when the
    overflow counter reads zero — on an input large enough that windows are
    actually ACTIVE (the tiny preset's grids run full-width)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    base = Config.tiny().replace(input_height=480, input_width=640,
                                 sampling_margin=5)
    x = jnp.asarray(rng.uniform(0, 1, (1, base.num_frames, 480, 640, 3)),
                    jnp.float32)

    outs = {}
    for impl in ("windowed", "pmerged"):
        cfg = base.replace(deform_impl=impl)
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        outs[impl] = model.apply({"params": params}, x)

    assert float(outs["windowed"]["sampling_overflow"]) == 0.0
    for key in ("pred_logits", "pred_kpts2d", "pred_depth"):
        np.testing.assert_allclose(
            np.asarray(outs["windowed"][key]),
            np.asarray(outs["pmerged"][key]), rtol=2e-4, atol=2e-5,
            err_msg=key)


def test_remat_policy_gradients_match():
    """remat_policy='save_sampling' changes WHAT is stored, not the math:
    gradients must match the default full-recompute policy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    x = None
    grads = {}
    for policy in ("full", "save_sampling"):
        cfg = Config.tiny().replace(remat_policy=policy)
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        if x is None:
            x = jnp.asarray(rng.uniform(
                0, 1, (1, cfg.num_frames, cfg.input_height, cfg.input_width,
                       3)), jnp.float32)

        def loss(p):
            out = model.apply({"params": p}, x)
            return (jnp.sum(out["pred_kpts2d"] ** 2)
                    + jnp.sum(out["pred_logits"] ** 2))

        grads[policy] = jax.grad(loss)(params)

    flat_a = jax.tree_util.tree_leaves(grads["full"])
    flat_b = jax.tree_util.tree_leaves(grads["save_sampling"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_s2d_stem_matches_direct_conv():
    """Space-to-depth stem (StemConv.s2d) must be numerically equivalent to
    the direct 7x7/2 conv — it is the same weights regrouped exactly
    (probe20: the direct form runs the MXU at ~2 TFLOP/s on 3 input
    channels; s2d is the production default)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.models.resnet import StemConv

    rng = np.random.default_rng(0)
    for H, W in ((64, 96), (37, 53)):  # even and odd sizes
        x = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
        m = StemConv(64, s2d=False)
        p = m.init(jax.random.PRNGKey(0), x)
        want = m.apply(p, x)
        got = StemConv(64, s2d=True).apply(p, x)
        assert want.shape == got.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_position_encoding_odd_feature_count():
    """hidden_dim % 3 != 0 configs can give an ODD per-axis feature count
    (e.g. hidden 256 -> F=85); the sin/cos interleave must handle it (the
    reference's torch.stack would crash) and stay identical for even F."""
    import jax.numpy as jnp

    from snipper_tpu.models.position_encoding import position_encoding_3d

    mask = jnp.zeros((1, 2, 4, 6), bool)
    out = position_encoding_3d(mask, 85)
    assert out.shape == (1, 2, 4, 6, 255)
    assert bool(jnp.isfinite(out).all())
    # even F unchanged and bounded
    out2 = position_encoding_3d(mask, 128)
    assert out2.shape == (1, 2, 4, 6, 384)
    assert float(jnp.abs(out2).max()) <= 1.0 + 1e-6
