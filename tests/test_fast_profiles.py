"""Serving-profile transforms (infer/fast.py): checkpoint-compatible
speed/accuracy levers (VERDICT r4 #3).

The layout-sensitive one is ``p{N}`` — it slices Dense projections whose
output dims are ordered (head, level, point[, xy]); a wrong axis order
would silently sample garbage taps. The equivalence test pins it: when the
full model's attention logits suppress points >= N, its output must equal
the sliced model's (softmax renormalization makes the suppressed model and
the sliced model the same computation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.infer.fast import fast_profiles
from snipper_tpu.models.snipper import build_model, init_model


def _tiny(**kw):
    return Config.tiny().replace(dropout=0.0, **kw)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = _tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def _x(cfg, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (batch, cfg.num_frames,
                                          cfg.input_height, cfg.input_width,
                                          3)), jnp.float32)


def _randomize_attn(params, seed):
    """Give every deform-attn projection nonzero weights (init is zeros) so
    the layout equivalence test exercises query-dependent offsets/weights."""
    rng = np.random.default_rng(seed)
    out = jax.tree_util.tree_map(lambda a: a, params)  # deep-ish copy

    def visit(tree):
        for key, sub in tree.items():
            if key in ("self_attn", "cross_attn") and \
                    "sampling_offsets" in sub:
                for proj in ("sampling_offsets", "attention_weights"):
                    k = np.asarray(sub[proj]["kernel"])
                    sub[proj]["kernel"] = jnp.asarray(
                        rng.normal(0, 0.02, k.shape), k.dtype)
                    b = np.asarray(sub[proj]["bias"])
                    sub[proj]["bias"] = jnp.asarray(
                        b + rng.normal(0, 0.2, b.shape), b.dtype)
            elif isinstance(sub, dict):
                visit(sub)

    visit(out["transformer"])
    return out


def _suppress_points(params, cfg, keep):
    """Force attention logits of points >= keep to -30 (softmax weight
    ~1e-13) in every deform-attn module, query-independently: kernel columns
    zeroed, bias set. The full model then computes exactly what the sliced
    model computes (up to the ~1e-13 leaked mass)."""
    H, L = cfg.nheads, cfg.num_feature_levels

    def visit(tree, P_of):
        for key, sub in tree.items():
            if key in ("self_attn", "cross_attn") and \
                    "sampling_offsets" in sub:
                P = P_of
                aw = sub["attention_weights"]
                k = np.asarray(aw["kernel"]).reshape(-1, H, L, P).copy()
                k[:, :, :, keep:] = 0.0
                b = np.asarray(aw["bias"]).reshape(H, L, P).copy()
                b[:, :, keep:] = -30.0
                aw["kernel"] = jnp.asarray(k.reshape(k.shape[0], -1))
                aw["bias"] = jnp.asarray(b.reshape(-1))
            elif isinstance(sub, dict):
                visit(sub, P_of)

    # tiny preset: enc_n_points == dec_n_points == 4
    visit(params["transformer"], cfg.enc_n_points)
    return params


def test_p_slice_matches_suppressed_full_model(tiny_model):
    cfg, model, params0 = tiny_model
    assert cfg.enc_n_points == cfg.dec_n_points == 4
    params = _randomize_attn(params0, seed=1)
    params = _suppress_points(params, cfg, keep=2)
    x = _x(cfg)

    full = model.apply({"params": params}, x)

    fcfg, transform = fast_profiles(cfg, "p2")
    assert fcfg.enc_n_points == fcfg.dec_n_points == 2
    sliced = build_model(fcfg).apply({"params": transform(params)}, x)

    np.testing.assert_allclose(np.asarray(full["pred_kpts2d"]),
                               np.asarray(sliced["pred_kpts2d"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(full["pred_logits"]),
                               np.asarray(sliced["pred_logits"]),
                               atol=1e-5, rtol=1e-5)


def test_p_slice_differs_without_suppression(tiny_model):
    """Dropping live taps must CHANGE the output (a no-op transform would
    pass the equivalence test trivially)."""
    cfg, model, params0 = tiny_model
    params = _randomize_attn(params0, seed=2)
    x = _x(cfg)
    full = model.apply({"params": params}, x)
    fcfg, transform = fast_profiles(cfg, "p2")
    sliced = build_model(fcfg).apply({"params": transform(params)}, x)
    assert np.abs(np.asarray(full["pred_kpts2d"])
                  - np.asarray(sliced["pred_kpts2d"])).max() > 1e-6


def test_enc_truncation_runs_strict_and_differs():
    cfg = _tiny(enc_layers=2)
    model, params = init_model(cfg, jax.random.PRNGKey(3))
    x = _x(cfg)
    full = model.apply({"params": params}, x)

    fcfg, transform = fast_profiles(cfg, "enc1")
    tparams = transform(params)
    # flax apply is strict about the param tree: success == the key mapping
    # is exactly the 1-layer architecture's
    out = build_model(fcfg).apply({"params": tparams}, x)
    assert out["pred_kpts2d"].shape == full["pred_kpts2d"].shape
    assert np.abs(np.asarray(full["pred_kpts2d"])
                  - np.asarray(out["pred_kpts2d"])).max() > 1e-6
    assert "encoder_layer1" not in tparams["transformer"]
    # the input tree is not mutated
    assert "encoder_layer1" in params["transformer"]


def test_r_profile_resolution_and_aspect(tiny_model):
    cfg, model, params = tiny_model
    fcfg, transform = fast_profiles(cfg, "r48")
    assert (fcfg.input_height, fcfg.input_width) == (48, 72)  # 2:3 aspect
    out = build_model(fcfg).apply({"params": transform(params)}, _x(fcfg))
    assert out["pred_logits"].shape[1] == cfg.num_queries


def test_m_profile_sets_margin_only(tiny_model):
    cfg, _, params = tiny_model
    fcfg, transform = fast_profiles(cfg, "m3")
    assert fcfg.sampling_margin == 3
    assert fcfg.replace(sampling_margin=cfg.sampling_margin) == cfg
    assert transform(params) is params or jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a is b, params,
                               transform(params)))


def test_profiles_compose():
    cfg = _tiny(enc_layers=2)
    _, params = init_model(cfg, jax.random.PRNGKey(4))
    fcfg, transform = fast_profiles(cfg, "m3,enc1,p2,r48")
    assert (fcfg.sampling_margin, fcfg.enc_layers, fcfg.enc_n_points,
            fcfg.input_height) == (3, 1, 2, 48)
    out = build_model(fcfg).apply({"params": transform(params)}, _x(fcfg))
    assert float(np.abs(np.asarray(out["pred_kpts2d"])).sum()) > 0


@pytest.mark.parametrize("spec", ["", "x9", "enc0", "enc1", "p0", "p4",
                                  "r16", "m0"])
def test_invalid_specs_raise(spec):
    with pytest.raises(ValueError):
        fast_profiles(_tiny(), spec)  # tiny: enc_layers=1, n_points=4
