"""Torch state-dict import: coverage of the flax tree + value mapping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snipper_tpu.config import Config
from snipper_tpu.models.snipper import init_model
from snipper_tpu.train.checkpoint import (import_torch_state_dict,
                                          torch_key_map)


@pytest.fixture(scope="module")
def tiny():
    cfg = Config.tiny()
    _, params = init_model(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_key_map_covers_full_param_tree(tiny):
    """Every flax parameter must be produced by some reference key."""
    cfg, params = tiny
    covered = {path for path, _ in torch_key_map(cfg).values()}
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    missing = [p for p in flat if p not in covered]
    assert not missing, missing[:10]


def test_import_roundtrip_values(tiny):
    """Build a synthetic reference state dict (reference naming) from the
    flax params via the inverse transforms; import must reproduce the params
    bit-exactly and consume every mapped key."""
    cfg, params = tiny
    key_map = torch_key_map(cfg)
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))

    sd = {}
    for tkey, (path, tf) in key_map.items():
        v = flat[path]
        if tf.__name__ == "_t":
            sd[tkey] = np.asarray(v).T
        elif tf.__name__ == "_conv":
            sd[tkey] = np.transpose(np.asarray(v), (3, 2, 0, 1))
        else:
            sd[tkey] = np.asarray(v)
    # sprinkle alias keys the importer must skip
    sd["class_embed.1.weight"] = sd["class_embed.0.weight"]
    sd["transformer.decoder.root_embed.0.layers.0.weight"] = (
        sd["root_embed.0.layers.0.weight"])
    sd["backbone.0.body.bn1.num_batches_tracked"] = np.zeros(())
    enc0 = "transformer.encoder.layers.0.self_attn"
    sd[f"{enc0}.sampling_offsets.1.weight"] = (
        sd[f"{enc0}.sampling_offsets.0.weight"])

    imported = import_torch_state_dict(sd, cfg, strict=True)
    got = _flatten(imported)
    assert set(got) == set(flat)
    for path in flat:
        np.testing.assert_array_equal(got[path], flat[path], err_msg=str(path))


def test_import_rejects_unknown_key(tiny):
    cfg, _ = tiny
    with pytest.raises(KeyError):
        import_torch_state_dict({"bogus.weight": np.zeros((2, 2))}, cfg,
                                strict=True)


def test_torchvision_backbone_import(tiny):
    """A RAW torchvision resnet state dict (no ``backbone.0.body.`` prefix,
    with an ``fc.`` head and num_batches_tracked buffers) must graft onto
    the backbone subtree only — the reference's ImageNet-pretrained start
    (``models/backbone.py:107``)."""
    from snipper_tpu.train.checkpoint import import_torchvision_backbone

    cfg, params = tiny
    key_map = torch_key_map(cfg)
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))

    prefix = "backbone.0.body."
    sd = {}
    for tkey, (path, tf) in key_map.items():
        if not tkey.startswith(prefix):
            continue
        v = flat[path]
        raw = (np.transpose(np.asarray(v), (3, 2, 0, 1))
               if tf.__name__ == "_conv" else np.asarray(v))
        sd[tkey[len(prefix):]] = raw + 1.0   # shift so the graft is visible
    sd["fc.weight"] = np.zeros((1000, 2048))
    sd["fc.bias"] = np.zeros((1000,))
    sd["bn1.num_batches_tracked"] = np.zeros(())

    merged = import_torchvision_backbone(sd, cfg, params=params, strict=True)
    got = _flatten(jax.tree_util.tree_map(np.asarray, merged))
    assert set(got) == set(flat)
    for path in flat:
        if path[0] == "backbone":
            np.testing.assert_array_equal(got[path], flat[path] + 1.0,
                                          err_msg=str(path))
        else:
            np.testing.assert_array_equal(got[path], flat[path],
                                          err_msg=str(path))

    # a torchvision dict with a bogus key must be rejected in strict mode
    with pytest.raises(KeyError):
        import_torchvision_backbone({"bogus.weight": np.zeros((2, 2))}, cfg,
                                    strict=True)

    # non-strict PARTIAL import must deep-merge: leaves absent from the
    # state dict keep their initialized values (regression: wholesale
    # subtree replacement dropped them)
    partial = {"conv1.weight": sd["conv1.weight"]}
    merged2 = import_torchvision_backbone(partial, cfg, params=params,
                                          strict=False)
    got2 = _flatten(jax.tree_util.tree_map(np.asarray, merged2))
    assert set(got2) == set(flat)
    for path in flat:
        if path[:3] == ("backbone", "conv1", "kernel"):
            np.testing.assert_array_equal(got2[path], flat[path] + 1.0)
        else:
            np.testing.assert_array_equal(got2[path], flat[path],
                                          err_msg=str(path))
