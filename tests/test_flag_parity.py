"""CLI flag-parity audit vs the reference entry points.

Enumerates every ``add_argument('--flag')`` in the reference's three CLIs
(``/root/reference/main.py:20-153``, ``eval.py``, ``inference.py``) and
asserts each one is either (a) a ``Config`` field (auto-exposed as a CLI
flag by ``cli.common.add_config_args``), (b) a flag our CLIs define
directly, or (c) listed in the explicit mapping below with the rationale a
migrating user needs (renamed, subsumed, or dead in the reference itself).

The inverse direction is guarded too: an entry in the mapping that names a
flag the reference no longer has, or that duplicates a real Config field,
fails the test — the table cannot go stale silently.
"""

from __future__ import annotations

import dataclasses
import os
import re

import pytest

from snipper_tpu.config import Config

REFERENCE = "/root/reference"
REF_CLIS = ("main.py", "eval.py", "inference.py")
REPO_CLI_DIR = os.path.join(os.path.dirname(__file__), "..",
                            "snipper_tpu", "cli")

# Match '--flag' ANYWHERE in the add_argument call (not only as the first
# argument): add_argument('-r', '--resume', ...) must not escape the audit
# in either direction (ADVICE r4).
_FLAG_RE = re.compile(
    r"add_argument\((?:[^()'\"]|'[^']*'|\"[^\"]*\")*?"
    r"['\"]--([A-Za-z0-9_]+)['\"]", re.DOTALL)

# Reference flags with no same-named Config field / CLI flag, and why.
# Keys: flag name. Values: (our equivalent or "dead", rationale).
EXPLAINED = {
    # distributed launcher plumbing: torch.distributed.launch ->
    # jax.distributed + the device mesh (parallel/mesh.py, multihost.py)
    "local_rank": ("jax.distributed", "torch DDP launcher plumbing"),
    "dist_url": ("jax.distributed", "torch DDP launcher plumbing"),
    "world_size": ("jax.distributed", "torch DDP launcher plumbing"),
    # device selection is platform-level in jax
    "device": ("JAX_PLATFORMS env", "cuda/cpu pick -> platform env var"),
    # dataset participation = presence of the corresponding --*_dir flag
    "use_posetrack": ("--posetrack_dir", "dir presence selects the source"),
    "use_coco": ("--coco_dir", "dir presence selects the source"),
    "use_muco": ("--muco_dir", "dir presence selects the source"),
    "use_jta": ("--jta_dir", "dir presence selects the source"),
    "use_panoptic": ("--panoptic_dir", "dir presence selects the source"),
    # reference accepts only 'hybrid' (datasets/__init__.py:4-6)
    "dataset_file": ("implicit", "only 'hybrid' exists in the reference"),
    # reference supports only sine (position_encoding.py:96-102 raises on
    # anything else; the learned variant is commented out)
    "position_embedding": ("fixed sine", "only 'sine'/'v2' is implemented"),
    # torch AMP -> bf16 mixed precision, default-ON since round 3
    "use_amp": ("--mixed_precision", "bf16-mp train default"),
    # CUDA-vs-pytorch op pick -> deform_impl (xla/windowed/windowed_vjp/
    # pallas formulations, config.py)
    "use_pytorch_deform": ("--deform_impl", "sampling impl selection"),
    # param groups are selected structurally by module path
    # (train/state.py), not by name-keyword lists
    "lr_backbone_names": ("structural param groups", "train/state.py"),
    "lr_linear_proj_names": ("structural param groups", "train/state.py"),
    # TORCH_HOME download dir -> explicit weight path (zero-download)
    "pretrained_dir": ("--pretrained_backbone", "explicit .pth path"),
    # derived from the resumed checkpoint, as the reference itself does
    # anyway (main.py:248)
    "start_epoch": ("--resume", "epoch restored from the checkpoint"),
    # argparse store_false twin of aux_loss; ours is one strict-bool flag
    "no_aux_loss": ("--aux_loss false", "single boolean flag"),
    # renamed for namespacing next to the other dataset knobs
    "protocol": ("--panoptic_protocol", "rename"),
    # dead in the reference: only forces return_interm_layers, which
    # num_feature_levels>1 already does (backbone.py:137); no
    # segmentation path exists
    "masks": ("dead", "Deformable-DETR leftover, no effect"),
    # dead in the reference: the constructor arg is commented out
    # (deformable_transformer.py:374)
    "two_stage": ("dead", "commented out at the construction site"),
    # dead in the reference: defined, never read
    "pre_norm": ("dead", "never read"),
}


def _flags_in(path: str) -> set:
    with open(path) as f:
        return set(_FLAG_RE.findall(f.read()))


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_every_reference_flag_is_mapped():
    ref_flags = set()
    for name in REF_CLIS:
        ref_flags |= _flags_in(os.path.join(REFERENCE, name))
    assert len(ref_flags) > 70, "reference flag extraction broke"

    config_fields = {f.name for f in dataclasses.fields(Config)}
    our_cli_flags = set()
    for name in os.listdir(REPO_CLI_DIR):
        if name.endswith(".py"):
            our_cli_flags |= _flags_in(os.path.join(REPO_CLI_DIR, name))

    covered = config_fields | our_cli_flags | set(EXPLAINED)
    unmapped = sorted(ref_flags - covered)
    assert not unmapped, (
        f"reference CLI flags with no Config field, CLI flag, or "
        f"documented mapping: {unmapped}")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_mapping_table_is_not_stale():
    ref_flags = set()
    for name in REF_CLIS:
        ref_flags |= _flags_in(os.path.join(REFERENCE, name))
    config_fields = {f.name for f in dataclasses.fields(Config)}

    ghosts = sorted(set(EXPLAINED) - ref_flags)
    assert not ghosts, f"EXPLAINED lists flags the reference lacks: {ghosts}"
    shadowed = sorted(set(EXPLAINED) & config_fields)
    assert not shadowed, (
        f"EXPLAINED shadows real Config fields (drop them): {shadowed}")


def test_config_flags_cover_every_field():
    """cli.common.add_config_args generates one flag per Config field —
    pin that the generated parser really accepts each one."""
    import argparse

    from snipper_tpu.cli.common import add_config_args

    parser = argparse.ArgumentParser()
    add_config_args(parser)
    known = {a.dest for a in parser._actions}
    missing = sorted({f.name for f in dataclasses.fields(Config)} - known)
    assert not missing, f"Config fields with no generated CLI flag: {missing}"
