"""Export the model forward as a self-contained StableHLO serving artifact.

Usage:
    python -m snipper_tpu.cli.export --preset canonical_t4 \
        --resume /path/checkpoint0039 --output model.stablehlo

The artifact embeds the weights; a server deserializes it with
``snipper_tpu.infer.export.load_exported`` (or raw ``jax.export``) and calls
it on ``[B, T, H, W, 3]`` float32 snippets — no model code or checkpoint
needed at serving time. ``--platforms tpu`` cross-lowers a TPU artifact
from a CPU host.
"""

from __future__ import annotations

import argparse

import jax

from snipper_tpu.cli.common import add_config_args, build_config
from snipper_tpu.infer.export import export_forward, save_exported
from snipper_tpu.models.snipper import init_model
from snipper_tpu.train.checkpoint import (load_torch_checkpoint,
                                          restore_checkpoint)


def main():
    parser = argparse.ArgumentParser("snipper_tpu export")
    add_config_args(parser)
    parser.add_argument("--preset", type=str, default="canonical_t4")
    parser.add_argument("--output", type=str, required=True,
                        help="artifact path (e.g. model.stablehlo)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Orbax checkpoint to embed")
    parser.add_argument("--pretrained_torch", type=str, default=None,
                        help="reference .pth checkpoint to embed")
    # --batch_size comes from add_config_args; for export it sets the
    # artifact's (static) serving batch — default 1
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated target platforms (e.g. 'tpu' "
                             "or 'cpu,tpu'); default: current backend")
    parser.add_argument("--param_dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="embed weights at this dtype (bfloat16 halves "
                             "the artifact and matches the benched "
                             "inference precision)")
    from snipper_tpu.infer.fast import PROFILE_HELP
    parser.add_argument("--fast", type=str, default=None, help=PROFILE_HELP)
    args = parser.parse_args()
    from snipper_tpu.cli.common import respect_platform_env
    respect_platform_env()
    cfg = build_config(args)
    # a static artifact cannot widen windows at runtime: default to the
    # always-exact pmerged path unless the user explicitly picked an impl
    if args.deform_impl is None:
        cfg = cfg.replace(deform_impl="pmerged")
    # serving profiles: the checkpoint loads under the ORIGINAL config and
    # the tree is transformed before export (infer/fast.py). A static
    # artifact cannot run the m{N} exactness cascade — margins below the
    # checkpoint's needs would silently drop taps — so the always-exact
    # pmerged default above is what m-profiles would bypass; reject them.
    load_cfg, fast_transform = cfg, None
    if args.fast:
        from snipper_tpu.infer.fast import fast_profiles

        if any(s.strip().startswith("m") for s in args.fast.split(",")):
            parser.error("--fast m{N} needs the runtime exactness cascade; "
                         "exported artifacts are static — use r/enc/p "
                         "profiles (or export --deform_impl windowed "
                         "explicitly at your own risk)")
        cfg, fast_transform = fast_profiles(cfg, args.fast)

    if args.pretrained_torch:
        params = load_torch_checkpoint(args.pretrained_torch, load_cfg)
    elif args.resume:
        params = restore_checkpoint(args.resume, None)["params"]
    else:
        _, params = init_model(cfg, jax.random.PRNGKey(0))
        fast_transform = None
    if fast_transform is not None:
        params = fast_transform(params)
    if args.param_dtype == "bfloat16":
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, params)

    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    batch = args.batch_size if args.batch_size is not None else 1
    exported = export_forward(cfg, params, batch_size=batch,
                              platforms=platforms)
    size = save_exported(exported, args.output)
    print(f"exported {args.preset} (impl={cfg.deform_impl}, "
          f"batch={batch}, platforms="
          f"{platforms or list(exported.platforms)}) -> {args.output} "
          f"({size / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
