"""Parameterized perf-probe driver — reproduces BASELINE.md's measurements.

One subcommand per measurement family (the 27 one-off perf_probe*.py
drivers of rounds 1-3 are consolidated here; the originals are preserved
in git history up to round-3 HEAD for forensic re-runs of retired
variants):

  forward    per-preset inference throughput (ms/snippet) over impl/batch
  train      train-step timing over impl x mixed-precision x remat
  op         encoder-scale sampling-op timing over formulation/margin/chunk
  split      non-sampling forward decomposition (impl="skip" grid solve)
  serve      exported StableHLO artifact vs live-jit forward
  lanegather hierarchical coarse-window + in-tile lane gather probe
             (the last analytic-only ceiling branch, VERDICT r3 #3)

Timing methodology (CLAUDE.md): enqueue K iterations, then ONE tiny
readback of a device-sliced scalar — `jax.block_until_ready` does not
block over the axon tunnel, and reading a full tensor drags it through
the ~200 MB/s tunnel. Run ONE instance at a time on the TPU:

  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/probe.py \
      forward --presets canonical_t4 > /tmp/probe.log 2>&1 &
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


# ---------------------------------------------------------------- timing

def readback_scalar(out):
    """One tiny host readback after a device-side slice (tunnel-safe)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))


def time_fn(fn, *args, K: int = 8, repeats: int = 2) -> float:
    """ms/call, best of `repeats` passes of K enqueued iterations."""
    out = fn(*args)            # compile + warm
    readback_scalar(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        readback_scalar(out)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


# ------------------------------------------------------- shared fixtures

def encoder_inputs(seed: int = 0, max_off_px: float = 6.0):
    """Encoder-scale sampling-op inputs: canonical 600x800 level shapes,
    B_fold=4 (=batch*T), H=8, D=48, P=4, grid reference points + uniform
    random offsets <= max_off_px (probe7/probe18 fixtures)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    shapes = [(75, 100), (38, 50), (19, 25)]
    S = sum(h * w for h, w in shapes)
    B, H, D, P = 4, 8, 48, 4
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    off = rng.uniform(-max_off_px, max_off_px, (B, S, H, len(shapes), P, 2))
    norm = np.array([(w, h) for h, w in shapes], np.float64)
    loc = ref[None, :, None, None, None, :] + off / norm[None, None, None,
                                                         :, None, :]
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (B, S, H, len(shapes), P)),
                       jnp.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    return value, shapes, loc, attn


def bf16_params(params):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)


def make_cfg(preset: str, **over):
    from snipper_tpu.config import Config

    cfg = getattr(Config, preset)()
    return cfg.replace(**over) if over else cfg


# ---------------------------------------------------------- subcommands

def cmd_forward(args):
    """Per-config inference throughput (BASELINE.md 'Per-config inference
    throughput' + batch-scaling rows)."""
    import jax
    import jax.numpy as jnp

    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    for preset in args.presets.split(","):
        for batch in (int(b) for b in args.batch.split(",")):
            try:
                cfg = make_cfg(preset, deform_impl=args.impl)
                model, params = init_model(cfg, jax.random.PRNGKey(0))
                dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
                if args.dtype == "bf16":
                    params = bf16_params(params)
                x = jnp.asarray(
                    rng.uniform(0, 1, (batch, cfg.num_frames,
                                       cfg.input_height, cfg.input_width,
                                       3)), dtype)
                fwd = jax.jit(lambda xx: model.apply({"params": params}, xx))
                out = fwd(x)
                ovf = float(np.asarray(out.get(
                    "sampling_overflow", jnp.zeros(()))))
                ms = time_fn(lambda xx: fwd(xx)["pred_logits"], x, K=args.K)
                per = ms / batch
                print(f"{preset:16s} b{batch}: {per:7.1f} ms/snippet "
                      f"({1e3 / per:6.2f} snippets/s) overflow={ovf} "
                      f"[{cfg.input_height}x{cfg.input_width} "
                      f"T={cfg.num_frames}+{cfg.num_future_frames} "
                      f"enc{cfg.enc_layers}/dec{cfg.dec_layers} "
                      f"impl={args.impl}]", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{preset} b{batch}: FAIL {type(e).__name__}: "
                      f"{e}"[:200], flush=True)


def cmd_train(args):
    """Train-step timing (BASELINE.md 'Train-step impl findings')."""
    import jax

    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    mps = {"on": (True,), "off": (False,), "both": (False, True)}[args.mp]
    for impl in args.impls.split(","):
        for mp in mps:
            try:
                cfg = make_cfg(args.preset, deform_impl=impl,
                               remat_policy=args.remat)
                model, params = init_model(cfg, jax.random.PRNGKey(1))
                crit = SetCriterion(cfg)
                state, tx = create_train_state(cfg, params,
                                               steps_per_epoch=100)
                step = make_train_step(model, crit, tx, mixed_precision=mp)
                loader = DataLoader(SyntheticDataset(
                                        cfg, n_samples=max(2,
                                                           args.batch_size)),
                                    args.batch_size, shuffle=False,
                                    process_index=0, process_count=1)
                raw = next(iter(loader))
                # device-resident batch: production overlaps the input
                # transfer (engine.py device_prefetch); a host-numpy batch
                # re-pays ~46 MB/step of tunnel copy inside the timing
                batch = jax.device_put({"images": raw["images"],
                                        "targets": raw["targets"]})
                rng = jax.random.PRNGKey(2)
                t0 = time.perf_counter()
                state, m = step(state, batch, rng)
                loss0 = float(m["loss_total"])
                compile_s = time.perf_counter() - t0
                if getattr(args, "profile_dir", None):
                    from snipper_tpu.utils import profiling

                    with profiling.trace(args.profile_dir):
                        t0 = time.perf_counter()
                        for _ in range(args.K):
                            state, m = step(state, batch, rng)
                        loss1 = float(m["loss_total"])
                        ms = (time.perf_counter() - t0) / args.K * 1e3
                    top = profiling.summarize_trace(args.profile_dir,
                                                    top_k=20,
                                                    n_iters=args.K)
                    print(f"-- top device ops (ms/step, {impl} mp={mp}):")
                    for src, t_ms in top.items():
                        print(f"   {t_ms:8.2f}  {src}", flush=True)
                else:
                    t0 = time.perf_counter()
                    for _ in range(args.K):
                        state, m = step(state, batch, rng)
                    loss1 = float(m["loss_total"])
                    ms = (time.perf_counter() - t0) / args.K * 1e3
                ovf = float(m.get("sampling_overflow", -1.0))
                # Under --profile_dir the timing ran INSIDE the active
                # jax.profiler trace — tag it so the line is never mistaken
                # for an honest untraced step time (ADVICE r4).
                traced = " (traced)" if getattr(args, "profile_dir",
                                                None) else ""
                print(f"train {impl} mp={mp} remat={args.remat} "
                      f"b{args.batch_size}: {ms:.1f} ms/step{traced} "
                      f"(compile {compile_s:.0f}s, "
                      f"loss {loss0:.1f}->{loss1:.1f}, overflow {ovf})",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"train {impl} mp={mp}: FAIL {type(e).__name__}: "
                      f"{e}"[:200], flush=True)


def cmd_op(args):
    """Encoder-scale sampling-op timing (BASELINE.md round-2/3 op tables:
    formulation comparison, window-plan sweep, Pallas kernels)."""
    import jax
    import jax.numpy as jnp

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_core,
                                             ms_deform_attn_pmerged,
                                             ms_deform_attn_windowed,
                                             windowed_sampling_plan)

    value, shapes, loc, attn = encoder_inputs(max_off_px=args.max_off_px)
    segs = tuple(h * w for h, w in shapes)

    ref_fn = jax.jit(functools.partial(ms_deform_attn_core, value, shapes))
    ref = ref_fn(loc, attn)
    ref_np = np.asarray(ref.astype(jnp.float32))
    scale = np.abs(ref_np).max()

    def relerr(out):
        return np.abs(np.asarray(out.astype(jnp.float32)) - ref_np).max() \
            / scale

    for impl in args.impls.split(","):
        for bc in (int(b) for b in args.base_chunk.split(",")):
            for margin in (int(m) for m in args.margin.split(",")):
                label = f"{impl} bc={bc} m={margin}"
                try:
                    if impl == "core":
                        fn, unpack = ref_fn, False
                    elif impl == "pmerged":
                        fn = jax.jit(functools.partial(
                            ms_deform_attn_pmerged, value, shapes,
                            query_chunk=bc))
                        unpack = False
                    elif impl == "windowed":
                        fn = jax.jit(functools.partial(
                            ms_deform_attn_windowed, value, shapes,
                            query_segments=segs, base_chunk=bc,
                            margin_px=margin))
                        unpack = True
                    elif impl == "windowed2d":
                        from snipper_tpu.ops.deform_attn import (
                            ms_deform_attn_windowed2d)

                        fn = jax.jit(functools.partial(
                            ms_deform_attn_windowed2d, value, shapes,
                            query_segments=segs, margin_px=margin))
                        unpack = True
                    elif impl == "windowed2d_pallas":
                        from snipper_tpu.ops.pallas_deform import (
                            ms_deform_attn_windowed2d_pallas)

                        fn = jax.jit(functools.partial(
                            ms_deform_attn_windowed2d_pallas, value, shapes,
                            query_segments=segs, margin_px=margin))
                        unpack = True
                    elif impl == "pallas":
                        from snipper_tpu.ops.pallas_deform import (
                            ms_deform_attn_pallas)

                        fn = jax.jit(functools.partial(
                            ms_deform_attn_pallas, value, shapes))
                        unpack = False
                    else:
                        raise ValueError(f"unknown op impl {impl!r}")
                    out = fn(loc, attn)
                    ovf = 0.0
                    if unpack:
                        out, ovf_arr = out
                        ovf = float(np.asarray(ovf_arr))
                    ms = time_fn(
                        lambda l, a: (fn(l, a)[0] if unpack else fn(l, a)),
                        loc, attn, K=args.K)
                    _, qcs, wins = windowed_sampling_plan(shapes, bc, margin)
                    print(f"{label:28s}: {ms:7.2f} ms/op-call  "
                          f"relerr {relerr(out):.2e} overflow={ovf} "
                          f"windows={wins if impl.startswith('win') else '-'}",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{label:28s}: FAIL {type(e).__name__}: {e}"[:160],
                          flush=True)
                if impl in ("core", "pallas", "pmerged"):
                    break  # margin is a no-op for exact impls
            if impl in ("core", "pallas"):
                break      # base_chunk too


def cmd_split(args):
    """Non-sampling forward decomposition: time impl="skip" at
    (enc, dec) grid points, solve t = c0 + e*ce + d*cd (BASELINE.md
    round-3 'Non-sampling forward split')."""
    import jax
    import jax.numpy as jnp

    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    pts = []
    for e, d in ((6, 6), (2, 6), (6, 2), (1, 1)):
        cfg = make_cfg(args.preset, deform_impl="skip", enc_layers=e,
                       dec_layers=d)
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        params = bf16_params(params)
        x = jnp.asarray(rng.uniform(0, 1, (1, cfg.num_frames,
                                           cfg.input_height,
                                           cfg.input_width, 3)),
                        jnp.bfloat16)
        fwd = jax.jit(lambda xx, m=model, p=params:
                      m.apply({"params": p}, xx)["pred_logits"])
        ms = time_fn(fwd, x, K=args.K)
        pts.append((e, d, ms))
        print(f"enc={e} dec={d}: {ms:7.2f} ms", flush=True)
    A = np.array([[1, e, d] for e, d, _ in pts], np.float64)
    y = np.array([ms for _, _, ms in pts])
    c0, ce, cd = np.linalg.lstsq(A, y, rcond=None)[0]
    print(f"solved: c0={c0:.2f} ms  ce={ce:.3f} ms/enc-layer  "
          f"cd={cd:.3f} ms/dec-layer", flush=True)


def cmd_serve(args):
    """Exported StableHLO artifact vs live-jit forward (BASELINE.md
    'Serving artifact overhead')."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from snipper_tpu.infer.export import (export_forward, load_exported,
                                          save_exported)
    from snipper_tpu.models.snipper import init_model

    cfg = make_cfg(args.preset, deform_impl="pmerged")
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    params = bf16_params(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, cfg.num_frames, cfg.input_height,
                                       cfg.input_width, 3)), jnp.float32)

    live = jax.jit(lambda xx: model.apply({"params": params}, xx))
    ms_live = time_fn(lambda xx: live(xx)["pred_logits"], x, K=args.K)
    print(f"live jit (pmerged):     {ms_live:7.1f} ms/snippet", flush=True)

    with tempfile.TemporaryDirectory() as d:
        exported = export_forward(cfg, params)
        path = os.path.join(d, "model.stablehlo")
        size = save_exported(exported, path)
        print(f"artifact: {size / 1e6:.1f} MB", flush=True)
        run = load_exported(path)
        ms_art = time_fn(lambda xx: run(xx)["pred_logits"], x, K=args.K)
        print(f"artifact (jit(call)):   {ms_art:7.1f} ms/snippet "
              f"({ms_art / ms_live:.3f}x live)", flush=True)


def cmd_meshscale(args):
    """Data-parallel scaling efficiency on the virtual CPU mesh
    (VERDICT r4 weak #2 / next-round #6).

    Times the jitted forward with global batch N sharded over N of the 8
    virtual devices, N in {1, 4, 8}. On this 1-core host the virtual
    devices SERIALIZE, so absolute throughput cannot scale; the honest
    relative metric is overhead efficiency

        eff(N) = t(1 shard, b1) / (t(N shards, bN) / N)

    — 1.0 when sharding adds zero overhead (same total work, serialized),
    <1.0 when collectives / partitioning overheads creep in. Run with
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from snipper_tpu.models.snipper import init_model

    over = {"deform_impl": args.impl}
    if args.size:
        h, w = (int(v) for v in args.size.split("x"))
        over.update(input_height=h, input_width=w)
    cfg = make_cfg(args.preset, **over)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    devs = jax.devices()
    rng = np.random.default_rng(0)
    t1 = None
    for n in (1, 4, 8):
        if n > len(devs):
            print(f"n={n}: skipped ({len(devs)} devices)", flush=True)
            continue
        mesh = Mesh(np.array(devs[:n]), ("data",))
        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        p = jax.device_put(params, repl)
        x = jax.device_put(
            rng.uniform(0, 1, (n, cfg.num_frames, cfg.input_height,
                               cfg.input_width, 3)).astype(np.float32),
            data)
        fwd = jax.jit(lambda pp, xx: model.apply({"params": pp}, xx))
        out = fwd(p, x)
        jax.block_until_ready(out)   # CPU: block_until_ready is honest
        t0 = time.perf_counter()
        for _ in range(args.K):
            out = fwd(p, x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.K
        if n == 1:
            t1 = dt
        eff = t1 / (dt / n)
        print(f"n={n}: {dt * 1e3:8.1f} ms / global batch {n}  "
              f"({dt / n * 1e3:7.1f} ms/shard, overhead-eff {eff:.3f})",
              flush=True)
        # the compiled program really shards the batch: each device holds
        # B/N rows (no silent replication)
        shard_rows = {s.data.shape[0] for s in x.addressable_shards}
        assert shard_rows == {1}, shard_rows


def cmd_fast(args):
    """Serving fast-profile throughput (VERDICT r4 #3): a canonical-shape
    checkpoint transformed by infer/fast.py profiles, each timed through
    the production ExactnessGuard (windowed sampling). One process, one
    init — every profile reuses the same full parameter tree, so the
    relative numbers are weight-identical."""
    import jax
    import jax.numpy as jnp

    from snipper_tpu.infer.fast import fast_profiles
    from snipper_tpu.infer.pipeline import ExactnessGuard
    from snipper_tpu.models.snipper import build_model, init_model

    rng = np.random.default_rng(0)
    base = make_cfg(args.preset, deform_impl="windowed")
    _, params_full = init_model(base, jax.random.PRNGKey(0))
    params_full = bf16_params(params_full)
    base_sps = None
    for spec in args.specs.split("|"):
        spec = spec.strip()
        try:
            if spec in ("", "base"):
                cfg, params, label = base, params_full, "base"
            else:
                cfg, transform = fast_profiles(base, spec)
                params, label = transform(params_full), spec
            x = jnp.asarray(rng.uniform(
                0, 1, (args.batch, cfg.num_frames, cfg.input_height,
                       cfg.input_width, 3)), jnp.bfloat16)

            def build(c, p=params):
                m = build_model(c)
                return jax.jit(lambda xx: m.apply({"params": p}, xx))

            guard = ExactnessGuard(cfg, build)
            readback_scalar(guard(x))   # compile + settle the cascade
            gcfg, fwd = guard.cfg, guard.forward
            ms = time_fn(lambda xx: fwd(xx)["pred_logits"], x, K=args.K)
            sps = 1e3 / (ms / args.batch)
            if label == "base":
                base_sps = sps
            rel = f"  {sps / base_sps:.2f}x base" if base_sps else ""
            print(f"{label:16s}: {sps:6.2f} snippets/s  "
                  f"[impl={gcfg.deform_impl} m={gcfg.sampling_margin} "
                  f"{cfg.input_height}x{cfg.input_width} enc{cfg.enc_layers} "
                  f"P={cfg.enc_n_points}/{cfg.dec_n_points}]{rel}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{spec}: FAIL {type(e).__name__}: {e}"[:200], flush=True)


def cmd_lanegather(args):
    """Hierarchical gather probe (VERDICT r3 #3): per-chunk coarse window
    (already VMEM-staged, as in the windowed2d kernel) + Mosaic's in-tile
    lane gather for the fine position, vs the one-hot select formulations.
    Delegates to ops.pallas_deform lane-gather experiment kernels; prints
    ms/op-call next to the BASELINE.md 16.4 (XLA emitter) / 14.8 (Pallas
    kernel-only select floor) numbers."""
    import lanegather_probe  # scripts/lanegather_probe.py (sibling file)

    lanegather_probe.run(K=args.K)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("forward")
    f.add_argument("--presets", default="canonical_t4,canonical_t4_f2,"
                   "light_t4_f2,light_t4,light_t1,canonical_t1,"
                   "jta_forecast,panoptic")
    f.add_argument("--impl", default="windowed")
    f.add_argument("--batch", default="1")
    f.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    f.add_argument("-K", type=int, default=8)
    f.set_defaults(fn=cmd_forward)

    t = sub.add_parser("train")
    t.add_argument("--preset", default="canonical_t4_f2")
    t.add_argument("--impls", default="xla")
    t.add_argument("--mp", default="on", choices=("on", "off", "both"))
    t.add_argument("--remat", default="save_sampling")
    t.add_argument("--batch_size", type=int, default=2)
    t.add_argument("-K", type=int, default=4)
    t.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace over the timed "
                        "iterations and print the top-20 device ops by "
                        "source line (BASELINE.md train-step breakdown)")
    t.set_defaults(fn=cmd_train)

    o = sub.add_parser("op")
    o.add_argument("--impls", default="windowed,core")
    o.add_argument("--base_chunk", default="512")
    o.add_argument("--margin", default="5")
    o.add_argument("--max_off_px", type=float, default=4.0)
    o.add_argument("-K", type=int, default=8)
    o.set_defaults(fn=cmd_op)

    s = sub.add_parser("split")
    s.add_argument("--preset", default="canonical_t4")
    s.add_argument("-K", type=int, default=10)
    s.set_defaults(fn=cmd_split)

    sv = sub.add_parser("serve")
    sv.add_argument("--preset", default="canonical_t4")
    sv.add_argument("-K", type=int, default=10)
    sv.set_defaults(fn=cmd_serve)

    fa = sub.add_parser("fast")
    fa.add_argument("--preset", default="canonical_t4")
    fa.add_argument("--specs", default="base|m3|r480|enc4|p2|enc4,p2|"
                    "enc4,p2,r480")
    fa.add_argument("--batch", type=int, default=1)
    fa.add_argument("-K", type=int, default=12)
    fa.set_defaults(fn=cmd_fast)

    lg = sub.add_parser("lanegather")
    lg.add_argument("-K", type=int, default=8)
    lg.set_defaults(fn=cmd_lanegather)

    ms = sub.add_parser("meshscale")
    ms.add_argument("--preset", default="light_t4")
    ms.add_argument("--impl", default="windowed")
    ms.add_argument("--size", default=None,
                    help="HxW input override (e.g. 300x400) — the CPU mesh "
                         "cannot execute canonical 600x800 (40 s collective "
                         "rendezvous timeout, see __graft_entry__)")
    ms.add_argument("-K", type=int, default=4)
    ms.set_defaults(fn=cmd_meshscale)

    args = p.parse_args()
    from snipper_tpu.cli.common import respect_platform_env

    respect_platform_env()
    args.fn(args)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
