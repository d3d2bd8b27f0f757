"""Benchmark: inference snippet throughput on the canonical config.

Measures snippets/sec/chip of the flagship T=4, 600x800, enc6/dec6 forward
(the reference's canonical inference config, reference README.md:43-57 /
inference.py:39-76) on the attached TPU, bf16 weights/activations, using the
windowed deformable-sampling path with a runtime exactness check (the
model's ``sampling_overflow`` counter must be zero, else the exact
point-merged path is used instead). Also times the canonical T=4+2 f32
train step (batch 2, fwd + device Hungarian + 6 losses + bwd + AdamW) and
reports it as an extra key. Train reports the RECOMMENDED mixed-precision
mode (bf16 activations, f32 master weights/losses; measured 1.8x faster
than f32 with matching loss trajectories — BASELINE.md "Train-step impl
findings — CORRECTED", which also retracts the mis-measured round-1
train-step claims).

Methodology notes (axon TPU tunnel):
- enqueue K iterations then read one small output once: per-call readback
  adds ~1.6 s of tunnel round-trip that is NOT device time
- ONE process at a time (the tunnel grant is single-client)

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline: the reference publishes no numbers and no GPU is attached here, so
``vs_baseline`` is computed against an ESTIMATED A100 PyTorch throughput of
10 snippets/s (batch=1 eager inference.py with the CUDA deform-attn kernel;
see BASELINE.md "A100 baseline estimate").
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_SNIPPETS_PER_SEC = 10.0  # estimate; see BASELINE.md
# the estimate's uncertainty bracket (1-CPU-core torch run x typical
# CPU:A100 ratios, BASELINE.md "A100 baseline estimate"): vs_baseline
# inherits it, so the record carries it as data, not only prose
A100_BASELINE_BRACKET = (5.0, 14.0)


def _wait_for_backend(attempts: int = None, sleep_s: float = None):
    """Block until the TPU backend can run a trivial op.

    The axon tunnel occasionally refuses new clients for a window of
    minutes (``Unable to initialize backend 'axon': UNAVAILABLE``, e.g.
    right after another client disconnected uncleanly; observed outages on
    2026-08-17/18 lasted hours). A benchmark that dies on that transient
    would record no number for the whole round, so retry the first tiny op
    before giving up — default budget ~30 min of sleep (each failed init
    attempt itself can hang for tens of minutes); override with
    SNIPPER_BENCH_RETRIES / SNIPPER_BENCH_RETRY_SLEEP.
    """
    import os
    import sys

    import jax.numpy as jnp

    if attempts is None:
        attempts = int(os.environ.get("SNIPPER_BENCH_RETRIES", 10))
    if sleep_s is None:
        sleep_s = float(os.environ.get("SNIPPER_BENCH_RETRY_SLEEP", 180))

    for attempt in range(attempts):
        try:
            np.asarray(jnp.zeros((1,)))
            return
        except Exception as e:  # noqa: BLE001 - backend init errors vary
            if attempt == attempts - 1:
                raise
            print(f"bench: backend not ready ({type(e).__name__}: {e}); "
                  f"retry {attempt + 1}/{attempts - 1} in {sleep_s:.0f}s",
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
        # jax caches a failed backend init; clear so the retry re-dials
        # the tunnel instead of replaying the cached failure
        import jax.extend as jex

        jex.backend.clear_backends()


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the canonical configs cost 20-300 s to
    # compile over the tunnel; a warm rerun (driver retries, repeated
    # rounds on one machine) skips straight to measurement. One shared
    # implementation with the CLIs (cli.common), opted in by default here.
    os.environ.setdefault("SNIPPER_COMPILATION_CACHE",
                          "/tmp/snipper_xla_cache")
    from snipper_tpu.cli.common import respect_platform_env

    respect_platform_env()

    _wait_for_backend()

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)

    # ---- inference: windowed sampling with exactness check ---------------
    cfg = Config.canonical_t4().replace(deform_impl="windowed")
    model, params = init_model(cfg, jax.random.PRNGKey(0))

    # SNIPPER_BENCH_PARAMS=<orbax ckpt dir>: benchmark with TRAINED weights
    # instead of PRNGKey(0) init — learned offsets set the margin the
    # exactness cascade actually needs (VERDICT r3 weak #4). The loaded
    # params must match the canonical_t4 shapes.
    weights = "init(PRNGKey 0)"
    ckpt_path = os.environ.get("SNIPPER_BENCH_PARAMS")
    if ckpt_path:
        from snipper_tpu.train.checkpoint import restore_checkpoint

        restored = restore_checkpoint(ckpt_path, None)
        loaded = restored.get("params", restored)
        params = jax.tree.map(
            lambda a, b: np.asarray(b, dtype=np.asarray(a).dtype), params,
            loaded)  # same tree/shapes required: canonical_t4-compatible
        weights = f"trained({ckpt_path})"

    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    x = jnp.asarray(rng.uniform(
        0, 1, (1, cfg.num_frames, cfg.input_height, cfg.input_width, 3)),
        jnp.bfloat16)

    # margin cascade via the production guard: windows sized for
    # max |offset| + 1 of 4 px (the offset-bias init bound), widened to 8,
    # then the exact full-width path — the first config whose runtime
    # overflow counter reads ZERO is exact and is what gets timed
    from snipper_tpu.infer.pipeline import ExactnessGuard

    def build(c):
        from snipper_tpu.models.snipper import build_model

        m = build_model(c)  # params_bf16 already exist; no init pass
        jitted = jax.jit(lambda xx: m.apply({"params": params_bf16}, xx))
        return jitted

    guard = ExactnessGuard(cfg, build)
    out = guard(x)
    overflow = float(np.asarray(out["sampling_overflow"]))
    cfg = guard.cfg
    impl = (f"windowed(m={cfg.sampling_margin})"
            if cfg.deform_impl == "windowed" else cfg.deform_impl)
    fwd = guard.forward
    np.asarray(out["pred_logits"][..., :1].astype(jnp.float32))

    # two timed passes of K=15, keep the best (the tunnel occasionally
    # injects multi-hundred-ms scheduling stalls into a single pass); the
    # per-pass values are emitted too so the ±10-60% session variance
    # documented in NOTES_r3 is visible in the record itself
    K = 15
    sps = 0.0
    passes = []
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            outs = [fwd(x)["pred_logits"] for _ in range(K)]
            np.asarray(outs[-1][..., :1].astype(jnp.float32))
            passes.append(round(K / (time.perf_counter() - t0), 3))
            sps = max(sps, passes[-1])
        except Exception as e:  # noqa: BLE001
            # transient tunnel error: keep a valid earlier pass; rethrow
            # only if NO pass succeeded (the metric would be meaningless).
            # Stderr note so a best-of-ONE run is distinguishable.
            import sys

            print(f"bench: inference pass {attempt} failed "
                  f"({type(e).__name__}); best-of-remaining", file=sys.stderr)
            if sps == 0.0 and attempt == 1:
                raise

    # ---- train step: canonical T=4+2 f32, batch 2 -------------------------
    train_ms = None
    train_passes = []
    try:
        from snipper_tpu.config import Config as C
        from snipper_tpu.data.loader import DataLoader
        from snipper_tpu.data.synthetic import SyntheticDataset
        from snipper_tpu.losses.criterion import SetCriterion
        from snipper_tpu.train.state import create_train_state
        from snipper_tpu.train.step import make_train_step

        # the production train default since round 4: windowed_vjp sampling
        # (1.71x faster backward) + in-graph exact-impl lax.cond fallback
        tcfg = C.canonical_t4_f2().replace(deform_impl="windowed_vjp")
        tmodel, tparams = init_model(tcfg, jax.random.PRNGKey(1))
        from snipper_tpu.models.snipper import build_model as _bm
        exact_tmodel = _bm(tcfg.replace(deform_impl="xla"))
        crit = SetCriterion(tcfg)
        state, tx = create_train_state(tcfg, tparams, steps_per_epoch=100)
        step = make_train_step(tmodel, crit, tx, mixed_precision=True,
                               exact_model=exact_tmodel)
        loader = DataLoader(SyntheticDataset(tcfg, n_samples=2), 2,
                            shuffle=False, process_index=0, process_count=1)
        raw = next(iter(loader))
        # device-resident batch: the production train loop overlaps the
        # host->device input transfer with the previous step
        # (engine.py device_prefetch); timing a host-numpy batch would bill
        # a ~46 MB/step tunnel copy (~230 ms at ~200 MB/s) to the step
        batch = jax.device_put({"images": raw["images"],
                                "targets": raw["targets"]})
        rng_t = jax.random.PRNGKey(2)
        state, m = step(state, batch, rng_t)      # compile
        float(m["loss_total"])
        Kt = 4
        for _ in range(2):  # best-of-two: tunnel stalls hit single passes
            try:
                t0 = time.perf_counter()
                for _ in range(Kt):
                    state, m = step(state, batch, rng_t)
                float(m["loss_total"])
                ms = (time.perf_counter() - t0) / Kt * 1e3
                train_passes.append(round(ms, 1))
                train_ms = (min(train_ms, ms)
                            if isinstance(train_ms, float) else ms)
            except Exception as e:  # noqa: BLE001
                # keep a valid earlier pass: a transient tunnel error in
                # pass 2 must not discard pass 1's measurement
                if not isinstance(train_ms, float):
                    train_ms = f"FAIL {type(e).__name__}"
    except Exception as e:  # noqa: BLE001
        if not isinstance(train_ms, float):
            train_ms = f"FAIL {type(e).__name__}"

    # ---- per-config headline: light_t1 @ snippet_batch 4 ------------------
    # the repo's best throughput config (BASELINE.md "Per-config inference
    # throughput"); SNIPPER_BENCH_CONFIGS=all sweeps the full preset matrix
    configs = {}
    sweep = os.environ.get("SNIPPER_BENCH_CONFIGS", "light_t1")
    preset_batches = {"light_t1": 4, "light_t4": 1, "light_t4_f2": 1,
                      "canonical_t1": 1, "canonical_t4_f2": 1}
    if sweep == "all":
        todo = list(preset_batches)
    elif sweep in preset_batches:
        todo = [sweep]
    else:
        todo = []
    for preset in todo:
        try:
            b = preset_batches[preset]
            pcfg = getattr(Config, preset)().replace(deform_impl="windowed")
            pmodel, pparams = init_model(pcfg, jax.random.PRNGKey(0))
            pparams = jax.tree.map(
                lambda a: (a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a), pparams)
            px = jnp.asarray(rng.uniform(
                0, 1, (b, pcfg.num_frames, pcfg.input_height,
                       pcfg.input_width, 3)), jnp.bfloat16)
            pfwd = jax.jit(lambda xx: pmodel.apply(
                {"params": pparams}, xx)["pred_logits"])
            np.asarray(pfwd(px)[..., :1].astype(jnp.float32))
            Kp = 12
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                pouts = [pfwd(px) for _ in range(Kp)]
                np.asarray(pouts[-1][..., :1].astype(jnp.float32))
                best = max(best, Kp * b / (time.perf_counter() - t0))
            configs[f"{preset}_b{b}"] = round(best, 1)
        except Exception as e:  # noqa: BLE001
            configs[f"{preset}"] = f"FAIL {type(e).__name__}"

    # ---- serving fast-profile sweep (VERDICT r4 #3) -----------------------
    # SNIPPER_BENCH_FAST="m3|enc4,p2,r480|..." times canonical_t4 under each
    # infer/fast.py profile (ExactnessGuard-settled). Default: the
    # recommended p2,r480 profile only (-0.002 3DPCK on the overfit
    # protocol; one extra compile, warm-cached after any probe/bench run).
    # "" disables. Measured table + accuracy deltas: BASELINE.md "Fast
    # serving profiles".
    fast = {}
    for spec in [s for s in os.environ.get("SNIPPER_BENCH_FAST", "p2,r480")
                 .split("|") if s.strip()]:
        try:
            from snipper_tpu.infer.fast import fast_profiles

            fcfg, transform = fast_profiles(
                Config.canonical_t4().replace(deform_impl="windowed"), spec)
            fparams = transform(params_bf16)
            fx = jnp.asarray(rng.uniform(
                0, 1, (1, fcfg.num_frames, fcfg.input_height,
                       fcfg.input_width, 3)), jnp.bfloat16)

            def fbuild(c, p=fparams):
                from snipper_tpu.models.snipper import build_model as bm

                return jax.jit(lambda xx: bm(c).apply({"params": p}, xx))

            fguard = ExactnessGuard(fcfg, fbuild)
            np.asarray(fguard(fx)["pred_logits"][..., :1]
                       .astype(jnp.float32))
            ffwd = fguard.forward
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                fouts = [ffwd(fx)["pred_logits"] for _ in range(12)]
                np.asarray(fouts[-1][..., :1].astype(jnp.float32))
                best = max(best, 12 / (time.perf_counter() - t0))
            fast[spec] = round(best, 2)
        except Exception as e:  # noqa: BLE001
            fast[spec] = f"FAIL {type(e).__name__}"

    # analytic hardware context (BASELINE.md "Analytic cost": XLA
    # cost_analysis of the canonical T=4 forward, exact sampling — 1.27
    # TFLOP / 50.7 GB accessed -> 62 ms/snippet HBM floor at 819 GB/s), so
    # the headline number is self-interpreting against the chip's limits
    ms_per_snippet = 1e3 / sps if sps else None
    rec = {
        "metric": "inference_snippets_per_sec_per_chip_T4_600x800",
        "value": round(sps, 3),
        "unit": "snippets/s",
        "vs_baseline": round(sps / A100_BASELINE_SNIPPETS_PER_SEC, 3),
        # the A100 estimate's bracket, propagated: [sps/14, sps/5]
        "baseline_bracket": list(A100_BASELINE_BRACKET),
        "vs_baseline_bracket": [round(sps / A100_BASELINE_BRACKET[1], 3),
                                round(sps / A100_BASELINE_BRACKET[0], 3)],
        "batch_size": 1,
        "dtype": "bfloat16",
        "weights": weights,
        "sampling_impl": impl,
        "sampling_overflow": overflow,
        "passes_snippets_per_sec": passes,
        "analytic_tflop": 1.27,
        "analytic_hbm_gb": 50.7,
        "x_hbm_floor": (round(ms_per_snippet / 62.0, 2)
                        if ms_per_snippet else None),
        "train_step_ms_T4F2_bf16mp_b2": (round(train_ms, 1)
                                      if isinstance(train_ms, float)
                                      else train_ms),
        "train_step_passes_ms": train_passes,
        "configs_snippets_per_sec": configs,
        "fast_snippets_per_sec": fast,
        "note": "baseline is an estimated A100 PyTorch eager throughput "
                "(reference publishes no numbers; CPU-ratio bracket "
                "5-14/s); see BASELINE.md",
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
