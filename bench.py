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
    # injects multi-hundred-ms scheduling stalls into a single pass)
    K = 15
    sps = 0.0
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            outs = [fwd(x)["pred_logits"] for _ in range(K)]
            np.asarray(outs[-1][..., :1].astype(jnp.float32))
            sps = max(sps, K / (time.perf_counter() - t0))
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
    try:
        from snipper_tpu.config import Config as C
        from snipper_tpu.data.loader import DataLoader
        from snipper_tpu.data.synthetic import SyntheticDataset
        from snipper_tpu.losses.criterion import SetCriterion
        from snipper_tpu.train.state import create_train_state
        from snipper_tpu.train.step import make_train_step

        tcfg = C.canonical_t4_f2().replace(deform_impl="xla")
        tmodel, tparams = init_model(tcfg, jax.random.PRNGKey(1))
        crit = SetCriterion(tcfg)
        state, tx = create_train_state(tcfg, tparams, steps_per_epoch=100)
        step = make_train_step(tmodel, crit, tx, mixed_precision=True)
        loader = DataLoader(SyntheticDataset(tcfg, n_samples=2), 2,
                            shuffle=False, process_index=0, process_count=1)
        raw = next(iter(loader))
        batch = {"images": raw["images"], "targets": raw["targets"]}
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

    rec = {
        "metric": "inference_snippets_per_sec_per_chip_T4_600x800",
        "value": round(sps, 3),
        "unit": "snippets/s",
        "vs_baseline": round(sps / A100_BASELINE_SNIPPETS_PER_SEC, 3),
        "batch_size": 1,
        "dtype": "bfloat16",
        "sampling_impl": impl,
        "sampling_overflow": overflow,
        "train_step_ms_T4F2_bf16mp_b2": (round(train_ms, 1)
                                      if isinstance(train_ms, float)
                                      else train_ms),
        "note": "baseline is an estimated A100 PyTorch eager throughput "
                "(reference publishes no numbers); see BASELINE.md",
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
