"""TPU probe 23: train-step hybrid sampling — windowed FORWARD + exact
core BACKWARD via custom VJP (impl="windowed_hybrid") vs the production
impl="xla", under the round-3 defaults (bf16-mp, save_sampling remat).

Round-3's same-session check showed plain impl="windowed" training LOSES
(2013 vs 1674 ms): its backward is the slow part. The hybrid keeps the
~2.5x-cheaper windowed select forward and the fast core backward, which
neither prior measurement covered.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe23.py > /tmp/probe23.log 2>&1 &
"""

from __future__ import annotations

import time


def main():
    import jax

    from snipper_tpu.config import Config
    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    for impl in ("xla", "windowed_hybrid", "xla"):
        try:
            cfg = Config.canonical_t4_f2().replace(deform_impl=impl)
            model, params = init_model(cfg, jax.random.PRNGKey(1))
            crit = SetCriterion(cfg)
            state, tx = create_train_state(cfg, params, steps_per_epoch=100)
            step = make_train_step(model, crit, tx)
            loader = DataLoader(SyntheticDataset(cfg, n_samples=2), 2,
                                shuffle=False, process_index=0,
                                process_count=1)
            raw = next(iter(loader))
            batch = {"images": raw["images"], "targets": raw["targets"]}
            rng = jax.random.PRNGKey(2)
            t0 = time.perf_counter()
            state, m = step(state, batch, rng)
            loss0 = float(m["loss_total"])
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                K = 4
                t0 = time.perf_counter()
                for _ in range(K):
                    state, m = step(state, batch, rng)
                loss1 = float(m["loss_total"])
                best = min(best, (time.perf_counter() - t0) / K * 1e3)
            ov = float(m.get("sampling_overflow", -1.0))
            print(f"train impl={impl}: {best:.1f} ms/step "
                  f"(compile {compile_s:.0f}s, loss {loss0:.1f}->{loss1:.1f},"
                  f" overflow {ov})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"train impl={impl}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
