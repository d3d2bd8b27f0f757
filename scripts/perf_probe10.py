"""TPU probe 10: train-step — xla impl baseline + mixed-precision fixes.

probe9 showed pmerged TRAIN backward is pathological (2204 ms vs what
round 1 claimed for impl="xla" — a number later RETRACTED as mis-measured;
see BASELINE.md "Train-step impl findings — CORRECTED"). Confirm xla, and
test mp with the f32-sampling island (deform_dtype="float32").

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python perf_probe10.py > /tmp/probe10.log 2>&1 &
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

    for impl, mp, ddt in (("xla", False, "auto"),
                          ("xla", True, "float32"),
                          ("xla", True, "auto")):
        try:
            cfg = Config.canonical_t4_f2().replace(deform_impl=impl,
                                                   deform_dtype=ddt)
            model, params = init_model(cfg, jax.random.PRNGKey(1))
            crit = SetCriterion(cfg)
            state, tx = create_train_state(cfg, params, steps_per_epoch=100)
            step = make_train_step(model, crit, tx, mixed_precision=mp)
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
            K = 4
            t0 = time.perf_counter()
            for _ in range(K):
                state, m = step(state, batch, rng)
            loss1 = float(m["loss_total"])
            ms = (time.perf_counter() - t0) / K * 1e3
            print(f"train {impl} mp={mp} ddt={ddt}: {ms:.1f} ms/step "
                  f"(compile {compile_s:.0f}s, loss {loss0:.1f}->{loss1:.1f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"train {impl} mp={mp} ddt={ddt}: "
                  f"FAIL {type(e).__name__}: {e}"[:200], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
