"""TPU probe 11: train-step regression bisect (3632 ms vs round-1's 237).

Times the pieces: fwd-only, fwd+criterion, value_and_grad, full step, and
the device JV matcher alone (random vs padded costs, the round-2 matcher
masking fix being the prime suspect).

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python perf_probe11.py > /tmp/probe11.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, K=4, label=""):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    out = jax.tree_util.tree_leaves(out)[0]
    np.asarray(out).ravel()[:1]
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    out = jax.tree_util.tree_leaves(out)[0]
    np.asarray(out).ravel()[:1]
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"{label:34s}: {ms:8.1f} ms (compile {comp:.0f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    cfg = Config.canonical_t4_f2().replace(deform_impl="xla")
    model, params = init_model(cfg, jax.random.PRNGKey(1))
    crit = SetCriterion(cfg)
    loader = DataLoader(SyntheticDataset(cfg, n_samples=2), 2,
                        shuffle=False, process_index=0, process_count=1)
    raw = next(iter(loader))
    batch = {"images": raw["images"], "targets": raw["targets"]}
    rng = jax.random.PRNGKey(2)

    # ---- matcher alone ----------------------------------------------------
    from snipper_tpu.losses.criterion import matcher_weight_dict
    from snipper_tpu.matching.matcher import match

    mw = matcher_weight_dict(cfg)
    tgt = raw["targets"]

    def run_match(outs_like, targets):
        return match(outs_like, targets, cfg.max_depth, mw)

    # fake outputs at the right shapes from the real forward
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    out0 = fwd(params, batch["images"])
    outs_small = {k: out0[k] for k in
                  ("pred_logits", "pred_kpts2d", "pred_depth")}
    jm = jax.jit(run_match)
    bench(jm, outs_small, tgt, label="matcher (padded targets)")

    # ---- forward only (train mode) ----------------------------------------
    f1 = jax.jit(lambda p, x, r: model.apply(
        {"params": p}, x, None, train=True, rngs={"dropout": r}))
    bench(f1, params, batch["images"], rng, label="forward only (train mode)")

    # ---- forward + criterion ----------------------------------------------
    def f2(p, b, r):
        out = model.apply({"params": p}, b["images"], None, train=True,
                          rngs={"dropout": r})
        total, losses, _ = crit(out, b["targets"])
        return total

    f2j = jax.jit(f2)
    bench(f2j, params, batch, rng, label="forward + criterion")

    # ---- value_and_grad (no optimizer) -------------------------------------
    f3 = jax.jit(lambda p, b, r: jax.value_and_grad(
        lambda pp: f2(pp, b, r))(p)[0])
    bench(f3, params, batch, rng, label="value_and_grad")

    # ---- full step ----------------------------------------------------------
    state, tx = create_train_state(cfg, params, steps_per_epoch=100)
    # explicit f32: this probe's BASELINE.md record predates the round-3
    # mixed_precision=True default flip — keep it re-runnable as measured
    step = make_train_step(model, crit, tx, donate=False,
                           mixed_precision=False)
    bench(lambda s, b, r: step(s, b, r)[1]["loss_total"], state, batch, rng,
          label="full train step")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
