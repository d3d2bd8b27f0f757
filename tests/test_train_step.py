"""End-to-end train step on an 8-virtual-device CPU mesh: loss decreases,
frozen params stay frozen, LR groups behave, dp sharding executes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.losses.criterion import SetCriterion
from snipper_tpu.models.snipper import init_model
from snipper_tpu.parallel.mesh import make_mesh
from snipper_tpu.train.state import create_train_state, param_label
from snipper_tpu.train.step import make_train_step, replicate, shard_batch


def _synthetic_batch(cfg, B, rng):
    T1, K, M = cfg.total_frames, cfg.num_kpts, cfg.max_persons
    imgs = rng.uniform(0, 1, (B, cfg.num_frames, cfg.input_height,
                              cfg.input_width, 3)).astype(np.float32)
    kpts = np.zeros((B, M, T1, K, 3), np.float32)
    depth = np.zeros((B, M, T1, K, 2), np.float32)
    valid = np.zeros((B, M), bool)
    for b in range(B):
        m = 1 + rng.integers(0, 2)
        kpts[b, :m, ..., 0:2] = rng.uniform(0.2, 0.8, (m, T1, K, 2))
        kpts[b, :m, ..., 2] = 1.0
        depth[b, :m, ..., 0] = rng.uniform(0.1, 0.9, (m, T1, K))
        depth[b, :m, ..., 1] = 1.0
        valid[b, :m] = True
    return {"images": jnp.asarray(imgs),
            "targets": {"kpts2d": jnp.asarray(kpts),
                        "depth": jnp.asarray(depth),
                        "valid": jnp.asarray(valid)}}


@pytest.fixture(scope="module")
def setup():
    cfg = Config.tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    crit = SetCriterion(cfg)
    state, tx = create_train_state(cfg, params, steps_per_epoch=10)
    mesh = make_mesh(dp_size=8, tp_size=1)
    # explicit f32 keeps the CPU-mesh suite fast (bf16 is emulated on CPU);
    # the default bf16-mp path is covered by test_mixed_precision_*
    step = make_train_step(model, crit, tx, donate=False,
                           mixed_precision=False)
    batch = _synthetic_batch(cfg, 8, np.random.default_rng(0))
    return cfg, state, step, mesh, batch


def test_train_step_runs_and_loss_decreases(setup):
    cfg, state, step, mesh, batch = setup
    assert len(mesh.devices.flatten()) == 8
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    # overfit a fixed batch: loss must drop
    assert losses[-1] < losses[0], losses


def test_frozen_params_stay_frozen(setup):
    cfg, state, step, mesh, batch = setup
    state_r = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    new_state, _ = step(state_r, batch, jax.random.PRNGKey(2))

    flat0 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    n_frozen = n_trained_changed = 0
    for (path0, v0), (path1, v1) in zip(flat0, flat1):
        label = param_label(path0)
        changed = not np.allclose(np.asarray(v0), np.asarray(v1))
        if label == "frozen":
            assert not changed, path0
            n_frozen += 1
        elif changed:
            n_trained_changed += 1
    assert n_frozen > 10          # BN buffers + layer1 exist
    assert n_trained_changed > 10  # training actually updates


def test_param_labels():
    from snipper_tpu.models.snipper import init_model as im
    cfg = Config.tiny()
    _, params = im(cfg, jax.random.PRNGKey(0))
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: param_label(p), params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    joined = {"/".join(getattr(k, "key", str(k)) for k in path): v
              for path, v in flat}
    # spot checks
    assert any(k.startswith("backbone/conv1") and v == "frozen"
               for k, v in joined.items())
    assert any("layer2_0/conv1" in k and v == "backbone"
               for k, v in joined.items())
    assert any("sampling_offsets" in k and v == "proj"
               for k, v in joined.items())
    assert any("reference_points" in k and v == "proj"
               for k, v in joined.items())
    assert joined["query_embed"] == "main"
    # all BN buffers frozen
    for k, v in joined.items():
        if "running_mean" in k or "running_var" in k:
            assert v == "frozen", k


def test_mixed_precision_matches_f32_losses():
    """bf16-mp (f32 master weights, bf16 activations) must track the f32
    loss trajectory closely over a few steps (the recommended train mode,
    BASELINE.md 'Train-step impl findings')."""
    import jax

    from snipper_tpu.config import Config
    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    cfg = Config.tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    crit = SetCriterion(cfg)
    loader = DataLoader(SyntheticDataset(cfg, n_samples=2), 2, shuffle=False,
                        process_index=0, process_count=1)
    raw = next(iter(loader))
    batch = {"images": raw["images"], "targets": raw["targets"]}
    rng = jax.random.PRNGKey(1)

    traj = {}
    for mp in (False, True):
        state, tx = create_train_state(cfg, params, steps_per_epoch=10)
        step = make_train_step(model, crit, tx, mixed_precision=mp,
                               donate=False)
        losses = []
        for _ in range(3):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss_total"]))
        traj[mp] = losses

    for a, b in zip(traj[False], traj[True]):
        assert abs(a - b) / max(abs(a), 1e-6) < 0.05, traj
    assert traj[True][-1] < traj[True][0]  # it actually learns


def test_model_overflow_counter_fires_on_large_offsets():
    """Model-level exactness guard: bump the learned offset bias beyond the
    window margin and the windowed forward must REPORT dropped taps (this is
    what the bench / infer margin cascade keys off)."""
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    # needs a level-0 large enough that the plan enables windows (the tiny
    # preset's 8x12 grids run full-width, i.e. always exact)
    cfg = Config.tiny().replace(deform_impl="windowed", sampling_margin=5,
                                input_height=480, input_width=640)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, cfg.num_frames, cfg.input_height, cfg.input_width, 3),
                  jnp.float32)
    out = model.apply({"params": params}, x)
    assert float(out["sampling_overflow"]) == 0.0  # init offsets <= 4 px

    def bump(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "sampling_offsets" in names and names[-1] == "bias":
            # alternate +/-20 px: the tap SPREAD (not the shift — the
            # window start tracks the chunk minimum) must exceed the
            # margin while taps stay INSIDE the 60x80-px level-0 map
            # (out-of-map taps are zero-weight and not counted)
            sign = 1.0 - 2.0 * ((jnp.arange(leaf.shape[0]) // 2) % 2)
            return leaf + 20.0 * sign
        return leaf

    big = jax.tree_util.tree_map_with_path(bump, params)
    out2 = model.apply({"params": big}, x)
    assert float(out2["sampling_overflow"]) > 0.0


def test_tp2_matches_tp1_and_unsharded():
    """Tensor-parallel equivalence (column/row-parallel cuts around the
    per-head sampling, parallel/mesh.py::_tp_spec): the tiny forward+loss
    and its gradients must be numerically identical (up to f32 collective
    reassociation) on an unsharded device, a dp-only mesh, and a
    (data=4, model=2) TP mesh — the invariant DDP gave the reference for
    free (reference util/misc.py:400-439)."""
    import jax

    from snipper_tpu.parallel.mesh import param_shardings

    cfg = Config.tiny()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    crit = SetCriterion(cfg)
    batch = _synthetic_batch(cfg, 4, np.random.default_rng(3))

    def loss_fn(p, b):
        out = model.apply({"params": p}, b["images"])
        total, _, _ = crit(out, b["targets"])
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    import optax

    results = {}
    # unsharded single-device reference
    loss, grads = grad_fn(params, batch)
    results["unsharded"] = (float(loss), float(optax.global_norm(grads)))

    # tp=4 puts ONE head per model shard (tiny nheads=4) — the edge case
    # of the head-sharded sampling cut
    for name, (dp, tp) in (("dp4", (4, 1)), ("dp4_tp2", (4, 2)),
                           ("dp2_tp4", (2, 4))):
        mesh = make_mesh(dp_size=dp, tp_size=tp)
        sh = param_shardings(mesh, params, tensor_parallel=(tp > 1))
        p = jax.tree_util.tree_map(jax.device_put, params, sh)
        b = shard_batch(batch, mesh)
        loss, grads = grad_fn(p, b)
        results[name] = (float(loss), float(optax.global_norm(grads)))

    ref_l, ref_g = results["unsharded"]
    for name, (l, g) in results.items():
        assert abs(l - ref_l) / max(abs(ref_l), 1e-6) < 1e-4, results
        assert abs(g - ref_g) / max(abs(ref_g), 1e-6) < 1e-3, results


def test_per_shard_batch_invariance():
    """Mesh scaling sanity (VERDICT r4 #6): with the batch sharded over N
    data shards, every device holds exactly B/N rows and the shards are
    DISJOINT slices covering the global batch — sharding must divide the
    work, never silently replicate it (replication would fake perfect
    scaling while doing N times the compute)."""
    cfg = Config.tiny()
    mesh = make_mesh(dp_size=8, tp_size=1)
    batch = _synthetic_batch(cfg, 8, np.random.default_rng(0))
    sharded = shard_batch(batch, mesh)
    x = sharded["images"]
    rows = []
    for s in x.addressable_shards:
        assert s.data.shape[0] == 1, s.data.shape
        rows.append(s.index[0].start or 0)
    assert sorted(rows) == list(range(8))
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(s.data)[0],
                                      np.asarray(batch["images"][start]))


def test_grad_accum_matches_big_batch():
    """grad_accum_steps=k over k microbatches reproduces the reference's
    k-rank DDP step (per-rank grads averaged, ONE clip+AdamW update,
    reference main.py:184 + engine.py:74-76): with equal per-microbatch
    num_traj and the sum-scaled heatmap term off, the accumulated update
    must equal the big-batch update exactly, and non-final microsteps must
    leave params untouched."""
    base = Config.tiny().replace(dropout=0.0, heatmap_loss_coef=0.0)
    model, params = init_model(base, jax.random.PRNGKey(0))
    crit = SetCriterion(base)

    # every sample carries exactly ONE valid person so both microbatches
    # share the same num_traj normalizer (the microbatch-local-num_traj
    # deviation documented in make_optimizer vanishes)
    rng_np = np.random.default_rng(7)
    T1, K, M = base.total_frames, base.num_kpts, base.max_persons
    B = 4
    imgs = rng_np.uniform(0, 1, (B, base.num_frames, base.input_height,
                                 base.input_width, 3)).astype(np.float32)
    kpts = np.zeros((B, M, T1, K, 3), np.float32)
    depth = np.zeros((B, M, T1, K, 2), np.float32)
    valid = np.zeros((B, M), bool)
    kpts[:, 0, ..., 0:2] = rng_np.uniform(0.2, 0.8, (B, T1, K, 2))
    kpts[:, 0, ..., 2] = 1.0
    depth[:, 0, ..., 0] = rng_np.uniform(0.1, 0.9, (B, T1, K))
    depth[:, 0, ..., 1] = 1.0
    valid[:, 0] = True

    def sub(lo, hi):
        return {"images": jnp.asarray(imgs[lo:hi]),
                "targets": {"kpts2d": jnp.asarray(kpts[lo:hi]),
                            "depth": jnp.asarray(depth[lo:hi]),
                            "valid": jnp.asarray(valid[lo:hi])}}

    rng = jax.random.PRNGKey(3)

    # one big-batch step (accum 1, B=4)
    state_big, tx_big = create_train_state(base, params, steps_per_epoch=10)
    step_big = make_train_step(model, crit, tx_big, donate=False,
                               mixed_precision=False)
    state_big, _ = step_big(state_big, sub(0, B), rng)

    # two microsteps (accum 2, B=2 each)
    cfg_acc = base.replace(grad_accum_steps=2)
    state_acc, tx_acc = create_train_state(cfg_acc, params,
                                           steps_per_epoch=10)
    step_acc = make_train_step(model, crit, tx_acc, donate=False,
                               mixed_precision=False)
    state_mid, _ = step_acc(state_acc, sub(0, 2), rng)
    mid_unchanged = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        params, state_mid.params))
    assert mid_unchanged, "non-final microstep must not update params"
    state_acc, _ = step_acc(state_mid, sub(2, 4), rng)

    # atol = 5% of the 1e-4 AdamW update scale: for near-zero gradients,
    # Adam's g/sqrt(v) amplifies f32 reduction-order roundoff (batch-4 sum
    # vs mean of two batch-2 sums) up to sign flips of a tiny update; real
    # wiring errors (double-apply, per-microstep apply, wrong averaging)
    # shift MANY elements by the full 1e-4 scale
    flat_big = jax.tree_util.tree_leaves(state_big.params)
    flat_acc = jax.tree_util.tree_leaves(state_acc.params)
    for a, b in zip(flat_acc, flat_big):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=5e-6)


def test_grad_accum_exact_with_heterogeneous_num_traj():
    """Exact grad accumulation (VERDICT r4 #4): with the accumulation
    window's num_traj precomputed from the k microbatch targets
    (engine.py::inject_window_num_traj) and fed to the criterion as the
    normalizer, the accumulated step equals the single big-batch step with
    HETEROGENEOUS per-microbatch person counts and the heatmap loss ON.

    Arithmetic being pinned (k=2, window N=4 trajectories split 3+1):
    - trajectory losses: big batch = sum/4; accumulated = mean over 2
      microbatches of (micro_sum / max(4/2, 1)) = (sum/2)/2 = sum/4  ✓
      (the reference's k-rank all-reduce, models/model.py:521-526);
    - heatmap (bare sum): big batch with dp_size=k divides by k
      (criterion.py dp equivalence); accumulated = mean of per-micro sums
      = sum/k  ✓."""
    base = Config.tiny().replace(dropout=0.0)
    assert base.heatmap_loss_coef > 0, "heatmap loss must be exercised"
    model, params = init_model(base, jax.random.PRNGKey(0))

    rng_np = np.random.default_rng(11)
    T1, K, M = base.total_frames, base.num_kpts, base.max_persons
    assert M >= 3
    B = 4
    imgs = rng_np.uniform(0, 1, (B, base.num_frames, base.input_height,
                                 base.input_width, 3)).astype(np.float32)
    kpts = np.zeros((B, M, T1, K, 3), np.float32)
    depth = np.zeros((B, M, T1, K, 2), np.float32)
    valid = np.zeros((B, M), bool)
    # heterogeneous: microbatch 0 (samples 0-1) carries 3 persons,
    # microbatch 1 (samples 2-3) carries 1 — previously each microbatch
    # normalized by its own count (3 vs 1) instead of the window's 4/2
    counts = [2, 1, 1, 0]
    for b, m in enumerate(counts):
        if m == 0:
            continue
        kpts[b, :m, ..., 0:2] = rng_np.uniform(0.2, 0.8, (m, T1, K, 2))
        kpts[b, :m, ..., 2] = 1.0
        depth[b, :m, ..., 0] = rng_np.uniform(0.1, 0.9, (m, T1, K))
        depth[b, :m, ..., 1] = 1.0
        valid[b, :m] = True

    def sub(lo, hi, num_traj=None):
        d = {"images": jnp.asarray(imgs[lo:hi]),
             "targets": {"kpts2d": jnp.asarray(kpts[lo:hi]),
                         "depth": jnp.asarray(depth[lo:hi]),
                         "valid": jnp.asarray(valid[lo:hi])}}
        if num_traj is not None:
            d["num_traj"] = jnp.float32(num_traj)
        return d

    rng = jax.random.PRNGKey(3)
    k = 2

    # big batch: global num_traj in-graph; dp_size=k for the heatmap sum
    state_big, tx_big = create_train_state(base, params, steps_per_epoch=10)
    step_big = make_train_step(model, SetCriterion(base, dp_size=k),
                               tx_big, donate=False, mixed_precision=False)
    state_big, m_big = step_big(state_big, sub(0, B), rng)

    # accumulated: window normalizer from inject_window_num_traj
    from snipper_tpu.train.engine import inject_window_num_traj

    micro = list(inject_window_num_traj(
        iter([sub(0, 2), sub(2, 4)]), k))
    assert all(float(b["num_traj"]) == 2.0 for b in micro)  # max(4/2, 1)

    cfg_acc = base.replace(grad_accum_steps=k)
    state_acc, tx_acc = create_train_state(cfg_acc, params,
                                           steps_per_epoch=10)
    step_acc = make_train_step(model, SetCriterion(base, dp_size=1),
                               tx_acc, donate=False, mixed_precision=False)
    for mb in micro:
        state_acc, _ = step_acc(state_acc, mb, rng)

    flat_big = jax.tree_util.tree_leaves(state_big.params)
    flat_acc = jax.tree_util.tree_leaves(state_acc.params)
    for a, b in zip(flat_acc, flat_big):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=5e-6)


def test_inject_window_num_traj_windows_and_tail():
    """Window arithmetic of the normalizer generator: each complete
    k-window shares max(total/k, 1); a trailing partial window of j
    batches normalizes over its own j; the tiny-window clamp matches the
    reference's min=1 (models/model.py:526)."""
    from snipper_tpu.train.engine import inject_window_num_traj

    def b(n_valid, m=4):
        v = np.zeros((1, m), bool)
        v[0, :n_valid] = True
        return {"targets": {"valid": v}}

    out = list(inject_window_num_traj(iter([b(3), b(1), b(0), b(0), b(2)]),
                                      k=2))
    assert [float(x["num_traj"]) for x in out] == [2.0, 2.0, 1.0, 1.0, 2.0]
    # batches pass through otherwise untouched
    assert np.array_equal(out[0]["targets"]["valid"],
                          b(3)["targets"]["valid"])


def test_frozen_grads_excluded_from_clip():
    """The reference's frozen params (stem/layer1, FrozenBN) are
    requires_grad=False, so torch's clip_grad_norm_ never sees them; here
    the frozen-group gradients must be zeroed BEFORE the global-norm clip
    (state.py mask_frozen_grads) or a huge frozen gradient would silently
    scale down every trainable update."""
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.train.state import make_optimizer, mask_frozen_grads

    cfg = Config.tiny()
    params = {
        "backbone": {"bn1": {"scale": jnp.ones(4)},
                     "conv3_weird": {"kernel": jnp.ones(4)}},
        "head": {"kernel": jnp.ones(4)},
    }

    def grads_with_frozen(val):
        return {
            "backbone": {"bn1": {"scale": jnp.full(4, val)},
                         "conv3_weird": {"kernel": jnp.full(4, 0.01)}},
            "head": {"kernel": jnp.full(4, 0.02)},
        }

    masked = mask_frozen_grads(grads_with_frozen(1e6))
    assert float(jnp.abs(masked["backbone"]["bn1"]["scale"]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(masked["head"]["kernel"]),
                               0.02, rtol=1e-6)

    tx = make_optimizer(cfg)
    st = tx.init(params)
    u_big, _ = tx.update(mask_frozen_grads(grads_with_frozen(1e6)),
                         st, params)
    u_ref, _ = tx.update(grads_with_frozen(0.0), st, params)
    # trainable updates identical regardless of the frozen grad magnitude
    np.testing.assert_allclose(np.asarray(u_big["head"]["kernel"]),
                               np.asarray(u_ref["head"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(u_big["backbone"]["conv3_weird"]["kernel"]),
        np.asarray(u_ref["backbone"]["conv3_weird"]["kernel"]))
    # frozen params receive exactly zero update
    np.testing.assert_allclose(
        np.asarray(u_big["backbone"]["bn1"]["scale"]), 0.0)


def test_exact_redo_fallback_on_overflow():
    """The round-4 production train step: windowed_vjp sampling guarded by
    an IN-GRAPH lax.cond exact-impl fallback (make_train_step exact_model).
    On clean steps the fast windowed gradients are used and the redo flag
    stays 0; when learned offsets exceed the window margin (overflow > 0)
    the step's applied update must EQUAL the pure deform_impl='xla' step's
    — the fallback recomputes value+grads with the exact impl before the
    optimizer update, so training never consumes dropped-tap gradients.
    Same contract as the inference margin cascade
    (infer/pipeline.py::ExactnessGuard); reference exactness contract:
    models/ops/functions/ms_deform_attn_func.py:45-65."""
    from snipper_tpu.models.snipper import build_model

    # level-0 large enough that the plan enables windows (tiny@default
    # 8x12 grids run full-width and could never overflow)
    cfg = Config.tiny().replace(deform_impl="windowed_vjp",
                                sampling_margin=5, dropout=0.0,
                                input_height=480, input_width=640)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    exact_model = build_model(cfg.replace(deform_impl="xla"))
    crit = SetCriterion(cfg)
    state, tx = create_train_state(cfg, params, steps_per_epoch=10)
    step = make_train_step(model, crit, tx, donate=False,
                           mixed_precision=False, exact_model=exact_model)
    xla_model, _ = init_model(cfg.replace(deform_impl="xla"),
                              jax.random.PRNGKey(0))
    xla_step = make_train_step(xla_model, crit, tx, donate=False,
                               mixed_precision=False)
    batch = _synthetic_batch(cfg, 1, np.random.default_rng(5))
    rng = jax.random.PRNGKey(3)

    # clean step: windowed gradients used, no redo
    new_state, m = step(state, batch, rng)
    assert float(m["sampling_overflow"]) == 0.0
    assert float(m["sampling_exact_redo"]) == 0.0
    assert np.isfinite(float(m["loss_total"]))

    # bump offsets so the tap SPREAD exceeds the margin while staying
    # inside the 60x80 level-0 map (same pattern as
    # test_model_overflow_counter_fires_on_large_offsets)
    def bump(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "sampling_offsets" in names and names[-1] == "bias":
            sign = 1.0 - 2.0 * ((jnp.arange(leaf.shape[0]) // 2) % 2)
            return leaf + 20.0 * sign
        return leaf

    big = jax.tree_util.tree_map_with_path(bump, state.params)
    state_big = state.replace(params=big)

    red_state, m_red = step(state_big, batch, rng)
    assert float(m_red["sampling_overflow"]) > 0.0
    assert float(m_red["sampling_exact_redo"]) == 1.0

    ref_state, m_ref = xla_step(state_big, batch, rng)
    # the redone update must match the exact step's (same graph content,
    # one lives inside a lax.cond branch — tiny fusion-order scatter only)
    np.testing.assert_allclose(float(m_red["loss_total"]),
                               float(m_ref["loss_total"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(red_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_eval_step_exact_redo_on_overflow():
    """make_eval_step's exact_model fallback: on overflow the returned
    predictions must equal the exact impl's forward (eval never reports
    metrics from dropped-tap predictions)."""
    from snipper_tpu.models.snipper import build_model
    from snipper_tpu.train.step import make_eval_step

    cfg = Config.tiny().replace(deform_impl="windowed_vjp",
                                sampling_margin=5, dropout=0.0,
                                input_height=480, input_width=640)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    exact_model = build_model(cfg.replace(deform_impl="xla"))
    crit = SetCriterion(cfg)
    estep = make_eval_step(model, crit, exact_model=exact_model)
    batch = _synthetic_batch(cfg, 1, np.random.default_rng(6))

    out, m, _ = estep(params, batch)
    assert float(m["sampling_overflow"]) == 0.0
    assert float(m["sampling_exact_redo"]) == 0.0

    def bump(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "sampling_offsets" in names and names[-1] == "bias":
            sign = 1.0 - 2.0 * ((jnp.arange(leaf.shape[0]) // 2) % 2)
            return leaf + 20.0 * sign
        return leaf

    big = jax.tree_util.tree_map_with_path(bump, params)
    out2, m2, _ = estep(big, batch)
    assert float(m2["sampling_overflow"]) > 0.0
    assert float(m2["sampling_exact_redo"]) == 1.0
    want = exact_model.apply({"params": big}, batch["images"])
    np.testing.assert_allclose(np.asarray(out2["pred_logits"]),
                               np.asarray(want["pred_logits"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2["pred_kpts2d"]),
                               np.asarray(want["pred_kpts2d"]),
                               rtol=1e-5, atol=1e-6)
